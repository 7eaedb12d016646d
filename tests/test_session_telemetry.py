"""Per-frame PSNR/SSIM telemetry of CompressSession.

The reference computes PSNR/SSIM inside libx264 when b_psnr/b_ssim are set
and log level >= info (/root/reference/codec.c:1555-1559) and reports them
through the log callback.  Our session measures against the encoder's own
reconstruction, so the reported PSNR must EXACTLY match PSNR(source,
stock-FFmpeg-decoded output) — recon is bit-exact vs the decoder.

B-frame caveat: with in-loop deblocking enabled, B reconstructions are kept
pre-deblock (B is non-reference; the encoder never builds B deblock maps),
so B PSNR is asserted exactly only with deblocking off.
"""

import numpy as np

import oracle
from x264vfw_tpu.api import CompressSession
from x264vfw_tpu.config.params import EncoderParams
from x264vfw_tpu.utils.metrics import frame_psnr_yuv, ssim


def _clip_planes(w, h, n, seed):
    clip = oracle.make_test_clip(w, h, n, seed=seed)
    ys = w * h
    cs = ys // 4
    return [(clip[i, :ys].reshape(h, w),
             clip[i, ys:ys + cs].reshape(h // 2, w // 2),
             clip[i, ys + cs:].reshape(h // 2, w // 2)) for i in range(n)]


def _run(params, srcs, w, h):
    sess = CompressSession(params)
    sess.begin(w, h)
    bs = b"".join(sess.compress(s) for s in srcs)
    st = sess.end()
    return sess, st, bs + st["tail"]


def test_session_psnr_ssim_exact_ip():
    W, H, N = 64, 48, 5
    srcs = _clip_planes(W, H, N, seed=3)
    sess, st, bs = _run(EncoderParams(
        rc_mode="cqp", qp=28, bframes=0, mbtree=False, deblock=True,
        cabac=False, merange=4, psnr=True, ssim=True), srcs, W, H)

    ff = oracle.decode_h264_planes(bs)
    assert ff is not None and ff[0].shape[0] == N
    exp = [frame_psnr_yuv(srcs[i], (ff[0][i], ff[1][i], ff[2][i]))
           for i in range(N)]
    assert abs(st["psnr"]["y"] - np.mean([e["y"] for e in exp])) < 1e-6
    assert abs(st["psnr"]["global"]
               - np.mean([e["global"] for e in exp])) < 1e-6
    exp_ssim = np.mean([ssim(srcs[i][0], ff[0][i]) for i in range(N)])
    assert abs(st["ssim"] - exp_ssim) < 1e-9
    # per-frame log lines (the reference's per-frame x264 log callback role)
    lines = [m for (_, m) in sess.log.history if m.startswith("frame=")]
    assert len(lines) == N
    assert "psnr_y=" in lines[0] and "ssim_y=" in lines[0]
    assert "type=I" in lines[0] and "type=P" in lines[1]


def test_session_psnr_exact_with_bframes():
    W, H, N = 64, 48, 7
    srcs = _clip_planes(W, H, N, seed=5)
    sess, st, bs = _run(EncoderParams(
        rc_mode="cqp", qp=30, bframes=2, mbtree=False, deblock=False,
        cabac=False, merange=4, psnr=True, ssim=False), srcs, W, H)

    ff = oracle.decode_h264_planes(bs)
    assert ff is not None and ff[0].shape[0] == N
    exp = [frame_psnr_yuv(srcs[i], (ff[0][i], ff[1][i], ff[2][i]))
           for i in range(N)]
    assert abs(st["psnr"]["y"] - np.mean([e["y"] for e in exp])) < 1e-6
    lines = [m for (_, m) in sess.log.history if m.startswith("frame=")]
    assert len(lines) == N and any("type=B" in ln for ln in lines)
    assert "ssim_y" not in lines[0]


def test_session_telemetry_off_by_log_level():
    """log level < info suppresses measurement like the reference gate."""
    W, H, N = 64, 48, 2
    srcs = _clip_planes(W, H, N, seed=7)
    sess, st, _ = _run(EncoderParams(
        rc_mode="cqp", qp=28, bframes=0, mbtree=False, cabac=False,
        merange=4, psnr=True, ssim=True, log_level=1), srcs, W, H)
    assert "psnr" not in st and "ssim" not in st
    assert not any(m.startswith("frame=") for (_, m) in sess.log.history)
