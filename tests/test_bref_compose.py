"""B-frames x multi-reference composition.

x264 composes --bframes with --ref on every preset (reference option
forward at /root/reference/codec.c:843-847,887): P anchors search the
full DPB while B frames predict from the two adjacent anchors.  These
tests pin the composed config (CABAC + B + ref 3) end to end: stock
FFmpeg and our conformance decoder agree bit-exactly on the session
stream, multi-reference really engages (the ref-2-favouring flicker
clip encodes smaller than forced single-ref), and the batched pipeline
matches the per-frame scheduler byte for byte.
"""

import numpy as np

import oracle
from x264vfw_tpu.api import CompressSession
from x264vfw_tpu.config.params import EncoderParams
from x264vfw_tpu.decode.decoder import H264Decoder


def _flicker_clip(w, h, n, seed=7):
    """Frames alternate between two textures (period 2) plus noise: with
    anchors every 3 frames the previous-but-one DPB entry is the better
    match, so multi-ref P has something real to win on."""
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    texa = np.clip(70 + 70 * np.sin(xx / 13.0) + 40 * np.cos(yy / 9.0)
                   + r.integers(-12, 13, (h, w)), 0, 255)
    texb = np.clip(140 + 60 * np.cos((xx + 2 * yy) / 17.0)
                   + r.integers(-12, 13, (h, w)), 0, 255)
    fs = []
    for i in range(n):
        base = texa if i % 2 == 0 else texb
        y = np.clip(base + r.integers(-2, 3, (h, w)), 0, 255).astype(np.uint8)
        u = np.clip(120 + 30 * np.sin(xx[::2, ::2] / 19.0 + i % 2),
                    0, 255).astype(np.uint8)
        v = np.clip(128 + 24 * np.cos(yy[::2, ::2] / 23.0 - i % 2),
                    0, 255).astype(np.uint8)
        fs.append((y, u, v))
    return fs


KW = dict(rc_mode="cqp", qp=30, cabac=True, bframes=2, ref=3, keyint=20,
          mbtree=False, weightp=0, scenecut=0)


def _run(n, w, h, **kw):
    s = CompressSession(EncoderParams(**kw))
    s.begin(w, h)
    bs = s.encoder.headers()
    for f in _flicker_clip(w, h, n):
        bs += s.compress(f)
    st = s.end()
    return bs + st["tail"], s


def test_compose_conformance_and_refs():
    n, w, h = 16, 64, 64
    bs, s = _run(n, w, h, **KW)
    # the P path really ran 3 references after the DPB warmed up
    assert s.encoder.nref == 3
    assert getattr(s.encoder, "_cur_nref", 1) == 3
    ff = oracle.decode_h264_planes(bs)
    assert ff is not None, "stock FFmpeg rejected the composed stream"
    ys, us, vs = ff
    assert ys.shape[0] == n
    dec = H264Decoder()
    frames = dec.decode(bs)
    frames.sort(key=lambda f: f.poc)
    assert len(frames) == n
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(f.y[:h, :w], ys[i],
                                      err_msg=f"y f{i}")
        np.testing.assert_array_equal(f.u[:h // 2, :w // 2], us[i],
                                      err_msg=f"u f{i}")
        np.testing.assert_array_equal(f.v[:h // 2, :w // 2], vs[i],
                                      err_msg=f"v f{i}")


def test_compose_multiref_wins_on_flicker():
    n, w, h = 16, 64, 64
    bs3, _ = _run(n, w, h, **KW)
    bs1, _ = _run(n, w, h, **{**KW, "ref": 1})
    assert oracle.decode_h264_planes(bs1) is not None
    # anchors sit 3 apart on period-2 flicker: ref_idx 1+ carries the
    # matching texture, so 3-ref must not lose to single-ref
    assert len(bs3) < len(bs1), (len(bs3), len(bs1))


def test_compose_pipeline_matches_perframe():
    n, w, h = 16, 64, 48
    bs_b, s_b = _run(n, w, h, **KW)
    assert s_b._pipe is not None
    bs_f, s_f = _run(n, w, h, threads=1, **KW)
    assert s_f._pipe is None
    assert bs_b == bs_f
