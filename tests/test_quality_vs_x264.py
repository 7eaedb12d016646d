"""Quality benchmark vs real x264: BD-rate gate (rate+PSNR evidence).

Encodes the same clip at 4 QPs with our TPU encoder and with libx264
constrained to the matching feature set, then computes the Bjontegaard
delta rate (BD-rate) between the two rate-PSNR curves.  The gate ratchets
toward the "BD-rate within 5% of x264" north star (BASELINE.md); the
round-2 level asserts <= +25%.
"""

import math

import numpy as np

import oracle
from x264vfw_tpu.encode.ref_encoder import EncoderConfig
from x264vfw_tpu.encode.tpu_encoder import TpuEncoder

QPS = (22, 26, 30, 34)


def bd_rate(rate_a, psnr_a, rate_b, psnr_b) -> float:
    """Bjontegaard delta rate of curve B vs curve A (negative = B cheaper).

    Cubic fit of log-rate over PSNR, integrated on the overlapping PSNR
    interval (the standard BD-rate construction)."""
    la, lb = np.log(rate_a), np.log(rate_b)
    pa = np.polyfit(psnr_a, la, 3)
    pb = np.polyfit(psnr_b, lb, 3)
    lo = max(min(psnr_a), min(psnr_b))
    hi = min(max(psnr_a), max(psnr_b))
    ia = np.polyint(pa)
    ib = np.polyint(pb)
    avg_a = (np.polyval(ia, hi) - np.polyval(ia, lo)) / (hi - lo)
    avg_b = (np.polyval(ib, hi) - np.polyval(ib, lo)) / (hi - lo)
    return math.exp(avg_b - avg_a) - 1.0


def encode_ours(clip, w, h, qp, n):
    enc = TpuEncoder(EncoderConfig(width=w, height=h, qp=qp, keyint=100,
                                   search_range=8, subpel=True,
                                   partitions=True, deblock=True,
                                   trellis=True))
    fsz, csz = w * h, w * h // 4
    bits = 0
    recs = []
    for i in range(n):
        au = enc.encode_frame(clip[i, :fsz].reshape(h, w),
                              clip[i, fsz:fsz + csz].reshape(h // 2, w // 2),
                              clip[i, fsz + csz:].reshape(h // 2, w // 2))
        bits += len(au) * 8
        recs.append(enc.last_recon[0][:h, :w].ravel())
    ps = oracle.psnr(np.stack(recs), clip[:, :fsz].astype(np.float64))
    return bits / n, ps


def encode_x264(clip, w, h, qp, n):
    # feature set matched to what we implement: CAVLC, P16..8x8 partitions,
    # 1 ref, deblock on, no B, no 8x8dct/I4x4-only-extras, no psy/AQ (PSNR
    # comparison), light subme
    opts = ("partitions=p8x8,i16x16:no-deblock=0:ref=1:bframes=0:weightp=0:"
            "8x8dct=0:no-mbtree=1:rc-lookahead=0:scenecut=0:subme=4:me=hex:"
            "keyint=100:no-cabac=1:aq-mode=0:psy-rd=0:trellis=0:"
            "log-level=none")
    bs = oracle.encode_x264(clip[:n], n, w, h, qp=qp, preset="medium",
                            x264opts=opts)
    dec = oracle.decode_h264_planes(bs)
    ps = oracle.psnr(dec[0].reshape(n, -1),
                     clip[:n, :w * h].astype(np.float64))
    return len(bs) * 8 / n, ps


def test_bdrate_vs_x264():
    w, h, n = 128, 96, 8
    clip = oracle.make_test_clip(w, h, n, seed=11)
    ours_r, ours_p, x_r, x_p = [], [], [], []
    for qp in QPS:
        ob, op = encode_ours(clip, w, h, qp, n)
        ours_r.append(ob)
        ours_p.append(op)
        xb, xp = encode_x264(clip, w, h, qp, n)
        x_r.append(xb)
        x_p.append(xp)
    print("\nqp |  ours bits/frame  PSNR |  x264 bits/frame  PSNR")
    for i, qp in enumerate(QPS):
        print(f"{qp} | {ours_r[i]:12.0f} {ours_p[i]:9.2f} |"
              f" {x_r[i]:12.0f} {x_p[i]:9.2f}")
    bd = bd_rate(x_r, x_p, ours_r, ours_p)
    print(f"BD-rate vs x264 (matched features): {bd * 100:+.1f}%")
    # round-2 gate; ratchet toward the +5% north star (BASELINE.md)
    assert bd < 0.25, f"BD-rate {bd * 100:+.1f}% exceeds the +25% gate"


def test_bdrate_default_config_vs_stock_medium():
    """DEFAULT session config vs UNRESTRICTED stock x264 medium
    (tune psnr — psy/AQ off on both sides for a PSNR comparison).

    Measured reality (round 5, tools/quality_report.py on the real TPU,
    640x360 x 64 frames):
      - textured/natural content:  +64% BD-rate
      - dual-motion synthetic pan: +222% (the B path is the gap: B
        frames are 16x16-single-ref with no partitions/8x8/direct-
        temporal, and cost MORE bits than P on complex motion)
      - same content P-only (bframes=0): pan gap shrinks ~2x
    The north star is +5%; this gate holds the measured level so
    regressions fail loudly while the gap is being closed.  The full
    640x360 measurement stays in tools/quality_report.py (too slow for
    the CPU-mesh suite)."""
    from x264vfw_tpu.api import CompressSession
    from x264vfw_tpu.config.params import EncoderParams
    import os
    import sys
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    from quality_report import make_texture_clip
    w, h, n = 320, 192, 16
    clip = make_texture_clip(w, h, n)
    fsz, csz = w * h, w * h // 4
    ours_r, ours_p, x_r, x_p = [], [], [], []
    for qp in (24, 28, 32):
        s = CompressSession(EncoderParams(),
                            extra_cmdline=f"--qp {qp} --keyint 100 "
                                          f"--aq-mode 0")
        s.begin(w, h)
        bs = b""
        for i in range(n):
            bs += s.compress((clip[i, :fsz].reshape(h, w),
                              clip[i, fsz:fsz + csz].reshape(h // 2, w // 2),
                              clip[i, fsz + csz:].reshape(h // 2, w // 2)),
                             "i420")
        bs += s.end()["tail"]
        dec = oracle.decode_h264(bs)
        ours_r.append(len(bs) * 8 / n)
        ours_p.append(oracle.psnr(dec[:, :fsz],
                                  clip[:n, :fsz].astype(np.float64)))
        xbs = oracle.encode_x264(clip[:n], n, w, h, qp=qp, preset="medium",
                                 x264opts="keyint=100:tune=psnr:"
                                          "log-level=none")
        xdec = oracle.decode_h264_planes(xbs)
        x_r.append(len(xbs) * 8 / n)
        x_p.append(oracle.psnr(xdec[0].reshape(n, -1),
                               clip[:n, :fsz].astype(np.float64)))
    bd = bd_rate(x_r, x_p, ours_r, ours_p)
    print(f"\nDEFAULT config BD-rate vs stock x264 medium (tune psnr): "
          f"{bd * 100:+.1f}%  (north star +5%)")
    assert bd < 0.60, (
        f"default-config BD-rate {bd * 100:+.1f}% regressed past the "
        f"measured +60% level (north star +5%)")
