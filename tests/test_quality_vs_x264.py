"""Quality benchmark vs real x264 at matched settings (rate+PSNR evidence).

Compares our TPU encoder against libx264 constrained to the closest feature
set (CAVLC, P16x16-ish, 1 ref, no deblock/B/8x8dct) at equal QP — reports
bitrate and PSNR; asserts we are within a sane envelope of the reference.
"""

import numpy as np
import pytest

import oracle
from x264vfw_tpu.encode.ref_encoder import EncoderConfig
from x264vfw_tpu.encode.tpu_encoder import TpuEncoder


def encode_ours(clip, w, h, qp, n):
    enc = TpuEncoder(EncoderConfig(width=w, height=h, qp=qp, keyint=100,
                                   search_range=8, subpel=True))
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
    opts = ("partitions=none:no-deblock=1:ref=1:bframes=0:weightp=0:8x8dct=0:"
            "no-mbtree=1:rc-lookahead=0:scenecut=0:subme=2:me=hex:keyint=100:"
            "no-cabac=1:log-level=none")
    bs = oracle.encode_x264(clip[:n], n, w, h, qp=qp, preset="ultrafast",
                            x264opts=opts)
    dec = oracle.decode_h264_planes(bs)
    ps = oracle.psnr(dec[0].reshape(n, -1),
                     clip[:n, :w * h].astype(np.float64))
    return len(bs) * 8 / n, ps


def test_rate_quality_vs_x264():
    w, h, n = 128, 96, 8
    clip = oracle.make_test_clip(w, h, n, seed=11)
    report = []
    for qp in (22, 28, 34):
        ob, op = encode_ours(clip, w, h, qp, n)
        xb, xp = encode_x264(clip, w, h, qp, n)
        report.append((qp, ob, op, xb, xp))
    print("\nqp |  ours bits/frame  PSNR |  x264 bits/frame  PSNR")
    for qp, ob, op, xb, xp in report:
        print(f"{qp} | {ob:12.0f} {op:9.2f} | {xb:12.0f} {xp:9.2f}")
    for qp, ob, op, xb, xp in report:
        # same-QP PSNR within 1.5 dB of x264 (restricted modes cost a bit)
        assert op > xp - 1.5, (qp, op, xp)
        # and bits within 2x (no trellis/psy/partitions yet)
        assert ob < xb * 2.0, (qp, ob, xb)
