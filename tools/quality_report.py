"""BD-rate of the DEFAULT session config vs stock x264 medium (tune psnr).

The north-star quality clause (BASELINE.md): BD-rate within 5% of x264.
This measures the real gap on >= 64 frames at >= 640x360 over two content
types (synthetic pan + textured natural-ish), 4 QPs, PSNR from the
stock-FFmpeg oracle decode of BOTH encoders' streams.

Ours: the default CompressSession config (CABAC + B + 8x8 + partitions +
trellis + deblock + mbtree) with --aq-mode 0 (PSNR comparison; x264 side
runs --tune psnr which zeroes psy-rd and AQ).  x264: medium, tune psnr,
NOTHING else constrained.

Run: python tools/quality_report.py [w h n]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

QPS = (22, 26, 30, 34)


def make_pan_clip(w, h, n, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (96 + 70 * np.sin(xx / 41.0) + 50 * np.cos(yy / 29.0))
    tex = rng.integers(-14, 15, (h, w))
    out = []
    for k in range(n):
        y = np.clip(base + np.roll(tex, 2 * k, axis=1)
                    + 20 * np.sin((xx + 3 * k) / 23.0), 0, 255).astype(np.uint8)
        u = np.clip(128 + 28 * np.sin((xx[::2, ::2] + k) / 31.0), 0,
                    255).astype(np.uint8)
        v = np.clip(128 + 28 * np.cos((yy[::2, ::2] - k) / 37.0), 0,
                    255).astype(np.uint8)
        out.append(np.concatenate([y.ravel(), u.ravel(), v.ravel()]))
    return np.stack(out)


def make_texture_clip(w, h, n, seed=9):
    """Natural-ish texture: band-limited noise field (sum of smoothed
    octaves) with slow global + local motion."""
    rng = np.random.default_rng(seed)
    big = rng.normal(0, 1, (h * 2, w * 2))
    # smooth by separable box passes at three scales, sum octaves
    def blur(a, k):
        c = np.cumsum(a, axis=0)
        a = (np.roll(c, -k, 0) - c) / k
        c = np.cumsum(a, axis=1)
        return (np.roll(c, -k, 1) - c) / k
    field = (blur(big, 31) * 90 + blur(big, 9) * 40 + blur(big, 3) * 18)
    out = []
    for k in range(n):
        dy, dx = int(1.5 * k), 2 * k
        win = field[dy:dy + h, dx:dx + w]
        y = np.clip(128 + win, 0, 255).astype(np.uint8)
        u = np.clip(128 + blur(big, 21)[dy // 2:dy // 2 + h // 2,
                                        dx // 2:dx // 2 + w // 2] * 30,
                    0, 255).astype(np.uint8)
        v = np.clip(128 - blur(big, 17)[dy // 2:dy // 2 + h // 2,
                                        dx // 2:dx // 2 + w // 2] * 30,
                    0, 255).astype(np.uint8)
        out.append(np.concatenate([y.ravel(), u.ravel(), v.ravel()]))
    return np.stack(out)


def bd_rate(rate_a, psnr_a, rate_b, psnr_b) -> float:
    import math
    la, lb = np.log(rate_a), np.log(rate_b)
    pa = np.polyfit(psnr_a, la, 3)
    pb = np.polyfit(psnr_b, lb, 3)
    lo = max(min(psnr_a), min(psnr_b))
    hi = min(max(psnr_a), max(psnr_b))
    ia, ib = np.polyint(pa), np.polyint(pb)
    avg_a = (np.polyval(ia, hi) - np.polyval(ia, lo)) / (hi - lo)
    avg_b = (np.polyval(ib, hi) - np.polyval(ib, lo)) / (hi - lo)
    return math.exp(avg_b - avg_a) - 1.0


def encode_ours_session(clip, w, h, qp, n):
    import oracle
    from x264vfw_tpu.api import CompressSession
    from x264vfw_tpu.config.params import EncoderParams
    fsz, csz = w * h, w * h // 4
    s = CompressSession(EncoderParams(),
                       extra_cmdline=f"--qp {qp} --keyint 100 --aq-mode 0")
    s.begin(w, h)
    bs = b""
    for i in range(n):
        bs += s.compress((clip[i, :fsz].reshape(h, w),
                          clip[i, fsz:fsz + csz].reshape(h // 2, w // 2),
                          clip[i, fsz + csz:].reshape(h // 2, w // 2)),
                         "i420")
    bs += s.end()["tail"]
    dec = oracle.decode_h264(bs)
    assert dec.shape[0] == n, (dec.shape, n)
    ps = oracle.psnr(dec[:, :fsz], clip[:n, :fsz].astype(np.float64))
    return len(bs) * 8 / n, ps


def encode_x264_medium(clip, w, h, qp, n):
    import oracle
    bs = oracle.encode_x264(clip[:n], n, w, h, qp=qp, preset="medium",
                            x264opts="keyint=100:tune=psnr:log-level=none")
    dec = oracle.decode_h264_planes(bs)
    ps = oracle.psnr(dec[0].reshape(n, -1),
                     clip[:n, :w * h].astype(np.float64))
    return len(bs) * 8 / n, ps


def run(w=640, h=360, n=64):
    from x264vfw_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    results = {}
    for name, clip in (("pan", make_pan_clip(w, h, n)),
                       ("texture", make_texture_clip(w, h, n))):
        ours_r, ours_p, x_r, x_p = [], [], [], []
        for qp in QPS:
            ob, op = encode_ours_session(clip, w, h, qp, n)
            xb, xp = encode_x264_medium(clip, w, h, qp, n)
            ours_r.append(ob)
            ours_p.append(op)
            x_r.append(xb)
            x_p.append(xp)
            print(f"{name} qp{qp}: ours {ob:9.0f} b/f {op:6.2f} dB | "
                  f"x264 {xb:9.0f} b/f {xp:6.2f} dB", flush=True)
        bd = bd_rate(x_r, x_p, ours_r, ours_p)
        results[name] = bd
        print(f"{name}: BD-rate vs stock x264 medium (tune psnr): "
              f"{bd * 100:+.1f}%  (north star: +5%)", flush=True)
    return results


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    run(*(args or []))
