"""Capacity measurement exactly as bench.py does it (encode_pgop_packed,
G=12, ALL features) vs the same features dispatched per frame — isolates
the GOP-scan + top-level-pack overhead.

Run: python tools/profile_gopscan.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from x264vfw_tpu.encode import device_finalize as F
    from x264vfw_tpu.encode.ref_encoder import EncoderConfig
    from x264vfw_tpu.encode.tpu_encoder import TpuEncoder
    from x264vfw_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    def make_clip(w, h, n, seed=0):
        rng = np.random.default_rng(seed)
        yy, xx = np.mgrid[0:h, 0:w]
        base = 64 + 64 * np.sin(xx / 31.0) + 48 * np.cos(yy / 23.0)
        tex = rng.integers(-10, 11, size=(h, w))
        frames = []
        for f in range(n):
            y = np.clip(base + np.roll(tex, f * 2, axis=1), 0, 255).astype(np.uint8)
            u = np.clip(128 + 24 * np.sin((xx[::2, ::2] + f) / 37.0), 0, 255).astype(np.uint8)
            v = np.clip(128 + 24 * np.cos((yy[::2, ::2] - f) / 41.0), 0, 255).astype(np.uint8)
            frames.append((y, u, v))
        return frames

    fr1080 = make_clip(1920, 1080, 4)
    G = 12
    cfg = EncoderConfig(width=1920, height=1080, qp=26, keyint=250,
                        search_range=8, deblock=True, aq_strength=1.0,
                        trellis=True, partitions=True)
    enc = TpuEncoder(cfg)
    enc.encode_gop_batch([fr1080[i % 4] for i in range(G + 1)])
    rows_dev = jnp.asarray(enc.pack_batch_rows([fr1080[k % 4] for k in range(G)]))
    hvs = np.zeros((G, F.MAX_HDR), np.uint32)
    hls = np.zeros((G, F.MAX_HDR), np.int32)
    hvs[:, 0], hls[:, 0] = 1, 8
    args = (jnp.asarray(hvs), jnp.asarray(hls))
    bucket = getattr(enc, "_bucket_words", 1 << 13)

    def run_batch(ref):
        return F.encode_pgop_packed(
            rows_dev, *ref, enc.qp, enc.qpc, *args, cfg.search_range,
            cfg.subpel, bucket, cfg.me_backend, cfg.deblock,
            cfg.deblock_alpha, cfg.deblock_beta, cfg.aq_strength,
            enc.pps.chroma_qp_index_offset, cfg.trellis, enc.partitions)

    out = run_batch(enc.ref)
    np.asarray(out[1])
    acc = out[2:5]
    t0 = time.perf_counter()
    for _ in range(4):
        out = run_batch(acc)
        acc = out[2:5]
    np.asarray(out[1])
    dt = time.perf_counter() - t0
    print(f"gop-scan packed (G=12): {dt / 48 * 1000:7.2f} ms/frame "
          f"({48 / dt:5.1f} fps)", flush=True)

    # same thing without the per-frame top-level packs (slots only)
    qps = jnp.full((G,), enc.qp, jnp.int32)
    qpcs = jnp.full((G,), enc.qpc, jnp.int32)

    def run_slots(ref):
        return F.encode_pgop_slots(
            rows_dev, *ref, qps, qpcs, *args, cfg.search_range,
            cfg.subpel, cfg.me_backend, cfg.deblock,
            cfg.deblock_alpha, cfg.deblock_beta, cfg.aq_strength,
            enc.pps.chroma_qp_index_offset, cfg.trellis, enc.partitions)

    out = run_slots(enc.ref)
    np.asarray(out[1][0, 0])
    acc = out[2:5]
    t0 = time.perf_counter()
    for _ in range(4):
        out = run_slots(acc)
        acc = out[2:5]
    np.asarray(out[1][0, 0])
    dt = time.perf_counter() - t0
    print(f"gop-scan slots only     : {dt / 48 * 1000:7.2f} ms/frame "
          f"({48 / dt:5.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
