"""Compare per-frame cost: single-frame p_slots vs the G-frame GOP scan
path (encode_pgop_packed) on the real TPU — the bench uses the latter.

Chained dispatches + one host pull (axon block_until_ready is unreliable).
Run: python tools/profile_gop.py [G]
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

    G = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    W, H = 1920, 1080
    from bench import make_clip
    frames = make_clip(W, H, 4)

    cfg = EncoderConfig(width=W, height=H, qp=26, keyint=250, search_range=8,
                        deblock=True, aq_strength=1.0, trellis=True,
                        partitions=True)
    enc = TpuEncoder(cfg)
    enc.encode_gop_batch([frames[i % len(frames)] for i in range(G + 1)])

    rows_dev = jnp.asarray(enc.pack_batch_rows(
        [frames[k % len(frames)] for k in range(G)]))
    hvs = np.zeros((G, F.MAX_HDR), np.uint32)
    hls = np.zeros((G, F.MAX_HDR), np.int32)
    hvs[:, 0], hls[:, 0] = 1, 8
    args = (jnp.asarray(hvs), jnp.asarray(hls))
    bucket = getattr(enc, "_bucket_words", 1 << 13)

    def run_batch(ref):
        return F.encode_pgop_packed(
            rows_dev, *ref, enc.qp, enc.qpc, *args,
            cfg.search_range, cfg.subpel, bucket, cfg.me_backend,
            cfg.deblock, cfg.deblock_alpha, cfg.deblock_beta,
            cfg.aq_strength, enc.pps.chroma_qp_index_offset, cfg.trellis,
            enc.partitions)

    out = run_batch(enc.ref)
    np.asarray(out[1])
    reps = 6
    t0 = time.perf_counter()
    acc = out[2:5]
    for _ in range(reps):
        out = run_batch(acc)
        acc = out[2:5]
    np.asarray(out[1])
    dt = time.perf_counter() - t0
    print(f"gop_packed G={G}: {dt/reps*1000:.1f} ms/dispatch, "
          f"{dt/reps/G*1000:.2f} ms/frame, {reps*G/dt:.1f} fps", flush=True)

    # same features, single-frame path, chained
    ry, ru, rv = enc.ref
    src_row = rows_dev[0]
    fn = jax.jit(lambda c, s: F.encode_p_slots(
        (s + (c * 0).astype(jnp.uint8)), ry, ru, rv, enc.qp, enc.qpc,
        args[0][0], args[1][0], cfg.search_range, cfg.subpel,
        cfg.me_backend, cfg.deblock, cfg.deblock_alpha, cfg.deblock_beta,
        cfg.aq_strength, enc.pps.chroma_qp_index_offset, cfg.trellis,
        None, None, cfg.partitions)[2])
    c = fn(jnp.int32(0), src_row)
    np.asarray(c)
    n = 12
    t0 = time.perf_counter()
    for _ in range(n):
        c = fn(c, src_row)
    np.asarray(c)
    ms = (time.perf_counter() - t0) / n * 1000
    print(f"p_slots single (all feats): {ms:.2f} ms/frame, "
          f"{1000/ms:.1f} fps", flush=True)

    # gop path without the per-frame pack (slots only)
    try:
        out2 = F.encode_pgop_slots(
            rows_dev, *enc.ref, enc.qp, enc.qpc, *args,
            cfg.search_range, cfg.subpel, cfg.me_backend,
            cfg.deblock, cfg.deblock_alpha, cfg.deblock_beta,
            cfg.aq_strength, enc.pps.chroma_qp_index_offset, cfg.trellis,
            enc.partitions)
        np.asarray(out2[1] if isinstance(out2, tuple) else out2)

        t0 = time.perf_counter()
        acc = enc.ref
        for _ in range(reps):
            o = F.encode_pgop_slots(
                rows_dev, *acc, enc.qp, enc.qpc, *args,
                cfg.search_range, cfg.subpel, cfg.me_backend,
                cfg.deblock, cfg.deblock_alpha, cfg.deblock_beta,
                cfg.aq_strength, enc.pps.chroma_qp_index_offset,
                cfg.trellis, enc.partitions)
            acc = o[2:5]
        np.asarray(o[2])[:1]
        dt = time.perf_counter() - t0
        print(f"gop_slots G={G} (no pack): {dt/reps/G*1000:.2f} ms/frame",
              flush=True)
    except Exception as e:
        print("gop_slots probe failed:", repr(e)[:200], flush=True)


if __name__ == "__main__":
    main()
