"""Scan vs unrolled-loop GOP program cost on the real TPU.

encode_pgop_slots (lax.scan over frames) measured ~35 ms/frame where the
same per-frame program dispatched alone costs ~15 ms compute — this probe
checks whether unrolling the frame loop inside one jit recovers the
single-frame cost while keeping one launch per GOP.

Run: python tools/profile_unroll.py [G]
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
    from functools import partial
    from x264vfw_tpu.encode import device_finalize as F
    from x264vfw_tpu.encode.ref_encoder import EncoderConfig
    from x264vfw_tpu.encode.tpu_encoder import TpuEncoder
    from x264vfw_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    G = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    W, H = 1920, 1080
    from bench import make_clip
    frames = make_clip(W, H, 4)
    cfg = EncoderConfig(width=W, height=H, qp=26, keyint=250, search_range=8,
                        deblock=True, aq_strength=1.0, trellis=True,
                        partitions=True)
    enc = TpuEncoder(cfg)
    enc.encode_gop_batch([frames[0]])   # I frame initializes enc.ref
    rows = jnp.asarray(enc.pack_batch_rows(
        [frames[k % len(frames)] for k in range(G)]))
    hv = jnp.zeros((F.MAX_HDR,), jnp.uint32)
    hl = jnp.zeros((F.MAX_HDR,), jnp.int32)
    mbh, mbw = (H + 15) // 16, W // 16

    from x264vfw_tpu.encode.device import encode_p_frame_core
    Hp = (H + 15) // 16 * 16
    ys = Hp * W
    cs = ys // 4

    @jax.jit
    def gop_unrolled(rows, ry, ru, rv):
        vs, ls = [], []
        ref = (ry, ru, rv)
        for k in range(G):
            row = rows[k]
            sy = row[:ys].reshape(Hp, W).astype(jnp.int32)
            su = row[ys:ys + cs].reshape(Hp // 2, W // 2).astype(jnp.int32)
            sv = row[ys + cs:].reshape(Hp // 2, W // 2).astype(jnp.int32)
            out = encode_p_frame_core(
                sy, su, sv, *ref, enc.qp, enc.qpc, cfg.search_range,
                cfg.subpel, cfg.me_backend, aq_strength=cfg.aq_strength,
                qpc_offset=enc.pps.chroma_qp_index_offset,
                trellis=cfg.trellis, partitions=enc.partitions)
            v, l = F._finalize_p_core(out, hv, hl, mbh, mbw)
            ref = F._maybe_deblock(out, enc.qp, mbh, mbw, False, cfg.deblock,
                                   cfg.deblock_alpha, cfg.deblock_beta,
                                   qpc_offset=enc.pps.chroma_qp_index_offset)
            vs.append(v)
            ls.append(l.sum())
        return jnp.stack(ls), ref

    t0 = time.perf_counter()
    nb, ref = gop_unrolled(rows, *enc.ref)
    np.asarray(nb)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    reps = 6
    t0 = time.perf_counter()
    acc = ref
    for _ in range(reps):
        nb, acc = gop_unrolled(rows, *acc)
    np.asarray(nb)
    dt = time.perf_counter() - t0
    print(f"unrolled G={G}: {dt/reps*1000:.1f} ms/dispatch, "
          f"{dt/reps/G*1000:.2f} ms/frame, {reps*G/dt:.1f} fps", flush=True)


if __name__ == "__main__":
    main()
