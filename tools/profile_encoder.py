"""Stage-level profiling of the 1080p P-frame encode pipeline on the real
TPU.  Times each stage as steady-state throughput: N async dispatches
chained on device, one scalar pull at the end (block_until_ready is not
trustworthy over the axon tunnel).

Usage: python tools/profile_encoder.py [N]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax
    import jax.numpy as jnp
    from x264vfw_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from x264vfw_tpu.encode import device as dev
    from x264vfw_tpu.encode import device_finalize as fin

    W, H = 1920, 1088
    rng_px = np.random.default_rng(0)
    ynp = rng_px.integers(0, 256, (H, W)).astype(np.int32)
    unp = rng_px.integers(0, 256, (H // 2, W // 2)).astype(np.int32)
    vnp = rng_px.integers(0, 256, (H // 2, W // 2)).astype(np.int32)
    sy, su, sv = jnp.asarray(ynp), jnp.asarray(unp), jnp.asarray(vnp)
    ry = jnp.asarray(np.roll(ynp, 3, 1))
    ru, rv = jnp.asarray(unp), jnp.asarray(vnp)
    RNG = 8

    def timeit(name, fn, *args, scalar=None, n=N):
        # warmup/compile
        out = fn(*args)
        s = scalar(out) if scalar else out
        np.asarray(jax.tree.leaves(s)[0]).ravel()[:1]
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        s = scalar(out) if scalar else out
        np.asarray(jax.tree.leaves(s)[0]).ravel()[:1]
        dt = (time.perf_counter() - t0) / n
        print(f"{name:40s} {dt * 1e3:8.2f} ms  ({1.0 / dt:7.1f} /s)")
        return dt

    # --- stage: Pallas SAD full search ---
    from x264vfw_tpu.ops.pallas.sad import sad_search
    ref_pad = jnp.pad(ry, RNG, mode="edge").astype(jnp.int16)
    sad_fn = jax.jit(lambda a, b: sad_search(a, b, RNG).sum())
    timeit("pallas SAD search (rng=8)", sad_fn, sy.astype(jnp.int16), ref_pad)

    # --- stage: halfpel plane build ---
    PAD = RNG + 8
    rp = jnp.pad(ry, PAD, mode="edge").astype(jnp.int16)
    hp_fn = jax.jit(lambda a: tuple(x.astype(jnp.int32).sum()
                                    for x in dev._halfpel_planes(a)))
    timeit("halfpel planes (6-tap b/h/j)", hp_fn, rp)

    # --- stage: full motion search + MC ---
    ms_fn = jax.jit(lambda *a: jax.tree.map(
        lambda x: x.sum(), dev._motion_search_and_mc(*a, RNG)))
    timeit("motion search + align + MC", ms_fn, sy, su, sv, ry, ru, rv)

    # --- stage: integer-only ME+MC (subpel off) ---
    ms0_fn = jax.jit(lambda *a: jax.tree.map(
        lambda x: x.sum(),
        dev._motion_search_and_mc(*a, RNG, subpel=False)))
    timeit("motion search + MC (int-pel only)", ms0_fn, sy, su, sv, ry, ru, rv)

    # --- stage: residual pipeline (given prediction) ---
    pred = dev.mbize(ry)
    src_mbs = dev.mbize(sy)
    rp_fn = jax.jit(lambda a, b: jax.tree.map(
        lambda x: x.sum(),
        dev._luma_residual_pipeline(a, b, 26, False, decimate=True)))
    timeit("luma residual fdct/quant/recon", rp_fn, src_mbs, pred)

    # --- full P encode core ---
    p_fn = jax.jit(lambda *a: jax.tree.map(
        lambda x: x.sum(),
        dev.encode_p_frame_core(*a, 26, 26, RNG)))
    timeit("encode_p_frame_core (full)", p_fn, sy, su, sv, ry, ru, rv)

    # --- finalize (CAVLC slots) + pack ---
    out = jax.jit(lambda *a: dev.encode_p_frame_core(*a, 26, 26, RNG))(
        sy, su, sv, ry, ru, rv)
    out = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), out)
    hv = jnp.zeros((fin.MAX_HDR,), jnp.uint32)
    hl = jnp.zeros((fin.MAX_HDR,), jnp.int32)
    fin_fn = jax.jit(lambda o: jax.tree.map(
        lambda x: x.sum() if x.dtype != jnp.uint32 else x.astype(jnp.int32).sum(),
        fin._finalize_p_core(o, hv, hl, H // 16, W // 16)))
    timeit("CAVLC finalize (slots)", fin_fn, out)

    v, l = jax.jit(lambda o: fin._finalize_p_core(o, hv, hl, H // 16,
                                                  W // 16))(out)
    pk_fn = jax.jit(lambda a, b: fin.pack_phase(a, b, 1 << 15)[1])
    timeit("pack_slots (32k words)", pk_fn, v, l)

    # --- full fused program (what the bench runs per frame) ---
    def full(src):
        return fin.encode_p_slots(src, ry, ru, rv, 26, 26, hv[None].reshape(-1),
                                  hl[None].reshape(-1), RNG)

    src_packed = jnp.asarray(np.concatenate([
        ynp.astype(np.uint8).ravel(), unp.astype(np.uint8).ravel(),
        vnp.astype(np.uint8).ravel()]))
    timeit("encode_p_slots fused (phase 1)", full, src_packed,
           scalar=lambda o: o[2])

    # --- host->device upload of one 1080p frame ---
    t0 = time.perf_counter()
    for i in range(N):
        x = jnp.asarray(src_packed if i % 2 else np.asarray(src_packed))
    np.asarray(x[:1])
    dt = (time.perf_counter() - t0) / N
    print(f"{'upload 3.1MB frame (alt cached)':40s} {dt * 1e3:8.2f} ms")

    host = np.asarray(src_packed)
    t0 = time.perf_counter()
    for _ in range(N):
        x = jnp.asarray(host) + 0
    np.asarray(x[:1])
    dt = (time.perf_counter() - t0) / N
    print(f"{'upload 3.1MB frame (fresh)':40s} {dt * 1e3:8.2f} ms  "
          f"({3.11 / dt:6.1f} MB/s)")


if __name__ == "__main__":
    main()
