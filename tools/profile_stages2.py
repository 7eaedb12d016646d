"""Honest stage-level timing of the 1080p P pipeline on the real TPU.

`jax.block_until_ready` does not reliably block through the axon tunnel, so
every measurement here chains dispatches through a device scalar carry and
pulls one scalar at the end (the bench.py method).  Reports the raw tunnel
round-trip too so stage times can be read net of dispatch latency.

Run: python tools/profile_stages2.py
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
    from x264vfw_tpu.encode import device as D
    from x264vfw_tpu.encode import device_finalize as F
    from x264vfw_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    rng = 8
    W, H = 1920, 1088
    r = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W]
    base = (64 + 64 * np.sin(xx / 31.0) + 48 * np.cos(yy / 23.0))
    sy = np.clip(base + r.integers(-10, 11, (H, W)), 0, 255).astype(np.int32)
    ry = np.clip(base + r.integers(-10, 11, (H, W)), 0, 255).astype(np.int32)
    su = np.full((H // 2, W // 2), 128, np.int32)
    sy_d, ry_d = jnp.asarray(sy), jnp.asarray(ry)
    su_d, ru_d = jnp.asarray(su), jnp.asarray(su)
    qp, qpc = 26, 26

    def timed(label, step, n=8):
        c = step(jnp.int32(0))
        np.asarray(c)
        t0 = time.perf_counter()
        for _ in range(n):
            c = step(c)
        np.asarray(c)
        ms = (time.perf_counter() - t0) / n * 1000.0
        print(f"{label:26s}: {ms:8.2f} ms", flush=True)
        return ms

    # raw dispatch round-trip
    triv = jax.jit(lambda c: c + 1)
    timed("dispatch round-trip", lambda c: triv(c))

    def pert(c):
        return (c * 0).astype(jnp.int32)

    # ME+MC (integer)
    mci = jax.jit(lambda c: D._motion_search_and_mc(
        sy_d + pert(c), su_d, su_d, ry_d, ru_d, ru_d, rng=rng,
        subpel=False, me_backend="auto")[0].sum().astype(jnp.int32))
    timed("ME+MC int", mci)

    # ME+MC (subpel)
    mcs = jax.jit(lambda c: D._motion_search_and_mc(
        sy_d + pert(c), su_d, su_d, ry_d, ru_d, ru_d, rng=rng,
        subpel=True, me_backend="auto")[0].sum().astype(jnp.int32))
    timed("ME+MC subpel", mcs)

    # halfpel planes alone
    pad = jnp.pad(ry_d, rng + 8, mode="edge").astype(jnp.int16)
    hp = jax.jit(lambda c: D._halfpel_planes(
        pad + pert(c).astype(jnp.int16))[0].sum().astype(jnp.int32))
    timed("halfpel planes", hp)

    # luma residual pipeline
    smbs = D.mbize(sy_d)
    pmbs = D.mbize(ry_d)
    tp = jax.jit(lambda c: D._luma_residual_pipeline(
        smbs + pert(c), pmbs, qp, intra=False,
        decimate=True)[0].sum().astype(jnp.int32))
    timed("luma resid pipeline", tp)

    # full P core (no finalize)
    core = jax.jit(lambda c: D.encode_p_frame_core(
        sy_d + pert(c), su_d, su_d, ry_d, ru_d, ru_d, qp, qpc, rng,
        True, "auto")["levels"].sum().astype(jnp.int32))
    timed("P core (subpel)", core)

    # P core + finalize slots
    hv = jnp.zeros((F.MAX_HDR,), jnp.uint32)
    hl = jnp.zeros((F.MAX_HDR,), jnp.int32)
    src_row = jnp.asarray(np.concatenate([
        sy.astype(np.uint8).ravel(),
        su.astype(np.uint8).ravel(), su.astype(np.uint8).ravel()]))
    slots = jax.jit(lambda c: F.encode_p_slots(
        (src_row + (c * 0).astype(jnp.uint8)), ry_d, ru_d, ru_d, qp, qpc,
        hv, hl, rng, True, "auto")[2])
    timed("p_slots total", slots)

    # pack phase
    v, l, nb, *_ = F.encode_p_slots(src_row, ry_d, ru_d, ru_d, qp, qpc,
                                    hv, hl, rng, True, "auto")
    v = jax.block_until_ready(v)
    pk = jax.jit(lambda c, v_, l_: F.pack_phase(
        v_ + (c * 0).astype(jnp.uint32), l_, 1 << 14)[1].sum()
        .astype(jnp.int32))
    timed("pack_phase 16k", lambda c: pk(c, v, l))


if __name__ == "__main__":
    main()
