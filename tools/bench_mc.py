"""Compare motion-compensation strategies on the real TPU.

Candidates to replace the O(K) masked-shift alignment in
device._motion_search_and_mc (the current P-core bottleneck):
  A. current h-then-v masked scan (baseline, via _motion_search_and_mc)
  B. flat gather of (n, 24, 24) tiles from the padded ref
  C. two-stage take_along_axis (columns within bands, then rows)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(fn, *args, n=20, **kw):
    import jax
    r = fn(*args, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args, **kw)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    rng = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    W, H = 1920, 1088
    mbh, mbw = H // 16, W // 16
    n = mbh * mbw
    r = np.random.default_rng(0)
    ry = r.integers(0, 256, (H, W)).astype(np.int16)
    PAD = rng + 8
    ref_pad = jnp.asarray(np.pad(ry, PAD, mode="edge"))
    Hp, Wp = ref_pad.shape
    dx = jnp.asarray(r.integers(-rng, rng + 1, (mbh, mbw)), jnp.int32)
    dy = jnp.asarray(r.integers(-rng, rng + 1, (mbh, mbw)), jnp.int32)

    TS = 18  # tile size with 1px halo each side (qpel refine region)

    # ---- B: flat gather of (n, TS, TS) tiles ----
    @jax.jit
    def mc_gather(ref_pad, dx, dy):
        ybase = (jnp.arange(mbh) * 16)[:, None] + PAD - 1 + dy  # (mbh,mbw)
        xbase = (jnp.arange(mbw) * 16)[None, :] + PAD - 1 + dx
        yb = ybase.reshape(n)[:, None, None] + jnp.arange(TS)[None, :, None]
        xb = xbase.reshape(n)[:, None, None] + jnp.arange(TS)[None, None, :]
        flat = ref_pad.reshape(-1)
        idx = yb * Wp + xb
        return jnp.take(flat, idx.reshape(n, -1), axis=0).reshape(n, TS, TS)

    ms = t(mc_gather, ref_pad, dx, dy)
    print(f"B flat gather (n,{TS},{TS})    : {ms:8.2f} ms")

    # ---- C: two-stage take_along_axis ----
    Mg = rng + 1
    bh = 16 + 2 * Mg
    Wb = W + 2 * Mg

    @jax.jit
    def mc_taa(ref_pad, dx, dy):
        bands = jnp.stack([
            jax.lax.dynamic_slice(ref_pad, (PAD - Mg + 16 * i, PAD - Mg),
                                  (bh, Wb)) for i in range(mbh)])
        # columns: for MB (i, j) take cols Mg + 16*j - 1 + dx .. + TS
        xb = (jnp.arange(mbw) * 16)[None, :] + Mg - 1 + dx   # (mbh, mbw)
        cidx = (xb[:, :, None] + jnp.arange(TS)[None, None, :]).reshape(mbh, -1)
        cols = jnp.take_along_axis(bands, cidx[:, None, :], axis=2)  # (mbh,bh,mbw*TS)
        # rows: per MB take rows Mg - 1 + dy .. + TS
        yb = Mg - 1 + dy                                      # (mbh, mbw)
        ridx = yb[:, :, None] + jnp.arange(TS)[None, None, :]  # (mbh,mbw,TS)
        ridx_l = jnp.repeat(ridx.reshape(mbh, 1, mbw, TS), TS, axis=3)  # wrong shape on purpose? no
        return cols, ridx

    # simpler C: reshape cols to (mbh, bh, mbw, TS) then gather rows via
    # one-hot matmul-free take_along_axis on axis 1
    @jax.jit
    def mc_taa2(ref_pad, dx, dy):
        bands = jnp.stack([
            jax.lax.dynamic_slice(ref_pad, (PAD - Mg + 16 * i, PAD - Mg),
                                  (bh, Wb)) for i in range(mbh)])
        xb = (jnp.arange(mbw) * 16)[None, :] + Mg - 1 + dx
        cidx = (xb[:, :, None] + jnp.arange(TS)[None, None, :]).reshape(mbh, -1)
        cols = jnp.take_along_axis(bands, cidx[:, None, :], axis=2)
        cols4 = cols.reshape(mbh, bh, mbw, TS)
        yb = Mg - 1 + dy
        ridx = (yb[:, None, :, None]
                + jnp.arange(TS)[None, :, None, None])        # (mbh,TS,mbw,1)
        tiles = jnp.take_along_axis(cols4, jnp.broadcast_to(
            ridx, (mbh, TS, mbw, TS)), axis=1)                # (mbh,TS,mbw,TS)
        return tiles

    ms2 = t(mc_taa2, ref_pad, dx, dy)
    print(f"C two-stage take_along    : {ms2:8.2f} ms")

    # ---- A baseline: current masked-shift MC (int-only path) ----
    from x264vfw_tpu.encode import device as D
    su = np.full((H // 2, W // 2), 128, np.int32)
    sy_d = jnp.asarray(r.integers(0, 256, (H, W)).astype(np.int32))
    su_d = jnp.asarray(su)
    ry_d = jnp.asarray(ry.astype(np.int32))
    f = jax.jit(partial(D._motion_search_and_mc, rng=rng, subpel=False,
                        me_backend="pallas"))
    ms3 = t(f, sy_d, su_d, su_d, ry_d, su_d, su_d)
    print(f"A full ME+MC int (scan MC): {ms3:8.2f} ms")

    f2 = jax.jit(partial(D._motion_search_and_mc, rng=rng, subpel=True,
                         me_backend="pallas"))
    ms4 = t(f2, sy_d, su_d, su_d, ry_d, su_d, su_d)
    print(f"A full ME+MC subpel       : {ms4:8.2f} ms")


if __name__ == "__main__":
    main()
