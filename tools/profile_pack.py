"""Micro-profile of pack_slots internals at 1080p scale on the real TPU.

Run: python tools/profile_pack.py
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
    from x264vfw_tpu.encode.device_pack import _cumsum_2level, pack_slots
    from x264vfw_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    R, L = 8162, 874
    CAP = 1 << 13
    rng = np.random.default_rng(0)
    lens_np = np.where(rng.random((R, L)) < 0.25,
                       rng.integers(1, 12, (R, L)), 0).astype(np.int32)
    vals_np = rng.integers(0, 1 << 10, (R, L)).astype(np.uint32)
    vals = jnp.asarray(vals_np)
    lens = jnp.asarray(lens_np)

    def timed(label, step, n=16):
        c = step(jnp.int32(0))
        np.asarray(c)
        t0 = time.perf_counter()
        for _ in range(n):
            c = step(c)
        np.asarray(c)
        ms = (time.perf_counter() - t0) / n * 1000.0
        print(f"{label:28s}: {ms:8.3f} ms", flush=True)
        return ms

    timed("full pack 8k", jax.jit(lambda c: pack_slots(
        vals + (c * 0).astype(jnp.uint32), lens, CAP)[1].sum()
        .astype(jnp.int32)))

    timed("cumsum_2level x3", jax.jit(lambda c: (
        _cumsum_2level(lens + c * 0)[-1]
        + _cumsum_2level(lens + 1)[-1] + _cumsum_2level(lens + 2)[-1])
        .astype(jnp.int32)))

    def no_search(c):
        l2 = lens + c * 0
        ends = _cumsum_2level(l2)
        v = vals.reshape(-1)
        e = ends
        w_hi = jnp.clip((e - 1) >> 5, 0, CAP - 1)
        r = jnp.where(e > 0, (w_hi + 1) * 32 - e, 0)
        va = (v << r.astype(jnp.uint32))
        vb = (v >> (31 - r).astype(jnp.uint32)) >> 1
        csum_a = _cumsum_2level(va.reshape(R, L))
        csum_b = _cumsum_2level(vb.reshape(R, L))
        # fake boundary positions: skip the searchsorted, keep the gathers
        pos = jnp.clip(jnp.arange(CAP + 1) * (R * L // CAP), 0, R * L)

        def at(csum, p):
            S = jnp.where(p > 0, csum[jnp.maximum(p - 1, 0)], 0) \
                .astype(jnp.uint32)
            prev = jnp.concatenate([jnp.zeros((1,), jnp.uint32), S[:-1]])
            return S - prev

        words = at(csum_a, pos[:CAP]) + at(csum_b, pos[1:])
        return words.sum().astype(jnp.int32)

    timed("pack minus searchsorted", jax.jit(no_search))

    def only_search(c):
        l2 = lens + c * 0
        ends = _cumsum_2level(l2)
        w_hi = jnp.clip((ends - 1) >> 5, 0, CAP - 1)
        pos = jnp.searchsorted(w_hi, jnp.arange(CAP + 1, dtype=w_hi.dtype),
                               side="right")
        return pos.sum().astype(jnp.int32)

    timed("cumsum + searchsorted", jax.jit(only_search))


if __name__ == "__main__":
    main()
