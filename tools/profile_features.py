"""Per-feature timing of the 1080p P-frame device pipeline on the real TPU.

Times encode_p_slots with each encoder feature (deblock, AQ, trellis,
partitions, subpel) toggled individually so perf work targets the costly
one.  Measurement method matches bench.py: dispatches are CHAINED through a
device scalar carry (so they cannot overlap) and the result is pulled once
after the loop — `jax.block_until_ready` does not reliably block through
the axon tunnel, so naive timing reads as dispatch overhead only.

Run: python tools/profile_features.py
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
    ry_d = jnp.asarray(ry)
    ru_d = jnp.asarray(su)
    qp, qpc = 26, 26
    hv = jnp.zeros((F.MAX_HDR,), jnp.uint32)
    hl = jnp.zeros((F.MAX_HDR,), jnp.int32)
    src_row = jnp.asarray(np.concatenate([
        sy.astype(np.uint8).ravel(),
        su.astype(np.uint8).ravel(), su.astype(np.uint8).ravel()]))

    base_kw = dict(rng=rng, subpel=True, me_backend="auto", deblock=False,
                   aq_strength=0.0, trellis=False, partitions=False)

    def timed(step, n=8):
        c = step(jnp.int32(0))
        np.asarray(c)
        t0 = time.perf_counter()
        for _ in range(n):
            c = step(c)
        np.asarray(c)
        return (time.perf_counter() - t0) / n * 1000.0

    def run(label, **over):
        kw = dict(base_kw)
        kw.update(over)
        # carry perturbs the input so consecutive dispatches chain
        fn = jax.jit(lambda c, s: F.encode_p_slots(
            (s + (c * 0).astype(jnp.uint8)), ry_d, ru_d, ru_d, qp, qpc,
            hv, hl, **kw)[2])
        ms = timed(lambda c: fn(c, src_row))
        print(f"{label:28s}: {ms:8.2f} ms  ({1000/ms:7.1f} fps)", flush=True)
        return ms

    run("baseline (none)")
    run("+deblock", deblock=True)
    run("+aq", aq_strength=1.0)
    run("+trellis", trellis=True)
    run("+partitions", partitions=True)
    run("+nosubpel", subpel=False)
    run("ALL (bench config)", deblock=True, aq_strength=1.0, trellis=True,
        partitions=True)


if __name__ == "__main__":
    main()
