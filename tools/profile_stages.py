"""Stage-level timing of the 1080p P-frame device pipeline on the real TPU.

Times each stage of the fused P program in isolation (ME decision, subpel
refine, exact MC, transform+quant+recon, CAVLC slots, pack) so perf work
targets the real bottleneck.  Run: python tools/profile_stages.py [rng]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(fn, *args, n=10, **kw):
    import jax
    r = fn(*args, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args, **kw)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1000.0  # ms


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from x264vfw_tpu.encode import device as D
    from x264vfw_tpu.encode import device_finalize as F

    rng = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    me = sys.argv[2] if len(sys.argv) > 2 else "auto"
    W, H = 1920, 1088
    r = np.random.default_rng(0)
    yy, xx = np.mgrid[0:H, 0:W]
    base = (64 + 64 * np.sin(xx / 31.0) + 48 * np.cos(yy / 23.0))
    sy = np.clip(base + r.integers(-10, 11, (H, W)), 0, 255).astype(np.int32)
    ry = np.clip(base + r.integers(-10, 11, (H, W)), 0, 255).astype(np.int32)
    su = np.full((H // 2, W // 2), 128, np.int32)
    ru = su.copy()
    sy_d, ry_d = jnp.asarray(sy), jnp.asarray(ry)
    su_d, ru_d = jnp.asarray(su), jnp.asarray(ru)
    qp, qpc = 26, 26

    # ---- full P core ----
    core = jax.jit(partial(D.encode_p_frame_core, rng=rng, subpel=True,
                           me_backend=me))
    ms = t(core, sy_d, su_d, su_d, ry_d, ru_d, ru_d, qp, qpc)
    print(f"P core total           : {ms:8.2f} ms  ({1000/ms:6.1f} fps)")

    # ---- ME+MC only ----
    mc = jax.jit(partial(D._motion_search_and_mc, rng=rng, subpel=True,
                         me_backend=me))
    ms_mc = t(mc, sy_d, su_d, su_d, ry_d, ru_d, ru_d)
    print(f"  ME + MC              : {ms_mc:8.2f} ms")

    # ---- ME+MC, integer only (no subpel) ----
    mci = jax.jit(partial(D._motion_search_and_mc, rng=rng, subpel=False,
                          me_backend=me))
    ms_mci = t(mci, sy_d, su_d, su_d, ry_d, ru_d, ru_d)
    print(f"  ME + MC (int only)   : {ms_mci:8.2f} ms")

    # ---- halfpel planes alone ----
    pad = jnp.pad(ry_d, rng + 8, mode="edge").astype(jnp.int16)
    hp = jax.jit(D._halfpel_planes)
    ms_hp = t(hp, pad)
    print(f"  halfpel planes       : {ms_hp:8.2f} ms")

    # ---- transform pipeline alone (pred = ref as stand-in) ----
    smbs = D.mbize(sy_d)
    pmbs = D.mbize(ry_d)
    tp = jax.jit(partial(D._luma_residual_pipeline, intra=False,
                         decimate=True))
    ms_tp = t(tp, smbs, pmbs, qp)
    print(f"  luma resid pipeline  : {ms_tp:8.2f} ms")

    # ---- finalize (slots) + pack ----
    full = jax.jit(partial(F.encode_p_slots, rng=rng, subpel=True,
                           me_backend=me))
    hv = jnp.zeros((F.MAX_HDR,), jnp.uint32)
    hl = jnp.zeros((F.MAX_HDR,), jnp.int32)
    src_row = jnp.asarray(np.concatenate([
        sy.astype(np.uint8).ravel(),
        su.astype(np.uint8).ravel(), su.astype(np.uint8).ravel()]))
    ms_full = t(full, src_row, ry_d, ru_d, ru_d, qp, qpc, hv, hl)
    print(f"encode_p_slots total   : {ms_full:8.2f} ms  ({1000/ms_full:6.1f} fps)")
    v, l, nb, *_ = full(src_row, ry_d, ru_d, ru_d, qp, qpc, hv, hl)
    ms_pk = t(F.pack_phase, v, l, 1 << 14)
    print(f"  pack_phase (16k wd)  : {ms_pk:8.2f} ms")
    print(f"  finalize (slots) est : {ms_full - ms_mc - ms_tp:8.2f} ms (residual)")


if __name__ == "__main__":
    main()


def profile_me():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from x264vfw_tpu.encode import device as D
    from x264vfw_tpu.ops.pallas.sad import sad_search

    rng = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    W, H = 1920, 1088
    r = np.random.default_rng(0)
    sy = r.integers(0, 256, (H, W)).astype(np.int16)
    ry = r.integers(0, 256, (H, W)).astype(np.int16)
    sy_d = jnp.asarray(sy)
    ry_pad = jnp.pad(jnp.asarray(ry), rng, mode="edge")
    f = jax.jit(partial(sad_search, rng=rng))
    ms = t(f, sy_d, ry_pad)
    print(f"pallas SAD rng={rng}     : {ms:8.2f} ms")
