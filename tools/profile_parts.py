"""Sub-stage timing of the ALL-features (partitions) 1080p P path on the
real TPU: Pallas SAD minima, Pallas refine+MC, chroma MC, residual
pipelines, slot finalize, deblock, pack.  Chained-dispatch timing (see
profile_stages2.py for the method).

Run: python tools/profile_parts.py
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
    from x264vfw_tpu.encode import device as D
    from x264vfw_tpu.encode import device_finalize as F
    from x264vfw_tpu.encode import inter_partition as IP
    from x264vfw_tpu.ops.pallas.sad import sad_partition_minima
    from x264vfw_tpu.ops.pallas.memc import partition_refine_mc
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
    su_d = jnp.asarray(su)
    qp, qpc = 26, 26
    mbh, mbw = H // 16, W // 16
    PAD = rng + 8
    src16 = sy_d.astype(jnp.int16)
    ref_pad = jnp.pad(ry_d, PAD, mode="edge").astype(jnp.int16)

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

    def pert16(c):
        return (c * 0).astype(jnp.int16)

    # 1. Pallas partition SAD minima
    f1 = jax.jit(lambda c: sad_partition_minima(
        src16 + pert16(c), ref_pad[8:-8, 8:-8], rng)["v16"]
        .sum().astype(jnp.int32))
    timed("sad_partition_minima", f1)

    # integer decision inputs for the refine stage
    mins = sad_partition_minima(src16, ref_pad[8:-8, 8:-8], rng)
    part, mv8i = IP.partition_decide_from_minima(mins, rng, qp)
    part = jax.block_until_ready(part)

    # 2. Pallas fused refine + MC
    f2 = jax.jit(lambda c: partition_refine_mc(
        src16 + pert16(c), ref_pad, mv8i, part, rng)[1]
        .sum().astype(jnp.int32))
    timed("partition_refine_mc", f2)

    mv8, pred_y = partition_refine_mc(src16, ref_pad, mv8i, part, rng)

    # 3. chroma MC
    f3 = jax.jit(lambda c: IP._chroma_mc_8x8(
        mv8 + (c * 0), su_d.astype(jnp.int16), su_d.astype(jnp.int16),
        rng, H, W)[0].sum().astype(jnp.int32))
    timed("chroma MC 8x8", f3)

    # 4. luma residual pipeline (trellis on)
    smbs = D.mbize(sy_d)
    pmbs = D.mbize(pred_y)
    f4 = jax.jit(lambda c: D._luma_residual_pipeline(
        smbs + pert16(c).astype(jnp.int32), pmbs, qp, intra=False,
        decimate=True, trellis=True)[0].sum().astype(jnp.int32))
    timed("luma resid (trellis)", f4)

    # 5. chroma residual pipeline x2
    sc8 = D.mbize(su_d, 8)
    pc8 = D.mbize(su_d, 8)
    f5 = jax.jit(lambda c: D._chroma_residual_pipeline(
        sc8 + (c * 0), pc8, qpc, False)[0].sum().astype(jnp.int32))
    timed("chroma resid (x1)", f5)

    # 6. full core (partitions + aq + trellis)
    f6 = jax.jit(lambda c: D.encode_p_frame_core(
        sy_d + (c * 0), su_d, su_d, ry_d, su_d, su_d, qp, qpc, rng,
        True, "auto", aq_strength=1.0, trellis=True,
        partitions=True)["levels"].sum().astype(jnp.int32))
    timed("P core ALL", f6)

    # 7. slots on top of core
    hv = jnp.zeros((F.MAX_HDR,), jnp.uint32)
    hl = jnp.zeros((F.MAX_HDR,), jnp.int32)
    src_row = jnp.asarray(np.concatenate([
        sy.astype(np.uint8).ravel(),
        su.astype(np.uint8).ravel(), su.astype(np.uint8).ravel()]))
    f7 = jax.jit(lambda c: F.encode_p_slots(
        (src_row + (c * 0).astype(jnp.uint8)), ry_d, su_d, su_d, qp, qpc,
        hv, hl, rng, True, "auto", deblock=True, aq_strength=1.0,
        trellis=True, partitions=True)[2])
    timed("p_slots ALL", f7)

    # 8. deblock alone
    out = D.encode_p_frame_core(sy_d, su_d, su_d, ry_d, su_d, su_d, qp, qpc,
                                rng, True, "auto")
    ry8, ru8, rv8 = (out["recon_y"], out["recon_u"], out["recon_v"])
    mvq = out["mv"]
    lv = out["levels"]
    cbp = out["cbp_luma"]

    def dbl(c):
        o2 = dict(out)
        o2["recon_y"] = ry8 + c * 0
        return F._maybe_deblock(o2, qp, mbh, mbw, False, True, 0, 0)[0] \
            .sum().astype(jnp.int32)
    timed("deblock", jax.jit(dbl))

    # 9. pack
    v, l, nb, *_ = F.encode_p_slots(src_row, ry_d, su_d, su_d, qp, qpc,
                                    hv, hl, rng, True, "auto",
                                    partitions=True)
    v = jax.block_until_ready(v)
    pk = jax.jit(lambda c: F.pack_phase(
        v + (c * 0).astype(jnp.uint32), l, 1 << 14)[1].sum()
        .astype(jnp.int32))
    timed("pack 16k", pk)


if __name__ == "__main__":
    main()
