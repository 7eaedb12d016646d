"""Pallas TPU kernel: H.264 in-loop deblocking filter (§8.7), exact.

The loop filter is irreducibly sequential over MBs in raster order — but
only through the pixels; the edge parameters (bs/alpha/beta/tc0) are pure
metadata, precomputed as data-parallel maps (ops/deblock.py).  This kernel
runs the sequential half at VMEM speed:

  * grid = (mbh + 1,) — TPU grid steps execute in order on one core, giving
    the spec's row-major MB order for free;
  * within a row program, a lax.fori_loop walks MBs left -> right over a
    ROLLING window: the row band rotates 16 lanes per MB so every edge
    access is a static (Mosaic-friendly) slice — no dynamic lane indexing;
  * the bottom 4 luma / 2 chroma rows of each band (still mutable by the
    next row's top-edge filter) ride a persistent VMEM scratch carry
    between grid steps, and each program emits its band shifted down by
    4 (2 for chroma) rows — the caller slices the shift off;
  * frame borders need no branches: their map entries carry bs = 0, which
    makes the filter the identity.

Capability replaced: libx264's deblock loops and the FFmpeg decoder loop
filter (SURVEY §2c) — reformulated for the TPU memory model (metadata maps
+ rolling-window sequential kernel), not translated.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _clip3(lo, hi, x):
    return jnp.minimum(jnp.maximum(x, lo), hi)


def _unpack(m):
    return m & 7, (m >> 3) & 31, (m >> 8) & 255, (m >> 16) & 31


def _luma_filter(p3, p2, p1, p0, q0, q1, q2, q3, m):
    """Elementwise §8.7.2.3/.4 (int32); mirrors ops/deblock_np exactly."""
    bs, tc0, alpha, beta = _unpack(m)
    act = ((bs > 0) & (jnp.abs(p0 - q0) < alpha)
           & (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta))
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta

    tc = tc0 + ap.astype(jnp.int32) + aq.astype(jnp.int32)
    delta = _clip3(-tc, tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3)
    w_p0 = jnp.clip(p0 + delta, 0, 255)
    w_q0 = jnp.clip(q0 - delta, 0, 255)
    dp1 = _clip3(-tc0, tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1)
    dq1 = _clip3(-tc0, tc0, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1)
    w_p1 = jnp.where(ap, p1 + dp1, p1)
    w_q1 = jnp.where(aq, q1 + dq1, q1)

    strong = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp = ap & strong
    s_p0 = jnp.where(sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                     (2 * p1 + p0 + q1 + 2) >> 2)
    s_p1 = jnp.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
    s_p2 = jnp.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    sq = aq & strong
    s_q0 = jnp.where(sq, (p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3,
                     (2 * q1 + q0 + p1 + 2) >> 2)
    s_q1 = jnp.where(sq, (p0 + q0 + q1 + q2 + 2) >> 2, q1)
    s_q2 = jnp.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)

    is4 = bs == 4
    n_p0 = jnp.where(act, jnp.where(is4, s_p0, w_p0), p0)
    n_p1 = jnp.where(act, jnp.where(is4, s_p1, w_p1), p1)
    n_p2 = jnp.where(act & is4, s_p2, p2)
    n_q0 = jnp.where(act, jnp.where(is4, s_q0, w_q0), q0)
    n_q1 = jnp.where(act, jnp.where(is4, s_q1, w_q1), q1)
    n_q2 = jnp.where(act & is4, s_q2, q2)
    return n_p2, n_p1, n_p0, n_q0, n_q1, n_q2


def _chroma_filter(p1, p0, q0, q1, m):
    bs, tc0, alpha, beta = _unpack(m)
    act = ((bs > 0) & (jnp.abs(p0 - q0) < alpha)
           & (jnp.abs(p1 - p0) < beta) & (jnp.abs(q1 - q0) < beta))
    tc = tc0 + 1
    delta = _clip3(-tc, tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3)
    w_p0 = jnp.clip(p0 + delta, 0, 255)
    w_q0 = jnp.clip(q0 - delta, 0, 255)
    s_p0 = (2 * p1 + p0 + q1 + 2) >> 2
    s_q0 = (2 * q1 + q0 + p1 + 2) >> 2
    is4 = bs == 4
    return (jnp.where(act, jnp.where(is4, s_p0, w_p0), p0),
            jnp.where(act, jnp.where(is4, s_q0, w_q0), q0))


def _rolll(ref, k):
    """Rotate scratch content left by k lanes (positive-shift roll)."""
    ref[:, :] = pltpu.roll(ref[:, :], ref.shape[1] - k, 1)


def _deblock_kernel(y_ref, u_ref, v_ref, mV_ref, mH_ref, mVc_ref, mHc_ref,
                    yo_ref, uo_ref, vo_ref,
                    ly, lu, lv, mv_s, mh_s, mvc_s, mhc_s,
                    *, mbw: int, mbh: int, W: int, Wc: int):
    r = pl.program_id(0)

    # scratch layout — luma ly: rows 0..15 = this MB row, rows 16..19 =
    # carry (the 4 rows above, still mutable by this row's top edges);
    # chroma lu/lv: rows 0..7 = this row, rows 8..9 = carry.
    ly[0:16, 0:W] = y_ref[:, :]
    lu[0:8, 0:Wc] = u_ref[:, :]
    lv[0:8, 0:Wc] = v_ref[:, :]
    mv_s[0:16, 0:4 * mbw] = mV_ref[:, :]
    mh_s[0:4, 0:W] = mH_ref[0:4, :]
    mvc_s[0:8, 0:2 * mbw] = mVc_ref[:, :]
    mhc_s[0:2, 0:Wc] = mHc_ref[0:2, :]

    @pl.when(r < mbh)
    def _filter_row():
        # lane offset: current MB's cols at lanes 4.. (2.. chroma) so the
        # left neighbour's V0 p-side sits at lanes 0..3 (0..1)
        ly[:, :] = pltpu.roll(ly[:, :], 4, 1)
        lu[:, :] = pltpu.roll(lu[:, :], 2, 1)
        lv[:, :] = pltpu.roll(lv[:, :], 2, 1)

        def mb_step(_, carry):
            # ---------- luma vertical edges (rows 0..15) ----------
            for e in range(4):
                L = 4 * e
                sl = ly[0:16, L:L + 8]
                me = mv_s[0:16, e:e + 1]
                parts = _luma_filter(*(sl[:, i:i + 1] for i in range(8)), me)
                ly[0:16, L + 1:L + 7] = jnp.concatenate(parts, axis=1)
            # ---------- chroma vertical edges (rows 0..7) ----------
            for e in range(2):
                L = 4 * e
                mce = mvc_s[0:8, e:e + 1]
                for pla in (lu, lv):
                    sl = pla[0:8, L:L + 4]
                    p0n, q0n = _chroma_filter(
                        *(sl[:, i:i + 1] for i in range(4)), mce)
                    pla[0:8, L + 1:L + 3] = jnp.concatenate([p0n, q0n], 1)
            # ---------- luma horizontal edges (lanes 4..19) ----------
            for f in range(4):
                P = ly[16:20, 4:20] if f == 0 else ly[4 * f - 4:4 * f, 4:20]
                Q = ly[4 * f:4 * f + 4, 4:20]
                mf = mh_s[f:f + 1, 0:16]
                parts = _luma_filter(P[0:1], P[1:2], P[2:3], P[3:4],
                                     Q[0:1], Q[1:2], Q[2:3], Q[3:4], mf)
                newP = jnp.concatenate(parts[0:3], axis=0)   # p2' p1' p0'
                newQ = jnp.concatenate(parts[3:6], axis=0)   # q0' q1' q2'
                if f == 0:
                    ly[17:20, 4:20] = newP
                else:
                    ly[4 * f - 3:4 * f, 4:20] = newP
                ly[4 * f:4 * f + 3, 4:20] = newQ
            # ---------- chroma horizontal edges (lanes 2..9) ----------
            for f in range(2):
                mcf = mhc_s[f:f + 1, 0:8]
                for pla in (lu, lv):
                    P = pla[8:10, 2:10] if f == 0 else \
                        pla[4 * f - 2:4 * f, 2:10]
                    Q = pla[4 * f:4 * f + 2, 2:10]
                    p0n, q0n = _chroma_filter(P[0:1], P[1:2],
                                              Q[0:1], Q[1:2], mcf)
                    if f == 0:
                        pla[9:10, 2:10] = p0n
                    else:
                        pla[4 * f - 1:4 * f, 2:10] = p0n
                    pla[4 * f:4 * f + 1, 2:10] = q0n
            # ---------- advance the window one MB ----------
            _rolll(ly, 16)
            _rolll(lu, 8)
            _rolll(lv, 8)
            _rolll(mv_s, 4)
            _rolll(mh_s, 16)
            _rolll(mvc_s, 2)
            _rolll(mhc_s, 8)
            return carry

        jax.lax.fori_loop(0, mbw, mb_step, 0)

        # undo the net rotation (left by W/Wc plus the initial +4/+2)
        ly[:, :] = pltpu.roll(ly[:, :], W - 4, 1)
        lu[:, :] = pltpu.roll(lu[:, :], Wc - 2, 1)
        lv[:, :] = pltpu.roll(lv[:, :], Wc - 2, 1)

    # emit [carry ; top 12 rows], then push the bottom rows into the carry
    by = ly[0:16, 0:W]
    yo_ref[:, :] = jnp.concatenate([ly[16:20, 0:W], by[0:12]], axis=0)
    ly[16:20, 0:W] = by[12:16]
    bu = lu[0:8, 0:Wc]
    uo_ref[:, :] = jnp.concatenate([lu[8:10, 0:Wc], bu[0:6]], axis=0)
    lu[8:10, 0:Wc] = bu[6:8]
    bv = lv[0:8, 0:Wc]
    vo_ref[:, :] = jnp.concatenate([lv[8:10, 0:Wc], bv[0:6]], axis=0)
    lv[8:10, 0:Wc] = bv[6:8]


def _pad128(n):
    return (n + 127) // 128 * 128


@partial(jax.jit, static_argnames=("interpret",))
def deblock_apply(y, u, v, mapsV, mapsH, mapsVc, mapsHc,
                  interpret: bool = False):
    """Apply the loop filter. y (H, W), u/v (H/2, W/2) int32; maps from
    ops.deblock.build_maps. Returns filtered (y, u, v)."""
    H, W = y.shape
    mbh, mbw = H // 16, W // 16
    Wc = W // 2

    pads = lambda a, n: jnp.pad(a, ((0, n), (0, 0)))
    y_p = pads(y.astype(jnp.int32), 16)
    u_p = pads(u.astype(jnp.int32), 8)
    v_p = pads(v.astype(jnp.int32), 8)
    mV_p = pads(mapsV, 16)
    mVc_p = pads(mapsVc, 8)
    # H-edge maps: 4 (2 chroma) rows per MB row -> pad each slab to 8 rows
    # (Mosaic requires block sublane dims divisible by 8)
    mH_p = jnp.pad(pads(mapsH, 4).reshape(mbh + 1, 4, W),
                   ((0, 0), (0, 4), (0, 0))).reshape(-1, W)
    mHc_p = jnp.pad(pads(mapsHc, 2).reshape(mbh + 1, 2, Wc),
                    ((0, 0), (0, 6), (0, 0))).reshape(-1, Wc)

    bwy = _pad128(W + 4)
    bwc = _pad128(Wc + 2)
    grid = (mbh + 1,)
    yo, uo, vo = pl.pallas_call(
        partial(_deblock_kernel, mbw=mbw, mbh=mbh, W=W, Wc=Wc),
        out_shape=[
            jax.ShapeDtypeStruct(((mbh + 1) * 16, W), jnp.int32),
            jax.ShapeDtypeStruct(((mbh + 1) * 8, Wc), jnp.int32),
            jax.ShapeDtypeStruct(((mbh + 1) * 8, Wc), jnp.int32),
        ],
        grid=grid,
        in_specs=[
            pl.BlockSpec((16, W), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Wc), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Wc), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 4 * mbw), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, W), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 2 * mbw), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Wc), lambda r: (r, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, W), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Wc), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Wc), lambda r: (r, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((24, bwy), jnp.int32),
            pltpu.VMEM((16, bwc), jnp.int32),
            pltpu.VMEM((16, bwc), jnp.int32),
            pltpu.VMEM((16, _pad128(4 * mbw)), jnp.int32),
            pltpu.VMEM((8, _pad128(W)), jnp.int32),
            pltpu.VMEM((8, _pad128(2 * mbw)), jnp.int32),
            pltpu.VMEM((8, _pad128(Wc)), jnp.int32),
        ],
        interpret=interpret,
    )(y_p, u_p, v_p, mV_p, mH_p, mVc_p, mHc_p)
    return yo[4:4 + H], uo[2:2 + H // 2], vo[2:2 + H // 2]
