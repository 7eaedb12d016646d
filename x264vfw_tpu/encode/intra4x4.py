"""Device Intra_4x4 encode: all 9 prediction modes with exact recon feedback.

The reference exposes I4x4 through libx264's analysis surface
(/root/reference/codec.c:887 `--partitions i4x4`); every natural x264 I
frame mixes I16x16 and I_NxN macroblocks.  This module supplies the
per-MB-batch I4x4 encode used inside the slope-2 intra wavefront
(encode/intra_wavefront.py).

TPU formulation
---------------
Every 4x4 prediction sample is expressible as (w[i1] + 2*w[i2] + w[i3] + 2)
>> 2 over a 13-sample neighbour vector w = [tl, t0..t7, l0..l3]:

  * 3-tap filters use (i1, i2, i3) directly,
  * 2-tap (a+b+1)>>1 becomes (a, b, a),
  * plain copies become (a, a, a),

so all 8 directional modes are ONE static-index take + one VPU expression
over the whole MB batch; only DC needs its own (availability-dependent)
formula.  The index tables are generated from the §8.3.1.2.1-9 formulas at
import time and validated against ops/intra_np.py golden predictions.

The 16 blocks of an MB chain through their spec decode-order dependencies
(top-right recon feeds DDL/VL), processed as an unrolled loop batched over
the wavefront's MB slots.  Availability of the top-right block follows the
spec decode order: raster positions (1,1),(3,1),(1,3),(3,2),(3,3) never
see a decoded above-right block and use the p[3,-1] substitution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import transform as tj

BIG = 1 << 29

# decode order of 4x4 luma blocks (same tables as encode/device.py)
BLK_X = np.asarray([0, 1, 0, 1, 2, 3, 2, 3, 0, 1, 0, 1, 2, 3, 2, 3])
BLK_Y = np.asarray([0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3])

# raster (by, bx) -> decode index
DEC_IDX = np.zeros((4, 4), np.int32)
DEC_IDX[BLK_Y, BLK_X] = np.arange(16)

# raster (by, bx) whose above-right block is not yet decoded in spec
# decode order (=> top-right samples substituted by p[3,-1]): decode
# indices 3, 7, 11, 13, 15
_TR_DEAD = {(1, 1), (3, 1), (1, 3), (2, 3), (3, 3)}

_HAD4 = np.array([[1, 1, 1, 1],
                  [1, 1, -1, -1],
                  [1, -1, -1, 1],
                  [1, -1, 1, -1]], np.int32)


def _sample_ids(m: int, x: int, y: int):
    """(i1, i2, i3) into w = [tl, t0..t7, l0..l3] for mode m pixel (x, y),
    straight from the §8.3.1.2 formulas (2-tap as (a, b, a), copy as
    (a, a, a))."""
    def T(i):
        return 0 if i == -1 else 1 + i

    def L(j):
        return 0 if j == -1 else 9 + j

    if m == 0:                                    # Vertical
        return (T(x), T(x), T(x))
    if m == 1:                                    # Horizontal
        return (L(y), L(y), L(y))
    if m == 3:                                    # Diagonal Down-Left
        if x == 3 and y == 3:
            return (T(6), T(7), T(7))
        return (T(x + y), T(x + y + 1), T(x + y + 2))
    if m == 4:                                    # Diagonal Down-Right
        if x > y:
            return (T(x - y - 2), T(x - y - 1), T(x - y))
        if x < y:
            return (L(y - x - 2), L(y - x - 1), L(y - x))
        return (T(0), 0, L(0))
    if m == 5:                                    # Vertical-Right
        z = 2 * x - y
        if z >= 0:
            if z % 2 == 0:
                a, b = T(x - (y >> 1) - 1), T(x - (y >> 1))
                return (a, b, a)
            return (T(x - (y >> 1) - 2), T(x - (y >> 1) - 1), T(x - (y >> 1)))
        if z == -1:
            return (L(0), 0, T(0))
        return (L(y - 1), L(y - 2), L(y - 3))
    if m == 6:                                    # Horizontal-Down
        z = 2 * y - x
        if z >= 0:
            if z % 2 == 0:
                a, b = L(y - (x >> 1) - 1), L(y - (x >> 1))
                return (a, b, a)
            return (L(y - (x >> 1) - 2), L(y - (x >> 1) - 1), L(y - (x >> 1)))
        if z == -1:
            return (L(0), 0, T(0))
        return (T(x - 1), T(x - 2), T(x - 3))
    if m == 7:                                    # Vertical-Left
        if y % 2 == 0:
            a, b = T(x + (y >> 1)), T(x + (y >> 1) + 1)
            return (a, b, a)
        return (T(x + (y >> 1)), T(x + (y >> 1) + 1), T(x + (y >> 1) + 2))
    if m == 8:                                    # Horizontal-Up
        z = x + 2 * y
        if z < 5:
            if z % 2 == 0:
                a, b = L(y + (x >> 1)), L(y + (x >> 1) + 1)
                return (a, b, a)
            return (L(y + (x >> 1)), L(y + (x >> 1) + 1), L(y + (x >> 1) + 2))
        if z == 5:
            return (L(2), L(3), L(3))
        return (L(3), L(3), L(3))
    raise ValueError(m)


def _build_tables():
    """(8, 16, 3) index tables for directional modes [0,1,3,4,5,6,7,8]."""
    dirs = [0, 1, 3, 4, 5, 6, 7, 8]
    t = np.zeros((8, 16, 3), np.int32)
    for mi, m in enumerate(dirs):
        for y in range(4):
            for x in range(4):
                t[mi, 4 * y + x] = _sample_ids(m, x, y)
    return dirs, t


_DIR_MODES, _IDX = _build_tables()
# avail requirement per directional mode: 0 = top, 1 = left, 2 = top+left
_DIR_NEED = np.asarray([0, 1, 0, 2, 2, 2, 0, 1], np.int32)


def _satd4(res):
    """(n, 4, 4) -> (n,) SATD."""
    H = jnp.asarray(_HAD4)
    t = jnp.einsum("ij,njk,kl->nil", H, res, H)
    return jnp.abs(t).sum(axis=(1, 2)) >> 1


# per-block tables for the inner scan, in DECODE order:
# trcode: 0 = top-right from the MB row above (avail = availT),
#         1 = from the MB above-right (avail = availTR),
#         2 = decoded in-MB block (always available),
#         3 = never available (spec decode-order dead positions)
_BX = BLK_X.astype(np.int32)
_BY = BLK_Y.astype(np.int32)
_TRCODE = np.asarray(
    [(0 if bx < 3 else 1) if by == 0
     else (3 if (by, bx) in _TR_DEAD else 2)
     for bx, by in zip(_BX, _BY)], np.int32)


def encode_i4x4_batch(src_mb, top_row, tr4_row, left_col, tl_pix,
                      top_modes, left_modes, availT, availL, availTR,
                      qp, lam):
    """Full I4x4 encode of a batch of MBs (the wavefront's slot dimension).

    src_mb (n, 16, 16) int32; top_row (n, 16) recon bottom row of the MB
    above; tr4_row (n, 4) recon bottom-left 4 of the MB above-right;
    left_col (n, 16) recon right column of the MB left; tl_pix (n,) corner;
    top_modes/left_modes (n, 4) neighbour-MB border block modes (2 where
    the neighbour is not I_NxN); availT/availL/availTR (n,) bool; lam
    scalar int32 lambda.

    The 16-block dependency chain runs as an inner lax.scan over a bordered
    context canvas (an unrolled chain makes the enclosing wavefront step's
    XLA graph 16x larger and blows compile time past 10 minutes on CPU):
    canvas P (n, 17, 21) holds [tl | top_row | tr4] in row 0, left_col in
    col 0 and the in-progress recon inside; canvas M (n, 5, 5) holds the
    neighbour/own block modes the §8.3.1.1 predictor needs.

    Returns dict: modes (n, 16) decode order, levels (n, 16, 16) zigzag
    decode order, recon (n, 16, 16), cbp_luma (n,) 4-bit, cost (n,) int32
    satd + lam * mode-bits (excl. mb_type/cbp overhead).
    """
    n = src_mb.shape[0]
    idx = jnp.asarray(_IDX)                        # (8, 16, 3)
    ones = jnp.ones((n,), bool)

    # context canvases
    P = jnp.zeros((n, 17, 21), jnp.int32)
    P = P.at[:, 0, 0].set(tl_pix)
    P = P.at[:, 0, 1:17].set(top_row)
    P = P.at[:, 0, 17:21].set(tr4_row)
    P = P.at[:, 1:17, 0].set(left_col)
    M = jnp.full((n, 5, 5), 2, jnp.int32)
    M = M.at[:, 0, 1:5].set(top_modes)
    M = M.at[:, 1:5, 0].set(left_modes)

    # allow mask per trcode for the top-right source
    a_tr_tab = jnp.stack([availT, availTR, ones, jnp.zeros((n,), bool)], 1)
    # decode-order (16, n, 4, 4): raster-majored blocks indexed by decode
    # position (by*4 + bx per decode slot)
    src_blocks = (src_mb.reshape(n, 4, 4, 4, 4).transpose(1, 3, 0, 2, 4)
                  .reshape(16, n, 4, 4))[jnp.asarray(_BY * 4 + _BX)]

    bx_t = jnp.asarray(_BX)
    by_t = jnp.asarray(_BY)
    trc_t = jnp.asarray(_TRCODE)

    def blk_step(bi, carry):
        # fori_loop, not an inner lax.scan: scan-in-scan makes XLA:CPU
        # recompile the inner loop per outer context (430 s at 128x96);
        # while-in-scan compiles in seconds
        P, M, cost_total, modes_o, prevs_o, rems_o, levels_o = carry
        bx, by, trc = bx_t[bi], by_t[bi], trc_t[bi]
        sblk = jax.lax.dynamic_slice(src_blocks, (bi, 0, 0, 0),
                                     (1, n, 4, 4))[0]
        y0c, x0c = 1 + 4 * by, 1 + 4 * bx

        t4 = jax.lax.dynamic_slice(P, (0, y0c - 1, x0c), (n, 1, 4))[:, 0]
        tr_raw = jax.lax.dynamic_slice(P, (0, y0c - 1, x0c + 4),
                                       (n, 1, 4))[:, 0]
        l4 = jax.lax.dynamic_slice(P, (0, y0c, x0c - 1), (n, 4, 1))[:, :, 0]
        tl = jax.lax.dynamic_slice(P, (0, y0c - 1, x0c - 1),
                                   (n, 1, 1))[:, 0, 0]
        a_tr = a_tr_tab[:, trc]
        t3r = jnp.broadcast_to(t4[:, 3:4], (n, 4))
        tr4 = jnp.where(a_tr[:, None], tr_raw, t3r)
        a_t = jnp.where(by > 0, ones, availT)
        a_l = jnp.where(bx > 0, ones, availL)

        w = jnp.concatenate([tl[:, None], t4, tr4, l4], axis=1)  # (n, 13)

        # ---- 8 directional predictions via the index tables ----
        g = w[:, idx]                              # (n, 8, 16, 3)
        pd = (g[..., 0] + 2 * g[..., 1] + g[..., 2] + 2) >> 2    # (n, 8, 16)
        # DC (§8.3.1.2.3)
        ts = t4.sum(-1)
        ls = l4.sum(-1)
        dc = jnp.where(a_t & a_l, (ts + ls + 4) >> 3,
                       jnp.where(a_t, (ts + 2) >> 2,
                                 jnp.where(a_l, (ls + 2) >> 2, 128)))
        preds = jnp.concatenate([
            pd[:, 0:2],                            # V, H
            jnp.broadcast_to(dc[:, None, None], (n, 1, 16)),
            pd[:, 2:]], axis=1).reshape(n, 9, 4, 4)

        # ---- mode cost: SATD + lambda * signalling bits ----
        satd = jax.vmap(_satd4, in_axes=1, out_axes=1)(
            sblk[:, None] - preds)                 # (n, 9)
        # avail requirement per mode id 0..8: V/DDL/VL need top, H/HU need
        # left, the diagonal-down family needs both, DC is always legal
        tneed = jnp.asarray([1, 0, 0, 1, 1, 1, 1, 1, 0], bool)
        lneed = jnp.asarray([0, 1, 0, 0, 1, 1, 1, 0, 1], bool)
        allow = ((a_t[:, None] | ~tneed[None, :])
                 & (a_l[:, None] | ~lneed[None, :]))

        mA = jax.lax.dynamic_slice(M, (0, 1 + by, bx), (n, 1, 1))[:, 0, 0]
        mB = jax.lax.dynamic_slice(M, (0, by, 1 + bx), (n, 1, 1))[:, 0, 0]
        pmode = jnp.where(a_t & a_l, jnp.minimum(mA, mB), 2)
        mbits = jnp.where(jnp.arange(9)[None, :] == pmode[:, None], 1, 4)
        cost = jnp.where(allow, satd + lam * mbits, BIG)
        mode = jnp.argmin(cost, axis=1).astype(jnp.int32)
        csel = jnp.min(cost, axis=1)
        psel = jnp.take_along_axis(
            preds.reshape(n, 9, 16), mode[:, None, None], axis=1
        ).reshape(n, 4, 4)

        # ---- residual pipeline (16-coeff I4x4 block) ----
        c = tj.fdct4x4((sblk - psel)[:, None])
        q = tj.quant4x4(c, qp, intra=True)         # (n, 1, 4, 4)
        lvl = tj.zigzag_scan(q[:, 0])              # (n, 16)
        r = tj.idct4x4_core(tj.dequant4x4(q, qp))[:, 0]
        rblk = jnp.clip(psel + r, 0, 255)
        P = jax.lax.dynamic_update_slice(P, rblk, (0, y0c, x0c))
        M = jax.lax.dynamic_update_slice(
            M, mode[:, None, None], (0, 1 + by, 1 + bx))

        prev = mode == pmode
        rem = mode - (mode > pmode).astype(jnp.int32)
        modes_o = jax.lax.dynamic_update_slice(modes_o, mode[:, None],
                                               (0, bi))
        prevs_o = jax.lax.dynamic_update_slice(prevs_o, prev[:, None],
                                               (0, bi))
        rems_o = jax.lax.dynamic_update_slice(rems_o, rem[:, None], (0, bi))
        levels_o = jax.lax.dynamic_update_slice(levels_o, lvl[:, None],
                                                (0, bi, 0))
        return (P, M, cost_total + csel, modes_o, prevs_o, rems_o, levels_o)

    init = (P, M, jnp.zeros((n,), jnp.int32),
            jnp.zeros((n, 16), jnp.int32), jnp.zeros((n, 16), bool),
            jnp.zeros((n, 16), jnp.int32), jnp.zeros((n, 16, 16), jnp.int32))
    (P, M, cost_total, modes, prevs, rems, levels) = jax.lax.fori_loop(
        0, 16, blk_step, init)
    nz = (levels != 0).any(-1)                     # (n, 16)
    quad_nz = nz.reshape(n, 4, 4).any(-1)          # (n, 4) per 8x8 quadrant
    cbp = (quad_nz.astype(jnp.int32)
           * jnp.asarray([1, 2, 4, 8], jnp.int32)[None, :]).sum(-1)
    # a quadrant is coded iff ANY of its 4 blocks has coefficients, so an
    # uncoded quadrant's residual is already all-zero -- rec is exact.
    return {"modes": modes, "levels": levels,
            "recon": P[:, 1:17, 1:17],
            "prev": prevs,                         # (n, 16) bool
            "rem": rems,                           # (n, 16) 0..7
            "cbp_luma": cbp.astype(jnp.int32), "cost": cost_total,
            # border block modes for neighbour prediction (right col /
            # bottom row, raster order)
            "right_modes": M[:, 1:5, 4],
            "bot_modes": M[:, 4, 1:5]}
