"""Full-frame TPU decode: batched reconstruction from parsed syntax.

This is the decode hot path of BASELINE config 4 (reference decode loop:
/root/reference/codec.c:2154-2296, which delegates the per-MB work to
FFmpeg).  The serial entropy stage runs on host in native C
(tools/decparse/cavlc_parse.c via decode/native_parse.py) and emits
resolved syntax tensors — per-MB kinds/modes/cbp/qp, per-block zigzag
levels, and the per-4x4 motion field with mv prediction already applied.
This module turns one frame's syntax into reconstructed planes in ONE
device dispatch:

  1. residual: dequant + inverse transform of every coded block, batched
     over all MBs (I16 DC hadamard / chroma DC / AC 4x4 in one pass each);
  2. inter prediction: gather-based quarter-pel luma MC over precomputed
     half-pel planes + eighth-pel bilinear chroma MC, per 4x4 block, from
     the multi-reference DPB (planes are cached per reference frame);
  3. intra reconstruction: a sequential pass over the frame's intra MBs
     (raster order = decode order) — I16x16 (4 modes) and the in-MB
     16-block I4x4 chain share one fori_loop over a bordered canvas;
  4. in-loop deblocking with edge maps built from the same syntax
     (ops/deblock.build_maps — the encoder's filter, §8.7-exact).

Everything is bit-exact vs decode/decoder.py (the host golden, itself
pinned to stock FFmpeg), tested in tests/test_device_decode.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import transform as tj
from ..ops.deblock import build_maps, deblock_apply_wavefront
from ..encode.device import _halfpel_planes, _qpel_operands, BLK_X, BLK_Y
from ..encode.intra4x4 import _IDX, _DIR_MODES, _TRCODE

PAD = 24     # luma reference padding (replication exact for any |mv|: far
             # coords clamp into the constant replicated band, see _mc_luma)
PADC = 16    # chroma reference padding

# quarter-frac (fy*4+fx) -> two (plane, ox, oy) MC operands
_QP1 = np.zeros((16, 3), np.int32)
_QP2 = np.zeros((16, 3), np.int32)
for _fy in range(4):
    for _fx in range(4):
        _o1, _o2 = _qpel_operands(_fx, _fy)
        _QP1[_fy * 4 + _fx] = _o1
        _QP2[_fy * 4 + _fx] = _o2

# decode-order block index -> raster position tables
_BX4 = np.asarray(BLK_X, np.int32) * 4
_BY4 = np.asarray(BLK_Y, np.int32) * 4
# raster 4x4 position -> decode-order index
_DEC_IDX = np.zeros(16, np.int32)
_DEC_IDX[np.asarray(BLK_Y) * 4 + np.asarray(BLK_X)] = np.arange(16)
# intra mode id -> row of the directional index table (_IDX); DC gated apart
_MODE2DIR = np.zeros(9, np.int32)
for _d, _m in enumerate(_DIR_MODES):
    _MODE2DIR[_m] = _d


@jax.jit
def prep_ref_planes(y, u, v):
    """Padded MC planes of one reference frame.

    Returns (luma (4, Hp, Wp) int16: integer/b/h/j quarter-pel operand
    planes, u_pad, v_pad int16).  Valid luma gather coords: [3, dim-4]
    (halfpel edges hold roll garbage); chroma: [0, dim-2].
    """
    yp = jnp.pad(y.astype(jnp.int32), PAD, mode="edge")
    b, h, j = _halfpel_planes(yp)
    luma = jnp.stack([yp.astype(jnp.int16), b, h, j])
    up = jnp.pad(u.astype(jnp.int16), PADC, mode="edge")
    vp = jnp.pad(v.astype(jnp.int16), PADC, mode="edge")
    return luma, up, vp


# ---------------------------------------------------------------- residual
def _luma_residual(mb_kind, qp_map, dc16, ac15, lvl16):
    """(n, 16, 4, 4) spatial luma residual per decode-order block."""
    n = mb_kind.shape[0]
    qp_blk = jnp.repeat(qp_map, 16)
    # inter / I4x4: 16-coeff blocks
    d4 = tj.dequant4x4(tj.zigzag_unscan(lvl16.reshape(n * 16, 16)), qp_blk)
    res4 = tj.idct4x4_core(d4).reshape(n, 16, 4, 4)
    # I16x16: DC hadamard + 15-coeff AC
    dc_vals = tj.luma_dc_dequant(tj.zigzag_unscan(dc16), qp_map)  # (n,4,4)
    ac16 = jnp.concatenate(
        [jnp.zeros((n, 16, 1), jnp.int32), ac15], axis=-1)
    d16 = tj.dequant4x4(tj.zigzag_unscan(ac16.reshape(n * 16, 16)),
                        qp_blk).reshape(n, 16, 4, 4)
    dc_per_blk = dc_vals[:, _BY4 // 4, _BX4 // 4]       # (n, 16) decode order
    d16 = d16.at[:, :, 0, 0].set(dc_per_blk)
    res16 = tj.idct4x4_core(d16.reshape(n * 16, 4, 4)).reshape(n, 16, 4, 4)
    return jnp.where((mb_kind == 5)[:, None, None, None], res16, res4)


def _chroma_residual(qpc_map, cdc, cac):
    """(n, 2, 4, 4, 4) spatial chroma residual per plane / raster sub-blk."""
    n = qpc_map.shape[0]
    qpc2 = jnp.repeat(qpc_map, 2)
    dc_vals = tj.chroma_dc_dequant(
        cdc.reshape(n * 2, 2, 2), qpc2).reshape(n, 2, 2, 2)
    ac = jnp.concatenate(
        [jnp.zeros((n, 2, 4, 1), jnp.int32), cac], axis=-1)
    d = tj.dequant4x4(tj.zigzag_unscan(ac.reshape(n * 8, 16)),
                      jnp.repeat(qpc_map, 8)).reshape(n, 2, 4, 4, 4)
    sb = jnp.arange(4)
    d = d.at[:, :, sb, 0, 0].set(dc_vals[:, :, sb >> 1, sb & 1])
    res = tj.idct4x4_core(d.reshape(n * 8, 4, 4)).reshape(n, 2, 4, 4, 4)
    return res


def _blocks_to_plane(res, mbh, mbw):
    """(n, 16, 4, 4) decode-order blocks -> (16mbh, 16mbw) plane."""
    raster = jnp.take(res, jnp.asarray(_DEC_IDX), axis=1)
    t = raster.reshape(mbh, mbw, 4, 4, 4, 4)  # (MY, MX, by, bx, py, px)
    return t.transpose(0, 2, 4, 1, 3, 5).reshape(16 * mbh, 16 * mbw)


def _cblocks_to_plane(res_c, mbh, mbw):
    """(n, 4, 4, 4) raster sub-blocks -> (8mbh, 8mbw) plane."""
    t = res_c.reshape(mbh, mbw, 2, 2, 4, 4)
    return t.transpose(0, 2, 4, 1, 3, 5).reshape(8 * mbh, 8 * mbw)


# ------------------------------------------------------------------- inter
def _mc_luma(luma_planes, mv_grid, ref_grid, mbh, mbw):
    """Quarter-pel luma prediction plane via 2-sample gathers.

    luma_planes (R, 4, Hp, Wp) int16; mv_grid (4mbh, 4mbw, 2) quarter-pel;
    ref_grid (4mbh, 4mbw) int32 (intra = -1, values unused there).
    """
    R = luma_planes.shape[0]
    Hp, Wp = luma_planes.shape[2], luma_planes.shape[3]
    gh, gw = 16 * mbh, 16 * mbw
    mvp = jnp.repeat(jnp.repeat(mv_grid.astype(jnp.int32), 4, 0), 4, 1)
    # int32 up-cast before the plane-index arithmetic: the parser hands
    # ref4 over as int8 and `refp * Hp` must not wrap (ref_idx >= 2 did)
    refp = jnp.maximum(
        jnp.repeat(jnp.repeat(ref_grid.astype(jnp.int32), 4, 0), 4, 1), 0)
    mvi = mvp >> 2
    fid = (mvp[..., 1] & 3) * 4 + (mvp[..., 0] & 3)
    yy = jnp.arange(gh)[:, None] + mvi[..., 1] + PAD
    xx = jnp.arange(gw)[None, :] + mvi[..., 0] + PAD
    flat = luma_planes.reshape(R * 4 * Hp * Wp)

    def sample(optab):
        op = jnp.take(jnp.asarray(optab), fid, axis=0)    # (gh, gw, 3)
        cy = jnp.clip(yy + op[..., 2], 3, Hp - 4)
        cx = jnp.clip(xx + op[..., 1], 3, Wp - 4)
        idx = ((refp * 4 + op[..., 0]) * Hp + cy) * Wp + cx
        return jnp.take(flat, idx).astype(jnp.int32)

    a = sample(_QP1)
    b = sample(_QP2)
    return (a + b + 1) >> 1


def _mc_chroma(ref_c, mv_grid, ref_grid, mbh, mbw):
    """Eighth-pel bilinear chroma prediction plane (§8.4.2.2.2).

    ref_c (R, Hcp, Wcp) int16; motion per luma 4x4 block = chroma 2x2.
    """
    R, Hcp, Wcp = ref_c.shape
    ch, cw = 8 * mbh, 8 * mbw
    mvp = jnp.repeat(jnp.repeat(mv_grid.astype(jnp.int32), 2, 0), 2, 1)
    # int32 up-cast: ref4 arrives int8 and `refp * Hcp` wraps at ref_idx 2
    # (the cause of the round-3 bit-exactness failures on multi-ref x264
    # streams — small chroma errors confined to ref>=2 blocks)
    refp = jnp.maximum(
        jnp.repeat(jnp.repeat(ref_grid.astype(jnp.int32), 2, 0), 2, 1), 0)
    dx = mvp[..., 0] & 7
    dy = mvp[..., 1] & 7
    cy = jnp.clip(jnp.arange(ch)[:, None] + (mvp[..., 1] >> 3) + PADC,
                  0, Hcp - 2)
    cx = jnp.clip(jnp.arange(cw)[None, :] + (mvp[..., 0] >> 3) + PADC,
                  0, Wcp - 2)
    flat = ref_c.reshape(R * Hcp * Wcp)
    base = (refp * Hcp + cy) * Wcp + cx
    A = jnp.take(flat, base).astype(jnp.int32)
    B = jnp.take(flat, base + 1).astype(jnp.int32)
    C = jnp.take(flat, base + Wcp).astype(jnp.int32)
    D = jnp.take(flat, base + Wcp + 1).astype(jnp.int32)
    return ((8 - dx) * (8 - dy) * A + dx * (8 - dy) * B
            + (8 - dx) * dy * C + dx * dy * D + 32) >> 6


def _mc_luma_shift(luma_planes, mv_grid, ref_grid, mbh, mbw, K: int):
    """Masked static-shift luma MC (the encoder's alignment formulation).

    Per-sample gathers cost ~1 s/frame at 1080p (the round-4 decode
    bottleneck); here every candidate offset is a static slice of 4-row
    reference bands accumulated under per-column masks — one band pass
    per shift instead of one gather per sample.  Requires every integer
    mv component in [-K, K] (the caller buckets K from the parsed motion
    field and falls back to the gather path beyond it).
    """
    R = luma_planes.shape[0]
    Hp, Wp = luma_planes.shape[2], luma_planes.shape[3]
    gh, gw = 16 * mbh, 16 * mbw
    nb = 4 * mbh                     # 4-row bands (one 4x4 block row each)
    mvp = mv_grid.astype(jnp.int32)
    refb = jnp.maximum(ref_grid.astype(jnp.int32), 0)
    mvi = mvp >> 2
    fid = (mvp[..., 1] & 3) * 4 + (mvp[..., 0] & 3)
    op1 = jnp.take(jnp.asarray(_QP1), fid, axis=0)       # (nb, 4mbw, 3)
    op2 = jnp.take(jnp.asarray(_QP2), fid, axis=0)
    Mg = K + 1                       # operand x/y offsets reach -1

    def off(op):
        p = op[..., 0]
        ox = jnp.clip(mvi[..., 0] + op[..., 1], -Mg, K)
        oy = jnp.clip(mvi[..., 1] + op[..., 2], -Mg, K)
        return p, ox, oy

    p1, x1, y1 = off(op1)
    p2, x2, y2 = off(op2)

    # per-pixel-column maps (4-px block granularity along x)
    def cmap(a):
        return jnp.repeat(a, 4, axis=1)[:, None, :]      # (nb, 1, gw)

    p1c, x1c, y1c = cmap(p1), cmap(x1), cmap(y1)
    p2c, x2c, y2c = cmap(p2), cmap(x2), cmap(y2)
    rc = cmap(refb)

    bh = 4 + 2 * Mg
    # (R, 4, nb, bh, gw + 2Mg) reference bands, built as bh STRIDED row
    # slices (band b row i = plane row 4b - Mg + i): a per-band stack
    # would unroll nb dynamic slices and blow up compile time at 1080p
    r0 = PAD - Mg
    c0 = PAD - Mg
    gwb = gw + 2 * Mg
    bands = jnp.stack([
        luma_planes[:, :, r0 + i: r0 + i + 4 * nb: 4, c0: c0 + gwb]
        for i in range(bh)], axis=3)     # (R, 4, nb, bh, gwb)

    shifts = jnp.arange(2 * Mg, dtype=jnp.int32) - Mg    # [-Mg, K]

    def h_step(carry, s):
        a1, a2 = carry
        for r in range(R):
            for p in range(4):
                sl = jax.lax.dynamic_slice(
                    bands[r, p], (0, 0, Mg + s), (nb, bh, gw))
                a1 = a1 + jnp.where((x1c == s) & (p1c == p) & (rc == r),
                                    sl, 0)
                a2 = a2 + jnp.where((x2c == s) & (p2c == p) & (rc == r),
                                    sl, 0)
        return (a1, a2), None

    z = jnp.zeros((nb, bh, gw), jnp.int16)
    (A1, A2), _ = jax.lax.scan(h_step, (z, z), shifts)

    def v_step(carry, s):
        b1, b2 = carry
        s1 = jax.lax.dynamic_slice(A1, (0, Mg + s, 0), (nb, 4, gw))
        s2 = jax.lax.dynamic_slice(A2, (0, Mg + s, 0), (nb, 4, gw))
        return (b1 + jnp.where(y1c == s, s1, 0),
                b2 + jnp.where(y2c == s, s2, 0)), None

    z4 = jnp.zeros((nb, 4, gw), jnp.int16)
    (B1, B2), _ = jax.lax.scan(v_step, (z4, z4), shifts)
    pred = (B1.astype(jnp.int32) + B2.astype(jnp.int32) + 1) >> 1
    return pred.reshape(gh, gw)


def _mc_chroma_shift(ref_c, mv_grid, ref_grid, mbh, mbw, K: int):
    """Masked static-shift chroma MC (eighth-pel bilinear, §8.4.2.2.2) —
    the decode twin of the encoder's banded chroma alignment."""
    R, Hcp, Wcp = ref_c.shape
    ch, cw = 8 * mbh, 8 * mbw
    nb = 4 * mbh                     # 2-row chroma bands per 4x4 block row
    mvp = mv_grid.astype(jnp.int32)
    refb = jnp.maximum(ref_grid.astype(jnp.int32), 0)
    ci = mvp >> 3
    f = mvp & 7
    clo = -(K // 2) - 2
    chi = K // 2 + 1
    nc = chi - clo + 1

    def cmap(a):
        return jnp.repeat(a, 2, axis=1)[:, None, :]      # (nb, 1, cw)

    cxc = cmap(jnp.clip(ci[..., 0], clo, chi))
    cyc = cmap(jnp.clip(ci[..., 1], clo, chi))
    fxc = cmap(f[..., 0])
    fyc = cmap(f[..., 1])
    rc = cmap(refb)

    bhc = 2 + nc + 1
    rc0 = PADC + clo
    cc0 = PADC + clo
    cwb = cw + nc + 1
    bands = jnp.stack([
        ref_c[:, rc0 + i: rc0 + i + 2 * nb: 2, cc0: cc0 + cwb]
        for i in range(bhc)], axis=2)    # (R, nb, bhc, cwb)

    cshifts = jnp.arange(nc, dtype=jnp.int32) + clo

    def ch_step(carry, s):
        A, B = carry
        for r in range(R):
            sl0 = jax.lax.dynamic_slice(bands[r], (0, 0, s - clo),
                                        (nb, bhc, cw))
            sl1 = jax.lax.dynamic_slice(bands[r], (0, 0, s - clo + 1),
                                        (nb, bhc, cw))
            m = (cxc == s) & (rc == r)
            A = A + jnp.where(m, sl0, 0)
            B = B + jnp.where(m, sl1, 0)
        return (A, B), None

    zc = jnp.zeros((nb, bhc, cw), jnp.int16)
    (A, B), _ = jax.lax.scan(ch_step, (zc, zc), cshifts)

    def cv_step(acc, s):
        a0 = jax.lax.dynamic_slice(A, (0, s - clo, 0), (nb, 2, cw)) \
            .astype(jnp.int32)
        b0 = jax.lax.dynamic_slice(B, (0, s - clo, 0), (nb, 2, cw)) \
            .astype(jnp.int32)
        a1 = jax.lax.dynamic_slice(A, (0, s - clo + 1, 0), (nb, 2, cw)) \
            .astype(jnp.int32)
        b1 = jax.lax.dynamic_slice(B, (0, s - clo + 1, 0), (nb, 2, cw)) \
            .astype(jnp.int32)
        bil = ((8 - fxc) * (8 - fyc) * a0 + fxc * (8 - fyc) * b0
               + (8 - fxc) * fyc * a1 + fxc * fyc * b1 + 32) >> 6
        return acc + jnp.where(cyc == s, bil, 0), None

    zp = jnp.zeros((nb, 2, cw), jnp.int32)
    pred, _ = jax.lax.scan(cv_step, zp, cshifts)
    return pred.reshape(ch, cw)


# ------------------------------------------------------------------- intra
def _i16_pred(top, left, tl, mode, availT, availL):
    """(16,16) Intra_16x16 prediction; top/left (16,), tl scalar int32."""
    V = jnp.broadcast_to(top[None, :], (16, 16))
    H = jnp.broadcast_to(left[:, None], (16, 16))
    sT, sL = top.sum(), left.sum()
    dc = jnp.where(availT & availL, (sT + sL + 16) >> 5,
                   jnp.where(availT, (sT + 8) >> 4,
                             jnp.where(availL, (sL + 8) >> 4, 128)))
    DC = jnp.broadcast_to(dc, (16, 16))
    xs = jnp.arange(8)
    t_ext = jnp.concatenate([tl[None], top])              # p[x,-1], x=-1..15
    l_ext = jnp.concatenate([tl[None], left])
    Hc = ((xs + 1) * (t_ext[9 + xs] - t_ext[7 - xs])).sum()
    Vc = ((xs + 1) * (l_ext[9 + xs] - l_ext[7 - xs])).sum()
    a = 16 * (left[15] + top[15])
    b = (5 * Hc + 32) >> 6
    c = (5 * Vc + 32) >> 6
    yy, xx = jnp.mgrid[0:16, 0:16]
    P = jnp.clip((a + b * (xx - 7) + c * (yy - 7) + 16) >> 5, 0, 255)
    return jnp.where(mode == 0, V,
                     jnp.where(mode == 1, H,
                               jnp.where(mode == 2, DC, P)))


def _chroma8_pred(top, left, tl, mode, availT, availL):
    """(8,8) intra chroma prediction; modes 0=DC 1=H 2=V 3=Plane (§8.3.4)."""
    H = jnp.broadcast_to(left[:, None], (8, 8))
    V = jnp.broadcast_to(top[None, :], (8, 8))
    # per-4x4-quadrant DC
    tq = top.reshape(2, 4).sum(1)                         # (2,) qx
    lq = left.reshape(2, 4).sum(1)                        # (2,) qy
    both = availT & availL

    def corner(qy, qx):
        return jnp.where(both, (tq[qx] + lq[qy] + 4) >> 3,
                         jnp.where(availT, (tq[qx] + 2) >> 2,
                                   jnp.where(availL, (lq[qy] + 2) >> 2, 128)))

    dc00 = corner(0, 0)
    dc11 = corner(1, 1)
    dc01 = jnp.where(availT, (tq[1] + 2) >> 2,            # top-right quad
                     jnp.where(availL, (lq[0] + 2) >> 2, 128))
    dc10 = jnp.where(availL, (lq[1] + 2) >> 2,            # bottom-left quad
                     jnp.where(availT, (tq[0] + 2) >> 2, 128))
    DC = jnp.block([[jnp.full((4, 4), dc00), jnp.full((4, 4), dc01)],
                    [jnp.full((4, 4), dc10), jnp.full((4, 4), dc11)]])
    xs = jnp.arange(4)
    t_ext = jnp.concatenate([tl[None], top])
    l_ext = jnp.concatenate([tl[None], left])
    Hc = ((xs + 1) * (t_ext[5 + xs] - t_ext[3 - xs])).sum()
    Vc = ((xs + 1) * (l_ext[5 + xs] - l_ext[3 - xs])).sum()
    a = 16 * (left[7] + top[7])
    b = (17 * Hc + 16) >> 5
    c = (17 * Vc + 16) >> 5
    yy, xx = jnp.mgrid[0:8, 0:8]
    P = jnp.clip((a + b * (xx - 3) + c * (yy - 3) + 16) >> 5, 0, 255)
    return jnp.where(mode == 0, DC,
                     jnp.where(mode == 1, H,
                               jnp.where(mode == 2, V, P)))


def _i4_chain(L, res_mb, modes16, availT, availL, availTR):
    """Run the 16-block I4x4 decode chain on a (17, 25) bordered canvas.

    L row 0 = row above the MB (cols: x0-1 .. x0+23), col 0 = left column;
    interior filled in decode order.  Returns the updated canvas.
    """
    bx4 = jnp.asarray(_BX4)
    by4 = jnp.asarray(_BY4)
    trc = jnp.asarray(_TRCODE)
    idx_tab = jnp.asarray(_IDX)
    m2d = jnp.asarray(_MODE2DIR)

    def blk(i, L):
        x, y = bx4[i], by4[i]
        ctx = jax.lax.dynamic_slice(L, (y, x), (5, 9))
        tl = ctx[0, 0]
        trow = ctx[0, 1:9]                                # t0..t7
        lcol = ctx[1:5, 0]
        tr_ok = jnp.where(trc[i] == 0, availT,
                          jnp.where(trc[i] == 1, availTR, trc[i] == 2))
        t47 = jnp.where(tr_ok, trow[4:8], trow[3])
        w = jnp.concatenate([tl[None], trow[:4], t47, lcol])       # (13,)
        mode = modes16[i]
        tab = jnp.take(idx_tab, m2d[mode], axis=0)        # (16, 3)
        ws = jnp.take(w, tab)                             # (16, 3)
        pdir = (ws[:, 0] + 2 * ws[:, 1] + ws[:, 2] + 2) >> 2
        aT = availT | (y > 0)
        aL = availL | (x > 0)
        sT, sL = trow[:4].sum(), lcol.sum()
        dc = jnp.where(aT & aL, (sT + sL + 4) >> 3,
                       jnp.where(aT, (sT + 2) >> 2,
                                 jnp.where(aL, (sL + 2) >> 2, 128)))
        pred = jnp.where(mode == 2, dc, pdir).reshape(4, 4)
        res = jax.lax.dynamic_slice(res_mb, (y, x), (4, 4))
        rec = jnp.clip(pred + res, 0, 255)
        return jax.lax.dynamic_update_slice(L, rec, (y + 1, x + 1))

    return jax.lax.fori_loop(0, 16, blk, L)


# -------------------------------------------------------------- frame core
@partial(jax.jit, static_argnames=("mbh", "mbw", "cqpo", "offA", "offB",
                                   "deblock", "ib", "mck"))
def decode_frame_core(mb_kind, qp_map, i16mode, cmode, i4modes,
                      dc16, ac15, lvl16, cdc, cac, mv4, ref4,
                      intra_idx, luma_planes, refs_u, refs_v,
                      mbh: int, mbw: int, cqpo: int, offA: int, offB: int,
                      deblock: bool, ib: int, mck: int = 0):
    """One frame's reconstruction from parsed syntax.  Returns (y, u, v)
    int32 planes at padded (16mbh, 16mbw) dims.

    intra_idx: (ib,) int32 raster MB indices of intra MBs, -1 padded.
    """
    n = mbh * mbw
    gh, gw = 16 * mbh, 16 * mbw
    ch, cw = 8 * mbh, 8 * mbw
    qpc_map = tj.chroma_qp(qp_map, cqpo)

    # ---- stage A: residual planes ----
    res_y = _blocks_to_plane(
        _luma_residual(mb_kind, qp_map, dc16, ac15, lvl16), mbh, mbw)
    res_c = _chroma_residual(qpc_map, cdc, cac)           # (n,2,4,4,4)
    res_u = _cblocks_to_plane(res_c[:, 0], mbh, mbw)
    res_v = _cblocks_to_plane(res_c[:, 1], mbh, mbw)

    # ---- stage B: inter prediction + recon ----
    mv_grid = mv4.reshape(mbh, mbw, 4, 4, 2).transpose(0, 2, 1, 3, 4) \
        .reshape(4 * mbh, 4 * mbw, 2)
    ref_grid = ref4.reshape(mbh, mbw, 4, 4).transpose(0, 2, 1, 3) \
        .reshape(4 * mbh, 4 * mbw)
    if mck:
        # masked static-shift MC (mck = the motion bucket the caller
        # proved from the parsed mv field); gathers only as fallback
        pred_y = _mc_luma_shift(luma_planes, mv_grid, ref_grid, mbh, mbw,
                                mck)
        pred_u = _mc_chroma_shift(refs_u, mv_grid, ref_grid, mbh, mbw, mck)
        pred_v = _mc_chroma_shift(refs_v, mv_grid, ref_grid, mbh, mbw, mck)
    else:
        pred_y = _mc_luma(luma_planes, mv_grid, ref_grid, mbh, mbw)
        pred_u = _mc_chroma(refs_u, mv_grid, ref_grid, mbh, mbw)
        pred_v = _mc_chroma(refs_v, mv_grid, ref_grid, mbh, mbw)
    y = jnp.clip(pred_y + res_y, 0, 255)
    u = jnp.clip(pred_u + res_u, 0, 255)
    v = jnp.clip(pred_v + res_v, 0, 255)

    # ---- stage C: intra MBs (sequential, decode order) ----
    if ib:
        # bordered canvases: +1 top/left, +8 right (luma I4 top-right reads)
        yc = jnp.zeros((1 + gh, 1 + gw + 8), jnp.int32)
        yc = jax.lax.dynamic_update_slice(yc, y, (1, 1))
        uc = jnp.zeros((1 + ch, 1 + cw), jnp.int32)
        uc = jax.lax.dynamic_update_slice(uc, u, (1, 1))
        vc = jnp.zeros((1 + ch, 1 + cw), jnp.int32)
        vc = jax.lax.dynamic_update_slice(vc, v, (1, 1))

        def mb_step(s, carry):
            yc, uc, vc = carry
            k = intra_idx[s]
            valid = k >= 0
            k = jnp.maximum(k, 0)
            my, mx = k // mbw, k % mbw
            availT = my > 0
            availL = mx > 0
            availTL = availT & availL
            availTR = availT & (mx < mbw - 1)
            y0, x0 = 16 * my, 16 * mx
            # --- luma ---
            Lctx = jax.lax.dynamic_slice(yc, (y0, x0), (17, 25))
            L0 = Lctx.at[1:, 1:].set(0)
            res_mb = jax.lax.dynamic_slice(res_y, (y0, x0), (16, 16))
            rec_i4 = _i4_chain(L0, res_mb, i4modes[k], availT, availL,
                               availTR)[1:17, 1:17]
            top16 = jnp.where(availT, Lctx[0, 1:17], 0)
            left16 = jnp.where(availL, Lctx[1:17, 0], 0)
            tl = jnp.where(availTL, Lctx[0, 0], 0)
            rec_i16 = jnp.clip(
                _i16_pred(top16, left16, tl, i16mode[k], availT, availL)
                + res_mb, 0, 255)
            rec = jnp.where(mb_kind[k] == 5, rec_i16, rec_i4)
            old = Lctx[1:17, 1:17]
            yc = jax.lax.dynamic_update_slice(
                yc, jnp.where(valid, rec, old), (y0 + 1, x0 + 1))
            # --- chroma ---
            cy0, cx0 = 8 * my, 8 * mx
            cm = cmode[k]
            for pl, resp, canv in ((0, res_u, uc), (1, res_v, vc)):
                Cctx = jax.lax.dynamic_slice(canv, (cy0, cx0), (9, 9))
                topc = jnp.where(availT, Cctx[0, 1:9], 0)
                leftc = jnp.where(availL, Cctx[1:9, 0], 0)
                tlc = jnp.where(availTL, Cctx[0, 0], 0)
                cres = jax.lax.dynamic_slice(resp, (cy0, cx0), (8, 8))
                crec = jnp.clip(
                    _chroma8_pred(topc, leftc, tlc, cm, availT, availL)
                    + cres, 0, 255)
                upd = jnp.where(valid, crec, Cctx[1:9, 1:9])
                canv = jax.lax.dynamic_update_slice(
                    canv, upd, (cy0 + 1, cx0 + 1))
                if pl == 0:
                    uc = canv
                else:
                    vc = canv
            return yc, uc, vc

        yc, uc, vc = jax.lax.fori_loop(0, ib, mb_step, (yc, uc, vc))
        y = yc[1:1 + gh, 1:1 + gw]
        u = uc[1:, 1:]
        v = vc[1:, 1:]

    # ---- stage D: deblock ----
    if deblock:
        intra_mb = (mb_kind >= 5).reshape(mbh, mbw)
        # per-4x4 total_coeff: AC levels for I16, 16-coeff levels otherwise
        # (intra edges take bS 3/4 regardless; inter blocks use lvl16)
        tc_blk = jnp.where((mb_kind == 5)[:, None],
                           (ac15 != 0).sum(-1),
                           (lvl16 != 0).sum(-1))          # (n, 16) dec order
        tc4 = jnp.take(tc_blk, jnp.asarray(_DEC_IDX), axis=1) \
            .reshape(mbh, mbw, 4, 4).transpose(0, 2, 1, 3) \
            .reshape(4 * mbh, 4 * mbw)
        maps = build_maps(intra_mb, tc4, mv_grid, ref_grid,
                          qp_map.reshape(mbh, mbw), offA, offB, cqpo)
        y, u, v = deblock_apply_wavefront(y, u, v, *maps)

    return y, u, v


# --------------------------------------------------------------- host glue
_IB_BUCKETS = (32, 128, 512, 2048)


def _bucket(count, n):
    for b in _IB_BUCKETS:
        if count <= b <= n:
            return b
    return n




def _narrow(a):
    """int8 view of a syntax tensor when its range allows: the syntax
    upload is the decode path's host->device traffic (13 MB/frame at
    1080p as int16 — the bottleneck on low-bandwidth links); levels fit
    int8 at normal QPs.  Dtype participates in the trace signature, so
    the device programs specialize automatically."""
    a = np.asarray(a)
    if a.dtype == np.int16 and a.size and abs(int(a.max(initial=0))) < 128 \
            and abs(int(a.min(initial=0))) < 128:
        return a.astype(np.int8)
    return a

def _mc_bucket(mv4s, nref: int) -> int:
    """Static K for the masked-shift MC (0 = gather fallback): smallest
    bucket covering every integer mv component; multi-ref beyond 2 stays
    on the gather path (the shift passes scale with R)."""
    if nref > 2:
        return 0
    m = 0
    for a in mv4s:
        if a.size:
            m = max(m, int(np.abs(a).max()) >> 2)
    for K in (8, 16):
        if m <= K:
            return K
    return 0


def try_decode_slice(top, rbsp, bitpos, sps, pps, h, nal_type):
    """Device fast path for one slice.  Returns a Frame or None (caller
    falls back to the host decoder).  `top` is the H264Decoder; the DPB
    reference planes are cached on the Frame objects.

    Decode-session role of the reference: codec.c:2223-2238 (send/receive
    via FFmpeg); here the host parses entropy in C and the device does the
    reconstruction math.
    """
    p = parse_slice_syntax(top, rbsp, bitpos, sps, pps, h, nal_type,
                           len(top.dpb))
    if p is None:
        return None
    syn = p["syn"]
    mbh, mbw = sps.mb_height, sps.mb_width
    refs = list(top.dpb[:p["nref"]]) if h.is_p() else []

    # reference plane stacks (cached per reference frame)
    if refs:
        devs = []
        for f in refs:
            if getattr(f, "_dev_ref", None) is None:
                f._dev_ref = prep_ref_planes(
                    jnp.asarray(f.y), jnp.asarray(f.u), jnp.asarray(f.v))
            devs.append(f._dev_ref)
        luma_planes = jnp.stack([d[0] for d in devs])
        refs_u = jnp.stack([d[1] for d in devs])
        refs_v = jnp.stack([d[2] for d in devs])
    else:
        luma_planes = jnp.zeros(
            (1, 4, 16 * mbh + 2 * PAD, 16 * mbw + 2 * PAD), jnp.int16)
        refs_u = jnp.zeros(
            (1, 8 * mbh + 2 * PADC, 8 * mbw + 2 * PADC), jnp.int16)
        refs_v = refs_u

    n = mbh * mbw
    kinds = syn["mb_kind"]
    intra_list = np.flatnonzero(kinds >= 5).astype(np.int32)
    ib = _bucket(intra_list.size, n) if intra_list.size else 0
    idx = np.full(max(ib, 1), -1, np.int32)
    idx[:intra_list.size] = intra_list

    mck = _mc_bucket([syn["mv4"]], p["nref"]) if refs else 0
    y, u, v = decode_frame_core(
        jnp.asarray(kinds), jnp.asarray(syn["qp_map"]),
        jnp.asarray(syn["i16mode"]), jnp.asarray(syn["cmode"]),
        jnp.asarray(syn["i4modes"]),
        jnp.asarray(_narrow(syn["dc16"])), jnp.asarray(_narrow(syn["ac15"])),
        jnp.asarray(_narrow(syn["lvl16"])),
        jnp.asarray(_narrow(syn["cdc"]).reshape(n, 2, 2, 2)),
        jnp.asarray(_narrow(syn["cac"])), jnp.asarray(syn["mv4"]),
        jnp.asarray(syn["ref4"]), jnp.asarray(idx[:max(ib, 1)]),
        luma_planes, refs_u, refs_v,
        mbh=mbh, mbw=mbw, cqpo=pps.chroma_qp_index_offset,
        offA=p["offA"], offB=p["offB"], deblock=p["deblock"], ib=ib,
        mck=mck)

    fr = _syntax_frame(syn, mbh, mbw, h, nal_type, refs)
    fr.y = np.asarray(y)
    fr.u = np.asarray(u)
    fr.v = np.asarray(v)
    return fr


# ------------------------------------------------------------ GOP batching
def _frame_core_from_planes(mb_kind, qp_map, i16mode, cmode, i4modes,
                            dc16, ac15, lvl16, cdc, cac, mv4, ref4,
                            intra_idx, luma_planes, refs_u, refs_v,
                            mbh, mbw, cqpo, offA, offB, deblock, ib,
                            mck=0):
    """Un-jitted body of decode_frame_core (shared by the GOP scan)."""
    return decode_frame_core.__wrapped__(
        mb_kind, qp_map, i16mode, cmode, i4modes, dc16, ac15, lvl16,
        cdc, cac, mv4, ref4, intra_idx, luma_planes, refs_u, refs_v,
        mbh=mbh, mbw=mbw, cqpo=cqpo, offA=offA, offB=offB,
        deblock=deblock, ib=ib, mck=mck)


@partial(jax.jit, static_argnames=("mbh", "mbw", "cqpo", "offA", "offB",
                                   "deblock", "ib", "nref", "mck"))
def decode_gop_core(mb_kind, qp_map, i16mode, cmode, i4modes, dc16, ac15,
                    lvl16, cdc, cac, mv4, ref4, intra_idx, is_idr,
                    dpb_luma, dpb_u, dpb_v,
                    mbh: int, mbw: int, cqpo: int, offA: int, offB: int,
                    deblock: bool, ib: int, nref: int, mck: int = 0):
    """Decode G consecutive frames in ONE dispatch (the decode analogue of
    the encoder's GOP scan): a lax.scan carries a rolling DPB of PREPARED
    MC planes; each step reconstructs one frame, preps its planes on
    device, and pushes it to the front of the DPB.

    Syntax tensors carry a leading G axis.  is_idr (G,) int32 resets the
    DPB slot usage (the scan simply rolls; intra frames never read refs).
    Returns (G, 16mbh, 16mbw) y and the chroma pair.
    """
    def step(carry, xs):
        dl, du, dv = carry
        (kind, qp, i16m, cm, i4m, d16, a15, l16, cd, ca, mv, rf, ii) = xs
        y, u, v = _frame_core_from_planes(
            kind, qp, i16m, cm, i4m, d16, a15, l16, cd, ca, mv, rf, ii,
            dl, du, dv, mbh, mbw, cqpo, offA, offB, deblock, ib, mck=mck)
        nl, nu, nv = prep_ref_planes.__wrapped__(y, u, v)
        dl = jnp.concatenate([nl[None], dl[:-1]])
        du = jnp.concatenate([nu[None], du[:-1]])
        dv = jnp.concatenate([nv[None], dv[:-1]])
        return (dl, du, dv), (y.astype(jnp.uint8), u.astype(jnp.uint8),
                              v.astype(jnp.uint8))

    xs = (mb_kind, qp_map, i16mode, cmode, i4modes, dc16, ac15, lvl16,
          cdc, cac, mv4, ref4, intra_idx)
    (_, _, _), (ys, us, vs) = jax.lax.scan(
        step, (dpb_luma, dpb_u, dpb_v), xs)
    return ys, us, vs


def parse_slice_syntax(top, rbsp, bitpos, sps, pps, h, nal_type,
                       dpb_depth: int):
    """Phase 1 of the device fast path: eligibility checks + native C
    entropy parse.  Returns a dict (syntax + metadata) or None."""
    from . import native_parse

    if pps.entropy_coding_mode_flag or not (h.is_p() or h.is_i()):
        return None
    if h.first_mb_in_slice != 0 or pps.constrained_intra_pred_flag:
        return None
    if (pps.weighted_pred_flag and h.is_p()
            and any(w is not None for w in h.luma_weights_l0)):
        return None
    if h.ref_pic_list_mod_l0 or h.mmco_ops:
        return None
    if not native_parse.available():
        return None
    mbh, mbw = sps.mb_height, sps.mb_width
    nref = (h.num_ref_idx_l0_active_minus1 + 1) if h.is_p() else 1
    if h.is_p() and dpb_depth < nref:
        return None
    qp_init = pps.pic_init_qp_minus26 + 26 + h.slice_qp_delta
    syn = native_parse.parse_slice(
        np.asarray(rbsp, np.uint8), bitpos, 0 if h.is_p() else 2,
        mbh, mbw, qp_init, nref, bool(pps.transform_8x8_mode_flag))
    if syn is None:
        return None
    return {"syn": syn, "h": h, "nal_type": nal_type, "nref": nref,
            "deblock": h.disable_deblocking_filter_idc != 1,
            "offA": h.slice_alpha_c0_offset_div2 * 2,
            "offB": h.slice_beta_offset_div2 * 2}


def _syntax_frame(syn, mbh, mbw, h, nal_type, refs):
    """Host-side Frame assembly from parsed syntax + decoded planes go in
    later; shared by the single and batched paths."""
    from .decoder import Frame
    n = mbh * mbw
    mv_grid = syn["mv4"].reshape(mbh, mbw, 4, 4, 2).transpose(
        0, 2, 1, 3, 4).reshape(4 * mbh, 4 * mbw, 2)
    ref_grid = syn["ref4"].reshape(mbh, mbw, 4, 4).transpose(
        0, 2, 1, 3).reshape(4 * mbh, 4 * mbw)
    mb_types = np.empty(n, np.int32)
    k = syn["mb_kind"]
    mb_types[k == 0] = 1000
    for kk, mt in ((1, 100), (2, 101), (3, 102), (4, 103)):
        mb_types[k == kk] = mt
    i16sel = k == 5
    mb_types[i16sel] = (1 + syn["i16mode"][i16sel]
                        + 4 * syn["cbp_chroma"][i16sel]
                        + 12 * (syn["cbp_luma"][i16sel] != 0))
    mb_types[k == 6] = 0
    refid0 = np.full(ref_grid.shape, -1, np.int64)
    if refs:
        ids = np.array([id(f) % (1 << 62) for f in refs], np.int64)
        sel = ref_grid >= 0
        refid0[sel] = ids[np.clip(ref_grid[sel], 0, len(refs) - 1)]
    fr = Frame(None, None, None,
               frame_num=h.frame_num, is_idr=nal_type == 5,
               mb_types=mb_types.reshape(mbh, mbw),
               qps=syn["qp_map"].reshape(mbh, mbw).copy(),
               mvs=mv_grid.copy(), refs=ref_grid.copy(), refid0=refid0)
    fr.syntax = None
    return fr


def decode_gop_device(top, parsed: list, sps, pps):
    """Decode a run of eligible pictures in one device dispatch.

    parsed: list of parse_slice_syntax dicts (decode order; the first
    frame may be an IDR).  Uses top.dpb for the initial references.
    Returns a list of Frames (planes filled)."""
    mbh, mbw = sps.mb_height, sps.mb_width
    G = len(parsed)
    n = mbh * mbw
    nref = max(max(p["nref"] for p in parsed), 1)
    dpb0 = list(top.dpb[:nref])

    def stack(key, dtype):
        arr = np.stack([np.asarray(p["syn"][key], dtype) for p in parsed])
        if dtype == np.int16 and key != "mv4":
            arr = _narrow(arr)
        return jnp.asarray(arr)

    kinds = np.stack([p["syn"]["mb_kind"] for p in parsed])
    counts = [int((p["syn"]["mb_kind"] >= 5).sum()) for p in parsed]
    ib = _bucket(max(counts), n) if max(counts) else 0
    idx = np.full((G, max(ib, 1)), -1, np.int32)
    for g, p in enumerate(parsed):
        il = np.flatnonzero(p["syn"]["mb_kind"] >= 5).astype(np.int32)
        idx[g, :il.size] = il
    is_idr = np.array([p["nal_type"] == 5 for p in parsed], np.int32)

    # initial prepared-plane DPB (replicate when shallow; intra-only
    # GOPs never read it)
    Hp, Wp = 16 * mbh + 2 * PAD, 16 * mbw + 2 * PAD
    if dpb0:
        devs = []
        for f in dpb0:
            if getattr(f, "_dev_ref", None) is None:
                f._dev_ref = prep_ref_planes(
                    jnp.asarray(f.y), jnp.asarray(f.u), jnp.asarray(f.v))
            devs.append(f._dev_ref)
        while len(devs) < nref:
            devs.append(devs[-1])
        dl = jnp.stack([d[0] for d in devs])
        du = jnp.stack([d[1] for d in devs])
        dv = jnp.stack([d[2] for d in devs])
    else:
        dl = jnp.zeros((nref, 4, Hp, Wp), jnp.int16)
        du = jnp.zeros((nref, 8 * mbh + 2 * PADC, 8 * mbw + 2 * PADC),
                       jnp.int16)
        dv = du

    p0 = parsed[0]
    mck = _mc_bucket([p["syn"]["mv4"] for p in parsed], nref)
    ys, us, vs = decode_gop_core(
        jnp.asarray(kinds), stack("qp_map", np.int32),
        stack("i16mode", np.int32), stack("cmode", np.int32),
        stack("i4modes", np.int8), stack("dc16", np.int16),
        stack("ac15", np.int16), stack("lvl16", np.int16),
        jnp.asarray(_narrow(np.stack([p["syn"]["cdc"].reshape(n, 2, 2, 2)
                                      for p in parsed]))),
        stack("cac", np.int16), stack("mv4", np.int16),
        stack("ref4", np.int8), jnp.asarray(idx[:, :max(ib, 1)]),
        jnp.asarray(is_idr), dl, du, dv,
        mbh=mbh, mbw=mbw, cqpo=pps.chroma_qp_index_offset,
        offA=p0["offA"], offB=p0["offB"], deblock=p0["deblock"],
        ib=ib, nref=nref, mck=mck)
    ys = np.asarray(ys)
    us = np.asarray(us)
    vs = np.asarray(vs)

    frames = []
    refs = list(dpb0)
    for g, p in enumerate(parsed):
        if p["nal_type"] == 5:   # IDR: reference set resets
            refs = []
        fr = _syntax_frame(p["syn"], mbh, mbw, p["h"], p["nal_type"], refs)
        fr.y = ys[g].astype(np.int32)
        fr.u = us[g].astype(np.int32)
        fr.v = vs[g].astype(np.int32)
        frames.append(fr)
        refs = ([fr] + refs)[:nref]
    return frames
