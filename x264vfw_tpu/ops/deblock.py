"""Device deblocking support: edge-parameter maps (XLA) + map application.

The H.264 loop filter (§8.7) is sequential over MBs in raster order — but
ONLY through the pixels.  Boundary strength, alpha/beta thresholds and tc0
depend exclusively on coding metadata (mb types, coded 4x4 blocks, mvs,
refs, QPs), so they are precomputed here as whole-frame maps with plain
data-parallel jnp ops.  The pixel filtering itself runs either in the
Pallas kernel (ops/pallas/deblock.py, spec MB order via a rolling VMEM
window) or in the numpy reference `apply_maps_np` (bit-exact bridge between
the maps and the spec-order golden model ops/deblock_np.py).

Map packing (one int32 per edge-line):
    bits 0..2  bs        (0..4)
    bits 3..7  tc0       (0..25; used by the bs<4 path only)
    bits 8..15 alpha     (0..255)
    bits 16..20 beta     (0..18)

Four maps cover the frame:
    mapsV  (H,      4*mbw) — luma vertical edges, per pixel row
    mapsH  (4*mbh,  W)     — luma horizontal edges, per pixel column
    mapsVc (H//2,   2*mbw) — chroma vertical edges (shared by U and V)
    mapsHc (2*mbh,  W//2)  — chroma horizontal edges

Capability replaced: libx264 deblock (--deblock, codec.c:857-859) and the
FFmpeg decoder loop filter — reformulated TPU-first (metadata maps +
sequential pixel kernel) instead of the reference's per-MB scalar loops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .deblock_np import ALPHA_TABLE, BETA_TABLE, TC0_TABLE, \
    filter_chroma_lines, filter_luma_lines
from .transform_np import chroma_qp

# full luma-QP -> chroma-QP lookup (offset already applied by the caller)
_CQP_FULL = np.array([int(chroma_qp(q, 0)) for q in range(52)], np.int32)


def _pack(bs, tc0, alpha, beta):
    return (bs | (tc0 << 3) | (alpha << 8) | (beta << 16)).astype(jnp.int32)


def _lut(table, idx):
    """table[idx] without a gather: TPU lowers runtime-index gathers
    to a serial loop; an unrolled compare-select chain over the (<=52
    entry) table fuses into one vector pass."""
    tb = np.asarray(table)
    out = jnp.full(idx.shape, int(tb[0]), jnp.int32)
    for k in range(1, tb.shape[0]):
        out = jnp.where(idx == k, int(tb[k]), out)
    return out


def _qp_avg_params(qp_p, qp_q, offA, offB, alpha_t, beta_t):
    qpav = (qp_p + qp_q + 1) >> 1
    ia = jnp.clip(qpav + offA, 0, 51)
    ib = jnp.clip(qpav + offB, 0, 51)
    return _lut(alpha_t, ia), _lut(beta_t, ib), ia


def build_maps(intra_mb, tc4, mv4, ref4, qp_map, offA: int, offB: int,
               chroma_qp_offset: int, t8_4=None):
    """Edge-parameter maps for one frame.

    intra_mb (mbh, mbw) bool; tc4 (4mbh, 4mbw) int32 total_coeff per 4x4;
    mv4 (4mbh, 4mbw, 2) int32 quarter-pel; ref4 (4mbh, 4mbw) int32;
    qp_map (mbh, mbw) int32.  offA/offB = 2 * slice offsets.
    Returns (mapsV, mapsH, mapsVc, mapsHc) int32.
    """
    mbh, mbw = intra_mb.shape
    # numpy tables on purpose: they embed as HLO literals via the
    # _lut select chains (no gathers, no captured device constants)
    alpha_t = np.asarray(ALPHA_TABLE)
    beta_t = np.asarray(BETA_TABLE)
    tc0_t = np.asarray(TC0_TABLE)
    cqp_t = np.asarray(_CQP_FULL)
    intra4 = jnp.repeat(jnp.repeat(intra_mb, 4, 0), 4, 1)   # (4mbh, 4mbw)

    def bs_between(p_intra, q_intra, tc_p, tc_q, mv_p, mv_q,
                   ref_p, ref_q, mb_edge):
        intra_any = p_intra | q_intra
        mv_big = (jnp.abs(mv_p[..., 0] - mv_q[..., 0]) >= 4) | \
                 (jnp.abs(mv_p[..., 1] - mv_q[..., 1]) >= 4)
        inter_bs = jnp.where((tc_p > 0) | (tc_q > 0), 2,
                             jnp.where((ref_p != ref_q) | mv_big, 1, 0))
        return jnp.where(intra_any, jnp.where(mb_edge, 4, 3), inter_bs)

    # ---- vertical edges: q block at (by, bx), p at (by, bx-1) ----
    bx = jnp.arange(4 * mbw)
    mb_edge_v = (bx % 4 == 0)[None, :]
    q_int = intra4
    p_int = jnp.concatenate([intra4[:, :1], intra4[:, :-1]], axis=1)
    tc_q = tc4
    tc_p = jnp.concatenate([tc4[:, :1], tc4[:, :-1]], axis=1)
    mv_q_ = mv4
    mv_p = jnp.concatenate([mv4[:, :1], mv4[:, :-1]], axis=1)
    ref_q = ref4
    ref_p = jnp.concatenate([ref4[:, :1], ref4[:, :-1]], axis=1)
    bsv = bs_between(p_int, q_int, tc_p, tc_q, mv_p, mv_q_,
                     ref_p, ref_q, mb_edge_v)           # (4mbh, 4mbw)
    bsv = bsv.at[:, 0].set(0)                           # frame left edge
    if t8_4 is not None:
        # 8x8-transformed MBs: luma internal edges 4 and 12 are not
        # filtered (§8.7); both sides of such an edge are the same MB
        int_v = ((bx % 4 == 1) | (bx % 4 == 3))[None, :]
        bsv = jnp.where(int_v & t8_4, 0, bsv)

    qp_q_mb = qp_map                                     # (mbh, mbw)
    qp_p_mb = jnp.concatenate([qp_map[:, :1], qp_map[:, :-1]], axis=1)
    # per (mb row, edge col): edge col 4x+e has qp_p = left MB only for e==0
    qq = jnp.repeat(qp_q_mb, 4, 1)                       # (mbh, 4mbw)
    qp_prev = jnp.repeat(qp_p_mb, 4, 1)
    is_e0 = (jnp.arange(4 * mbw) % 4 == 0)[None, :]
    qp_pv = jnp.where(is_e0, qp_prev, qq)
    alpha_v, beta_v, ia_v = _qp_avg_params(qp_pv, qq, offA, offB,
                                           alpha_t, beta_t)  # (mbh, 4mbw)
    alpha_v = jnp.repeat(alpha_v, 4, 0)                  # (4mbh, 4mbw)
    beta_v = jnp.repeat(beta_v, 4, 0)
    tcs_v = [jnp.repeat(_lut(tc0_t[k], ia_v), 4, 0) for k in range(3)]
    tc0_v = jnp.where(bsv > 0,
                      jnp.where(bsv == 1, tcs_v[0],
                                jnp.where(bsv == 2, tcs_v[1], tcs_v[2])),
                      0)
    # per-4x4-block values -> per pixel row (each block row spans 4 rows)
    mapsV = jnp.repeat(_pack(bsv, tc0_v, alpha_v, beta_v), 4, 0)  # (H, 4mbw)

    # ---- horizontal edges: q block at (by, bx), p at (by-1, bx) ----
    by = jnp.arange(4 * mbh)
    mb_edge_h = (by % 4 == 0)[:, None]
    p_int_h = jnp.concatenate([intra4[:1, :], intra4[:-1, :]], axis=0)
    tc_p_h = jnp.concatenate([tc4[:1, :], tc4[:-1, :]], axis=0)
    mv_p_h = jnp.concatenate([mv4[:1, :], mv4[:-1, :]], axis=0)
    ref_p_h = jnp.concatenate([ref4[:1, :], ref4[:-1, :]], axis=0)
    bsh = bs_between(p_int_h, intra4, tc_p_h, tc4, mv_p_h, mv4,
                     ref_p_h, ref4, mb_edge_h)
    bsh = bsh.at[0, :].set(0)                            # frame top edge
    if t8_4 is not None:
        by_ = jnp.arange(4 * intra_mb.shape[0])
        int_h = ((by_ % 4 == 1) | (by_ % 4 == 3))[:, None]
        bsh = jnp.where(int_h & t8_4, 0, bsh)
    qp_p_mb_h = jnp.concatenate([qp_map[:1, :], qp_map[:-1, :]], axis=0)
    qq_h = jnp.repeat(qp_map, 4, 0)                      # (4mbh, mbw)
    qp_prev_h = jnp.repeat(qp_p_mb_h, 4, 0)
    is_f0 = (jnp.arange(4 * mbh) % 4 == 0)[:, None]
    qp_ph = jnp.where(is_f0, qp_prev_h, qq_h)
    alpha_h, beta_h, ia_h = _qp_avg_params(qp_ph, qq_h, offA, offB,
                                           alpha_t, beta_t)  # (4mbh, mbw)
    alpha_h = jnp.repeat(alpha_h, 4, 1)                  # (4mbh, 4mbw)
    beta_h = jnp.repeat(beta_h, 4, 1)
    tcs_h = [jnp.repeat(_lut(tc0_t[k], ia_h), 4, 1) for k in range(3)]
    tc0_h = jnp.where(bsh > 0,
                      jnp.where(bsh == 1, tcs_h[0],
                                jnp.where(bsh == 2, tcs_h[1], tcs_h[2])),
                      0)
    mapsH = jnp.repeat(_pack(bsh, tc0_h, alpha_h, beta_h), 4, 1)  # (4mbh, W)

    # ---- chroma: bs reuses luma block bs at the corresponding positions;
    # thresholds use the averaged chroma QP pair ----
    qpc_map = _lut(cqp_t, jnp.clip(qp_map + chroma_qp_offset, 0, 51))
    qpc_p_v = jnp.concatenate([qpc_map[:, :1], qpc_map[:, :-1]], axis=1)
    qpc_p_h = jnp.concatenate([qpc_map[:1, :], qpc_map[:-1, :]], axis=0)

    # vertical chroma edges: per MB, edges e in {0,1} at luma edge 2e
    # chroma edge col index g = 2*mbx + e; line c (8 per MB row) maps to
    # luma block line c//2
    bsv_mb = bsv.reshape(4 * mbh, mbw, 4)                # by, mbx, e
    bsv_c = bsv_mb[:, :, ::2]                            # (4mbh, mbw, 2)
    bsv_c = bsv_c.reshape(4 * mbh, 2 * mbw)
    # chroma rows: 8 per MB row; luma block row by covers chroma rows
    # 2*by..2*by+1
    bsv_c = jnp.repeat(bsv_c, 2, 0)                      # (8mbh, 2mbw)
    e_is0 = (jnp.arange(2 * mbw) % 2 == 0)[None, :]
    qpc_q_v = jnp.repeat(qpc_map, 2, 1)                  # (mbh, 2mbw)
    qpc_pv = jnp.where(e_is0, jnp.repeat(qpc_p_v, 2, 1), qpc_q_v)
    qpcav_v = (qpc_pv + qpc_q_v + 1) >> 1
    ia_cv = jnp.clip(qpcav_v + offA, 0, 51)
    ib_cv = jnp.clip(qpcav_v + offB, 0, 51)
    al_cv = jnp.repeat(_lut(alpha_t, ia_cv), 8, 0)       # (8mbh, 2mbw)
    be_cv = jnp.repeat(_lut(beta_t, ib_cv), 8, 0)
    tcs_cv = [jnp.repeat(_lut(tc0_t[k], ia_cv), 8, 0) for k in range(3)]
    tc0_cv = jnp.where(bsv_c > 0,
                       jnp.where(bsv_c == 1, tcs_cv[0],
                                 jnp.where(bsv_c == 2, tcs_cv[1],
                                           tcs_cv[2])),
                       0)
    mapsVc = _pack(bsv_c, tc0_cv, al_cv, be_cv)          # (H/2, 2mbw)

    # horizontal chroma edges: per MB, edges f in {0,1} at luma edge 2f;
    # chroma col xc maps to luma block col xc//2... per-column bs comes from
    # luma block column bx = (2*xc)//4 = xc//2
    bsh_mb = bsh.reshape(mbh, 4, 4 * mbw)                # mby, f, bx
    bsh_c = bsh_mb[:, ::2, :]                            # (mbh, 2, 4mbw)
    bsh_c = bsh_c.reshape(2 * mbh, 4 * mbw)
    # chroma col c maps to luma block col c//2 -> repeat 2 along cols
    bsh_c = jnp.repeat(bsh_c, 2, 1)                      # (2mbh, Wc=8mbw)
    f_is0 = (jnp.arange(2 * mbh) % 2 == 0)[:, None]
    qpc_q_h = jnp.repeat(qpc_map, 2, 0)                  # (2mbh, mbw)
    qpc_ph = jnp.where(f_is0, jnp.repeat(qpc_p_h, 2, 0), qpc_q_h)
    qpcav_h = (qpc_ph + qpc_q_h + 1) >> 1
    ia_ch = jnp.clip(qpcav_h + offA, 0, 51)
    ib_ch = jnp.clip(qpcav_h + offB, 0, 51)
    al_ch = jnp.repeat(_lut(alpha_t, ia_ch), 8, 1)       # (2mbh, Wc)
    be_ch = jnp.repeat(_lut(beta_t, ib_ch), 8, 1)
    tcs_ch = [jnp.repeat(_lut(tc0_t[k], ia_ch), 8, 1) for k in range(3)]
    tc0_ch = jnp.where(bsh_c > 0,
                       jnp.where(bsh_c == 1, tcs_ch[0],
                                 jnp.where(bsh_c == 2, tcs_ch[1],
                                           tcs_ch[2])),
                       0)
    mapsHc = _pack(bsh_c, tc0_ch, al_ch, be_ch)          # (2mbh, Wc)

    return mapsV, mapsH, mapsVc, mapsHc


def unpack_np(m):
    m = np.asarray(m)
    return m & 7, (m >> 3) & 31, (m >> 8) & 255, (m >> 16) & 31


def apply_maps_np(y, u, v, mapsV, mapsH, mapsVc, mapsHc):
    """Numpy reference: apply the maps in exact spec MB order.

    Mutates y/u/v in place (int32 arrays, MB-multiple dims)."""
    H, W = y.shape
    mbh, mbw = H // 16, W // 16
    bsV, tcV, alV, beV = unpack_np(mapsV)
    bsH, tcH, alH, beH = unpack_np(mapsH)
    bsVc, tcVc, alVc, beVc = unpack_np(mapsVc)
    bsHc, tcHc, alHc, beHc = unpack_np(mapsHc)
    for my in range(mbh):
        for mx in range(mbw):
            y0, x0 = my * 16, mx * 16
            # vertical luma
            for e in range(4):
                g = mx * 4 + e
                x = x0 + 4 * e
                rows = slice(y0, y0 + 16)
                P = y[rows, x - 4:x] if x >= 4 else np.zeros((16, 4), np.int32)
                Q = y[rows, x:x + 4]
                Pn, Qn = filter_luma_lines(
                    P, Q, bsV[y0:y0 + 16, g], alV[y0:y0 + 16, g],
                    beV[y0:y0 + 16, g], tcV[y0:y0 + 16, g])
                if x >= 4:
                    y[rows, x - 4:x] = Pn
                y[rows, x:x + 4] = Qn
            # vertical chroma
            for e in range(2):
                g = mx * 2 + e
                xc = mx * 8 + 4 * e
                rc = slice(my * 8, my * 8 + 8)
                for pl in (u, v):
                    P = pl[rc, xc - 2:xc] if xc >= 2 else np.zeros((8, 2), np.int32)
                    Q = pl[rc, xc:xc + 2]
                    Pn, Qn = filter_chroma_lines(
                        P, Q, bsVc[my * 8:my * 8 + 8, g],
                        alVc[my * 8:my * 8 + 8, g],
                        beVc[my * 8:my * 8 + 8, g],
                        tcVc[my * 8:my * 8 + 8, g])
                    if xc >= 2:
                        pl[rc, xc - 2:xc] = Pn
                    pl[rc, xc:xc + 2] = Qn
            # horizontal luma
            for f in range(4):
                yy = y0 + 4 * f
                gf = my * 4 + f
                cols = slice(x0, x0 + 16)
                P = y[yy - 4:yy, cols].T if yy >= 4 else np.zeros((16, 4), np.int32)
                Q = y[yy:yy + 4, cols].T
                Pn, Qn = filter_luma_lines(
                    P, Q, bsH[gf, x0:x0 + 16], alH[gf, x0:x0 + 16],
                    beH[gf, x0:x0 + 16], tcH[gf, x0:x0 + 16])
                if yy >= 4:
                    y[yy - 4:yy, cols] = Pn.T
                y[yy:yy + 4, cols] = Qn.T
            # horizontal chroma
            for f in range(2):
                yc = my * 8 + 4 * f
                gf = my * 2 + f
                colsc = slice(mx * 8, mx * 8 + 8)
                for pl in (u, v):
                    P = pl[yc - 2:yc, colsc].T if yc >= 2 else np.zeros((8, 2), np.int32)
                    Q = pl[yc:yc + 2, colsc].T
                    Pn, Qn = filter_chroma_lines(
                        P, Q, bsHc[gf, mx * 8:mx * 8 + 8],
                        alHc[gf, mx * 8:mx * 8 + 8],
                        beHc[gf, mx * 8:mx * 8 + 8],
                        tcHc[gf, mx * 8:mx * 8 + 8])
                    if yc >= 2:
                        pl[yc - 2:yc, colsc] = Pn.T
                    pl[yc:yc + 2, colsc] = Qn.T


# ---------------------------------------------------------------------------
# Wavefront map application (XLA): the spec's raster-order pixel dependency
# is MB (r, c) <- {(r, c-1), (r-1, c), and (r, c)'s V-writes feeding
# (r+1, c-1)'s top edge}, which a slope-2 anti-diagonal wavefront
# (d = 2r + c) satisfies with one lax.scan step per diagonal.  Per slot
# (= MB row) the carry holds just TWO tiles: `cur` (the previous MB of the
# row, pending our V0 p-side writes) and `prev` (two MBs back, pending the
# below-row's H0 p-side writes this step).  A tile is final two steps after
# its own processing and is emitted then — slope-2 skew/unskew transforms
# (ops/skew.py) move tiles between raster and wavefront layouts with pure
# reshapes.  This replaces the sequential rolling-window Pallas kernel
# (55 ms/frame at 1080p — 8160 serial MB steps) with ~2*mbh + mbw fully
# vectorized scan steps.
# ---------------------------------------------------------------------------

def _tiles(p, th, tw):
    """(R*th, C*tw) -> (R, C, th, tw)."""
    R, C = p.shape[0] // th, p.shape[1] // tw
    return p.reshape(R, th, C, tw).transpose(0, 2, 1, 3)


def _untiles(t, th, tw):
    R, C = t.shape[:2]
    return t.transpose(0, 2, 1, 3).reshape(R * th, C * tw)


def deblock_apply_wavefront(y, u, v, mapsV, mapsH, mapsVc, mapsHc):
    """Apply the loop filter (same contract as pallas.deblock.deblock_apply).

    y (H, W), u/v (H/2, W/2) int32; maps from build_maps.
    Returns filtered (y, u, v)."""
    import jax
    from ..ops.skew import skew, unskew
    from ..ops.pallas.deblock import _luma_filter, _chroma_filter

    H, W = y.shape
    mbh, mbw = H // 16, W // 16
    steps = 2 * mbh + mbw

    def prep(p, th, tw, pad_cols):
        t = _tiles(p.astype(jnp.int32), th, tw)
        t = jnp.pad(t, ((0, 0), (0, pad_cols), (0, 0), (0, 0)))
        return skew(t, steps, 2)

    # virtual columns c in {mbw, mbw+1} carry zero maps (bs = 0 ->
    # identity) so the retire pipeline can drain without special cases
    sy = prep(y, 16, 16, 2)
    su = prep(u, 8, 8, 2)
    sv = prep(v, 8, 8, 2)
    smV = prep(mapsV, 16, 4, 2)
    smH = prep(mapsH, 4, 16, 2)
    smVc = prep(mapsVc, 8, 2, 2)
    smHc = prep(mapsHc, 2, 8, 2)

    def shift_down(a):      # slot s -> value from slot s-1
        return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]])

    def luma_v_edge(P, Q, m):
        """P (mbh,16,4) p3..p0, Q (mbh,16,4) q0..q3, m (mbh,16) ->
        (new_p (mbh,16,3) p2' p1' p0', new_q (mbh,16,3) q0' q1' q2')."""
        outs = _luma_filter(P[..., 0], P[..., 1], P[..., 2], P[..., 3],
                            Q[..., 0], Q[..., 1], Q[..., 2], Q[..., 3], m)
        return (jnp.stack(outs[0:3], axis=-1), jnp.stack(outs[3:6], axis=-1))

    def luma_h_edge(P, Q, m):
        """P (mbh,4,16) rows p3..p0, Q (mbh,4,16) rows q0..q3, m (mbh,16)."""
        outs = _luma_filter(P[:, 0], P[:, 1], P[:, 2], P[:, 3],
                            Q[:, 0], Q[:, 1], Q[:, 2], Q[:, 3], m)
        return (jnp.stack(outs[0:3], axis=1), jnp.stack(outs[3:6], axis=1))

    def step(carry, xs):
        (cy, py, cu, pu, cv, pv) = carry
        (ty, tu, tv_, mV, mH, mVc, mHc) = xs

        # ---------------- luma vertical edges ----------------
        np_, nq = luma_v_edge(cy[:, :, 12:16], ty[:, :, 0:4], mV[:, :, 0])
        cy = jnp.concatenate([cy[:, :, :13], np_], axis=-1)
        ty = jnp.concatenate([nq, ty[:, :, 3:]], axis=-1)
        for e in (1, 2, 3):
            np_, nq = luma_v_edge(ty[:, :, 4 * e - 4:4 * e],
                                  ty[:, :, 4 * e:4 * e + 4], mV[:, :, e])
            ty = jnp.concatenate([ty[:, :, :4 * e - 3], np_, nq,
                                  ty[:, :, 4 * e + 3:]], axis=-1)

        # ---------------- chroma vertical edges ----------------
        def chroma_v(cc, tc, m):
            p0n, q0n = _chroma_filter(cc[:, :, 6], cc[:, :, 7],
                                      tc[:, :, 0], tc[:, :, 1], m[:, :, 0])
            cc = jnp.concatenate([cc[:, :, :7], p0n[..., None]], axis=-1)
            tc = jnp.concatenate([q0n[..., None], tc[:, :, 1:]], axis=-1)
            p0n, q0n = _chroma_filter(tc[:, :, 2], tc[:, :, 3],
                                      tc[:, :, 4], tc[:, :, 5], m[:, :, 1])
            tc = jnp.concatenate([tc[:, :, :3], p0n[..., None],
                                  q0n[..., None], tc[:, :, 5:]], axis=-1)
            return cc, tc

        cu, tu = chroma_v(cu, tu, mVc)
        cv, tv_ = chroma_v(cv, tv_, mVc)

        # ---------------- luma horizontal edges ----------------
        above = shift_down(py)                         # (s-1)'s prev tile
        np_, nq = luma_h_edge(above[:, 12:16, :], ty[:, 0:4, :], mH[:, 0])
        ty = jnp.concatenate([nq, ty[:, 3:, :]], axis=1)
        # write the p-side back to the row above: slot s computed rows
        # 13..15 of prev[s-1]; bottom row keeps its own (no row below)
        py = jnp.concatenate(
            [py[:, :13, :],
             jnp.concatenate([np_[1:], py[mbh - 1:, 13:16, :]], axis=0)],
            axis=1)
        for f in (1, 2, 3):
            np_, nq = luma_h_edge(ty[:, 4 * f - 4:4 * f, :],
                                  ty[:, 4 * f:4 * f + 4, :], mH[:, f])
            ty = jnp.concatenate([ty[:, :4 * f - 3, :], np_, nq,
                                  ty[:, 4 * f + 3:, :]], axis=1)

        # ---------------- chroma horizontal edges ----------------
        def chroma_h(pc, tc, m):
            abv = shift_down(pc)
            p0n, q0n = _chroma_filter(abv[:, 6, :], abv[:, 7, :],
                                      tc[:, 0, :], tc[:, 1, :], m[:, 0])
            tc = jnp.concatenate([q0n[:, None, :], tc[:, 1:, :]], axis=1)
            p0_up = jnp.concatenate([p0n[1:], pc[mbh - 1:, 7, :]], axis=0)
            pc = jnp.concatenate([pc[:, :7, :], p0_up[:, None, :]], axis=1)
            p0n, q0n = _chroma_filter(tc[:, 2, :], tc[:, 3, :],
                                      tc[:, 4, :], tc[:, 5, :], m[:, 1])
            tc = jnp.concatenate([tc[:, :3, :], p0n[:, None, :],
                                  q0n[:, None, :], tc[:, 5:, :]], axis=1)
            return pc, tc

        pu, tu = chroma_h(pu, tu, mHc)
        pv, tv_ = chroma_h(pv, tv_, mHc)

        out = (py, pu, pv)                             # final tiles
        return (ty, cy, tu, cu, tv_, cv), out

    z16 = jnp.zeros((mbh, 16, 16), jnp.int32)
    z8 = jnp.zeros((mbh, 8, 8), jnp.int32)
    init = (z16, z16, z8, z8, z8, z8)
    _, (oy, ou, ov) = jax.lax.scan(
        step, init, (sy, su, sv, smV, smH, smVc, smHc))

    ry = _untiles(unskew(oy, mbw, 2, 2), 16, 16)
    ru = _untiles(unskew(ou, mbw, 2, 2), 8, 8)
    rv = _untiles(unskew(ov, mbw, 2, 2), 8, 8)
    return ry, ru, rv
