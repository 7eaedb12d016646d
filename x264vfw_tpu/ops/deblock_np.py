"""In-loop deblocking filter — exact numpy implementation (§8.7).

Golden model / host decode path; the device (JAX) mirror operates on whole
edge-columns at once (see deblock.py).  Capability replaced: libx264's
deblocking (`--deblock/-f`, /root/reference/codec.c:857-859) and the FFmpeg
decoder's loop filter.

Filtering order per spec: for each MB in raster order, all vertical edges
(left to right), then all horizontal edges (top to bottom); filtered output
feeds subsequent edges.
"""

from __future__ import annotations

import numpy as np

ALPHA_TABLE = np.array(
    [0] * 16 +
    [4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28, 32, 36, 40,
     45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144, 162, 182, 203, 226,
     255, 255], dtype=np.int32)

BETA_TABLE = np.array(
    [0] * 16 +
    [2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11,
     12, 12, 13, 13, 14, 14, 15, 15, 16, 16, 17, 17, 18, 18], dtype=np.int32)

# Table 8-17: tc0 by (bS-1, indexA) — cross-checked byte-exact against
# libx264's i_tc0_table rodata (the earlier transcription had shifted
# leading zeros in the bs=2/bs=3 rows, off by one/three entries)
TC0_TABLE = np.array([
    [0] * 16 + [0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2,
                2, 3, 3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13],
    [0] * 16 + [0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3,
                3, 3, 4, 4, 5, 5, 6, 7, 8, 8, 10, 11, 12, 13, 15, 17],
    [0] * 16 + [0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 4, 4,
                4, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 23, 25],
], dtype=np.int32)


def _clip3(lo, hi, x):
    return np.minimum(np.maximum(x, lo), hi)


# vectorized-over-lines versions (one edge segment = many parallel lines)

def filter_luma_lines(P: np.ndarray, Q: np.ndarray, bs: np.ndarray,
                      alpha: np.ndarray, beta: np.ndarray, tc0: np.ndarray):
    """P: (n,4) [p3 p2 p1 p0], Q: (n,4) [q0 q1 q2 q3]; per-line bs/alpha/
    beta/tc0 (n,). Returns filtered (P', Q')."""
    p3, p2, p1, p0 = (P[:, 0].astype(np.int64), P[:, 1].astype(np.int64),
                      P[:, 2].astype(np.int64), P[:, 3].astype(np.int64))
    q0, q1, q2, q3 = (Q[:, 0].astype(np.int64), Q[:, 1].astype(np.int64),
                      Q[:, 2].astype(np.int64), Q[:, 3].astype(np.int64))
    alpha = alpha.astype(np.int64)
    beta = beta.astype(np.int64)
    tc0 = tc0.astype(np.int64)
    act = ((bs > 0) & (np.abs(p0 - q0) < alpha)
           & (np.abs(p1 - p0) < beta) & (np.abs(q1 - q0) < beta))
    ap = (np.abs(p2 - p0) < beta)
    aq = (np.abs(q2 - q0) < beta)

    # --- bs < 4 path ---
    tc = tc0 + ap.astype(np.int64) + aq.astype(np.int64)
    delta = _clip3(-tc, tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3)
    w_p0 = np.clip(p0 + delta, 0, 255)
    w_q0 = np.clip(q0 - delta, 0, 255)
    dp1 = _clip3(-tc0, tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1)
    dq1 = _clip3(-tc0, tc0, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1)
    w_p1 = np.where(ap, p1 + dp1, p1)
    w_q1 = np.where(aq, q1 + dq1, q1)

    # --- bs == 4 path ---
    strong = np.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp = ap & strong
    s_p0 = np.where(sp, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                    (2 * p1 + p0 + q1 + 2) >> 2)
    s_p1 = np.where(sp, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
    s_p2 = np.where(sp, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    sq = aq & strong
    s_q0 = np.where(sq, (p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3,
                    (2 * q1 + q0 + p1 + 2) >> 2)
    s_q1 = np.where(sq, (p0 + q0 + q1 + q2 + 2) >> 2, q1)
    s_q2 = np.where(sq, (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)

    is4 = bs == 4
    n_p0 = np.where(act, np.where(is4, s_p0, w_p0), p0)
    n_p1 = np.where(act, np.where(is4, s_p1, w_p1), p1)
    n_p2 = np.where(act & is4, s_p2, p2)
    n_q0 = np.where(act, np.where(is4, s_q0, w_q0), q0)
    n_q1 = np.where(act, np.where(is4, s_q1, w_q1), q1)
    n_q2 = np.where(act & is4, s_q2, q2)
    Pn = np.stack([p3, n_p2, n_p1, n_p0], axis=1).astype(np.int32)
    Qn = np.stack([n_q0, n_q1, n_q2, q3], axis=1).astype(np.int32)
    return Pn, Qn


def filter_chroma_lines(P: np.ndarray, Q: np.ndarray, bs: np.ndarray,
                        alpha: np.ndarray, beta: np.ndarray, tc0: np.ndarray):
    """P: (n,2) [p1 p0], Q: (n,2) [q0 q1]."""
    p1, p0 = P[:, 0].astype(np.int64), P[:, 1].astype(np.int64)
    q0, q1 = Q[:, 0].astype(np.int64), Q[:, 1].astype(np.int64)
    alpha = alpha.astype(np.int64)
    beta = beta.astype(np.int64)
    tc0 = tc0.astype(np.int64)
    act = ((bs > 0) & (np.abs(p0 - q0) < alpha)
           & (np.abs(p1 - p0) < beta) & (np.abs(q1 - q0) < beta))
    tc = tc0 + 1
    delta = _clip3(-tc, tc, ((q0 - p0) * 4 + (p1 - q1) + 4) >> 3)
    w_p0 = np.clip(p0 + delta, 0, 255)
    w_q0 = np.clip(q0 - delta, 0, 255)
    s_p0 = (2 * p1 + p0 + q1 + 2) >> 2
    s_q0 = (2 * q1 + q0 + p1 + 2) >> 2
    is4 = bs == 4
    n_p0 = np.where(act, np.where(is4, s_p0, w_p0), p0)
    n_q0 = np.where(act, np.where(is4, s_q0, w_q0), q0)
    Pn = np.stack([p1, n_p0], axis=1).astype(np.int32)
    Qn = np.stack([n_q0, q1], axis=1).astype(np.int32)
    return Pn, Qn


def deblock_frame(sd) -> None:
    """Apply the loop filter to a fully decoded frame (slice decoder state).

    sd duck-type: mbw, mbh, y, u, v, qp_map, mb_type, tc_luma, mv, ref,
    h (SliceHeader), pps.
    """
    h = sd.h
    offA = h.slice_alpha_c0_offset_div2 * 2
    offB = h.slice_beta_offset_div2 * 2

    def is_intra(mx, my):
        t = sd.mb_type[my, mx]
        return 0 <= t < 100

    refpic = getattr(sd, "refpic", None)
    mv1 = getattr(sd, "mv1", None)
    # High-profile 8x8 transform: internal luma edges 1/3 are not
    # filtered, and the coded-block bS condition applies to the covering
    # 8x8 block (§8.7.2.1)
    t8map = getattr(sd, "t8x8", None)
    t8c = getattr(sd, "t8_coded", None)

    def coded4(bx, by):
        if (t8map is not None and t8map[by // 4, bx // 4]
                and t8c is not None):
            return bool(t8c[by // 2, bx // 2])
        return sd.tc_luma[by, bx] > 0

    def t8_skip(mx, my, edge):
        return (edge in (1, 3) and t8map is not None
                and t8map[my, mx])

    def motion_of(bx, by):
        """[(pic_id, mv)] for each list the block uses."""
        out = []
        if refpic is not None:
            if refpic[0][by, bx] >= 0:
                out.append((int(refpic[0][by, bx]), sd.mv[by, bx]))
            if refpic[1][by, bx] >= 0:
                out.append((int(refpic[1][by, bx]), mv1[by, bx]))
        else:  # legacy single-list state (device recon path)
            out.append((int(sd.ref[by, bx]), sd.mv[by, bx]))
        return out

    def mv_close(a, b):
        return (abs(int(a[0]) - int(b[0])) < 4
                and abs(int(a[1]) - int(b[1])) < 4)

    def bs_edge(mx, my, vertical, edge, line):
        """boundary strength for 4-sample group `line` (0..3) of edge."""
        # sample coords of q-side 4x4 block
        if vertical:
            bqx, bqy = mx * 4 + edge, my * 4 + line
            bpx, bpy = bqx - 1, bqy
        else:
            bqx, bqy = mx * 4 + line, my * 4 + edge
            bpx, bpy = bqx, bqy - 1
        pmx, pmy = bpx // 4, bpy // 4
        mb_edge = edge == 0
        if is_intra(mx, my) or is_intra(pmx, pmy):
            return 4 if mb_edge else 3
        if coded4(bqx, bqy) or coded4(bpx, bpy):
            return 2
        # §8.7.2.1 inter/inter: different ref-picture sets, different mv
        # counts, or an mv gap >= 4 quarter-pels for the matching picture
        P = motion_of(bpx, bpy)
        Q = motion_of(bqx, bqy)
        if len(P) != len(Q):
            return 1
        if sorted(p for p, _ in P) != sorted(q for q, _ in Q):
            return 1
        if len(P) == 1:
            return 0 if mv_close(P[0][1], Q[0][1]) else 1
        (pa, ma), (pb, mb) = P
        (qa, na), (qb, nb) = Q
        if pa == pb:  # both lists use the same picture: either pairing may pass
            ok = ((mv_close(ma, na) and mv_close(mb, nb))
                  or (mv_close(ma, nb) and mv_close(mb, na)))
        elif pa == qa:
            ok = mv_close(ma, na) and mv_close(mb, nb)
        else:
            ok = mv_close(ma, nb) and mv_close(mb, na)
        return 0 if ok else 1

    for my in range(sd.mbh):
        for mx in range(sd.mbw):
            qp_q = int(sd.qp_map[my, mx])
            # ---- vertical edges (luma) ----
            for edge in range(4):
                if edge == 0 and mx == 0:
                    continue
                if t8_skip(mx, my, edge):
                    continue
                x = mx * 16 + edge * 4
                qp_p = int(sd.qp_map[my, mx - 1]) if edge == 0 else qp_q
                qpav = (qp_p + qp_q + 1) >> 1
                ia = int(np.clip(qpav + offA, 0, 51))
                ib = int(np.clip(qpav + offB, 0, 51))
                alpha, beta = ALPHA_TABLE[ia], BETA_TABLE[ib]
                if alpha == 0 or beta == 0:
                    continue
                bs = np.zeros(16, dtype=np.int32)
                for line4 in range(4):
                    b = bs_edge(mx, my, True, edge, line4)
                    bs[line4 * 4:line4 * 4 + 4] = b
                if not bs.any():
                    continue
                y0 = my * 16
                P = sd.y[y0:y0 + 16, x - 4:x]
                Q = sd.y[y0:y0 + 16, x:x + 4]
                tc0 = np.where(bs > 0, TC0_TABLE[np.clip(bs, 1, 3) - 1, ia], 0)
                Pn, Qn = filter_luma_lines(P, Q, bs, np.full(16, alpha),
                                           np.full(16, beta), tc0)
                sd.y[y0:y0 + 16, x - 4:x] = Pn
                sd.y[y0:y0 + 16, x:x + 4] = Qn
            # ---- vertical edges (chroma): edges 0 and 2 ----
            for edge in (0, 2):
                if edge == 0 and mx == 0:
                    continue
                qp_p = int(sd.qp_map[my, mx - 1]) if edge == 0 else qp_q
                self_qpc = _chroma_qp_pair(sd, qp_p, qp_q)
                xc = mx * 8 + edge * 2
                y0c = my * 8
                bs = np.zeros(8, dtype=np.int32)
                for line4 in range(4):
                    b = bs_edge(mx, my, True, edge, line4)
                    bs[line4 * 2:line4 * 2 + 2] = b
                if not bs.any():
                    continue
                for plane in (sd.u, sd.v):
                    ia = int(np.clip(self_qpc + offA, 0, 51))
                    ib = int(np.clip(self_qpc + offB, 0, 51))
                    alpha, beta = ALPHA_TABLE[ia], BETA_TABLE[ib]
                    if alpha == 0:
                        continue
                    P = plane[y0c:y0c + 8, xc - 2:xc]
                    Q = plane[y0c:y0c + 8, xc:xc + 2]
                    tc0 = np.where(bs > 0, TC0_TABLE[np.clip(bs, 1, 3) - 1, ia], 0)
                    Pn, Qn = filter_chroma_lines(P, Q, bs, np.full(8, alpha),
                                                 np.full(8, beta), tc0)
                    plane[y0c:y0c + 8, xc - 2:xc] = Pn
                    plane[y0c:y0c + 8, xc:xc + 2] = Qn
            # ---- horizontal edges (luma) ----
            for edge in range(4):
                if edge == 0 and my == 0:
                    continue
                if t8_skip(mx, my, edge):
                    continue
                y = my * 16 + edge * 4
                qp_p = int(sd.qp_map[my - 1, mx]) if edge == 0 else qp_q
                qpav = (qp_p + qp_q + 1) >> 1
                ia = int(np.clip(qpav + offA, 0, 51))
                ib = int(np.clip(qpav + offB, 0, 51))
                alpha, beta = ALPHA_TABLE[ia], BETA_TABLE[ib]
                if alpha == 0 or beta == 0:
                    continue
                bs = np.zeros(16, dtype=np.int32)
                for line4 in range(4):
                    b = bs_edge(mx, my, False, edge, line4)
                    bs[line4 * 4:line4 * 4 + 4] = b
                if not bs.any():
                    continue
                x0 = mx * 16
                P = sd.y[y - 4:y, x0:x0 + 16].T
                Q = sd.y[y:y + 4, x0:x0 + 16].T
                tc0 = np.where(bs > 0, TC0_TABLE[np.clip(bs, 1, 3) - 1, ia], 0)
                Pn, Qn = filter_luma_lines(P, Q, bs, np.full(16, alpha),
                                           np.full(16, beta), tc0)
                sd.y[y - 4:y, x0:x0 + 16] = Pn.T
                sd.y[y:y + 4, x0:x0 + 16] = Qn.T
            # ---- horizontal edges (chroma) ----
            for edge in (0, 2):
                if edge == 0 and my == 0:
                    continue
                qp_p = int(sd.qp_map[my - 1, mx]) if edge == 0 else qp_q
                qpc_av = _chroma_qp_pair(sd, qp_p, qp_q)
                yc = my * 8 + edge * 2
                x0c = mx * 8
                bs = np.zeros(8, dtype=np.int32)
                for line4 in range(4):
                    b = bs_edge(mx, my, False, edge, line4)
                    bs[line4 * 2:line4 * 2 + 2] = b
                if not bs.any():
                    continue
                for plane in (sd.u, sd.v):
                    ia = int(np.clip(qpc_av + offA, 0, 51))
                    ib = int(np.clip(qpc_av + offB, 0, 51))
                    alpha, beta = ALPHA_TABLE[ia], BETA_TABLE[ib]
                    if alpha == 0:
                        continue
                    P = plane[yc - 2:yc, x0c:x0c + 8].T
                    Q = plane[yc:yc + 2, x0c:x0c + 8].T
                    tc0 = np.where(bs > 0, TC0_TABLE[np.clip(bs, 1, 3) - 1, ia], 0)
                    Pn, Qn = filter_chroma_lines(P, Q, bs, np.full(8, alpha),
                                                 np.full(8, beta), tc0)
                    plane[yc - 2:yc, x0c:x0c + 8] = Pn.T
                    plane[yc:yc + 2, x0c:x0c + 8] = Qn.T


def _chroma_qp_pair(sd, qp_p: int, qp_q: int) -> int:
    from . import transform_np as tnp
    off = sd.pps.chroma_qp_index_offset
    qpc_p = int(tnp.chroma_qp(qp_p, off))
    qpc_q = int(tnp.chroma_qp(qp_q, off))
    return (qpc_p + qpc_q + 1) >> 1
