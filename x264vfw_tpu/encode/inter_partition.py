"""P-frame inter partitions (16x16 / 16x8 / 8x16 / 8x8) — device ME + MC.

The reference forwards this capability as x264's --partitions
(/root/reference/codec.c:887).  TPU formulation:

* ONE Pallas SAD sweep produces 8x8-QUADRANT SADs for every offset
  (ops/pallas/sad.sad_search_quad); every partition granularity's
  full-search cost is a reshaped sum of the same tensor — the partition
  decision costs no extra search.
* the motion field lives on the 8x8 grid (2mbh, 2mbw, 2): one mv per
  quadrant, replicated within larger partitions.  Motion compensation and
  subpel refinement run at 8-row band granularity with the same
  masked-shift alignment used by the 16x16 path (per-block gathers are
  pathological on TPU; every candidate offset is a static shift of a
  band stack + a mask).
* quarter-pel refinement evaluates the same +-2 qpel grid per 8x8 block
  and SHARES the delta within a partition (refine SADs are grouped by the
  chosen layout before the argmin), so a 16x8 partition gets one mv.

Decision metric: SAD*4 + |mv| (the magnitude proxy the 16x16 path uses)
plus a lambda-scaled header-bit estimate per partition layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .device import _halfpel_planes, _qpel_operands, _resolve_me_backend


def _quad_sads(src16, ref_pad, rng: int, backend: str):
    """(K*K, 2mbh, 2mbw) 8x8-block SADs for every offset."""
    H, W = src16.shape
    K = 2 * rng + 1
    if backend in ("pallas", "pallas_interpret"):
        from ..ops.pallas.sad import sad_search_quad
        return sad_search_quad(src16, ref_pad[8:-8, 8:-8], rng,
                               interpret=(backend == "pallas_interpret"))
    # XLA fallback: one static shift of the padded plane per offset
    PAD = rng + 8
    qh, qw = H // 8, W // 8

    def sad_at(off):
        cand = jax.lax.dynamic_slice(
            ref_pad, (PAD - rng + off[0], PAD - rng + off[1]), (H, W))
        d = jnp.abs(src16 - cand).astype(jnp.int32)
        return d.reshape(qh, 8, qw, 8).sum(axis=(1, 3))

    offs = jnp.stack(jnp.meshgrid(jnp.arange(K), jnp.arange(K),
                                  indexing="ij"), -1).reshape(-1, 2)
    return jax.lax.map(sad_at, offs)


def _argmin_mv(costs, K, rng):
    """costs (KK, ...) -> (mv (..., 2) int, value (...))."""
    best = jnp.argmin(costs, axis=0)
    val = jnp.min(costs, axis=0)
    dy = best // K - rng
    dx = best % K - rng
    return jnp.stack([dx, dy], axis=-1).astype(jnp.int32), val


def _minima_from_q(q, rng: int) -> dict:
    """Per-partition (best cost, best offset id) from full quadrant SADs —
    the XLA-path equivalent of ops/pallas/sad.sad_partition_minima
    (scales 4/2/2/1), bit-identical by construction."""
    KK, qh, qw = q.shape
    K = 2 * rng + 1
    mbh, mbw = qh // 2, qw // 2
    offs_pen = (jnp.abs(jnp.arange(K) - rng)[:, None]
                + jnp.abs(jnp.arange(K) - rng)[None, :]).reshape(KK)
    pen = offs_pen[:, None, None]
    q5 = q.reshape(KK, mbh, 2, mbw, 2)

    def mink(c):
        return jnp.min(c, axis=0), jnp.argmin(c, axis=0).astype(jnp.int32)

    v16, k16 = mink(q5.sum(axis=(2, 4)) * 4 + 4 * pen)
    v168, k168 = mink(q5.sum(axis=4).transpose(0, 1, 3, 2) * 4
                      + 2 * pen[..., None])
    v816, k816 = mink(q5.sum(axis=2) * 4 + 2 * pen[..., None])
    v8, k8 = mink(q * 4 + pen)
    return {"v16": v16, "k16": k16, "v168": v168, "k168": k168,
            "v816": v816, "k816": k816, "v8": v8, "k8": k8}


def _k_to_mv(k, K, rng):
    return jnp.stack([k % K - rng, k // K - rng], axis=-1).astype(jnp.int32)


def partition_decide_from_minima(mins: dict, rng: int, qp, lam_bits=None):
    """Partition decision from per-shape minima (see _minima_from_q /
    sad_partition_minima).  Returns (part (mbh, mbw) in {0:16x16, 1:16x8,
    2:8x16, 3:8x8}, mv8_int (2mbh, 2mbw, 2) full-pel)."""
    K = 2 * rng + 1
    mbh, mbw = mins["v16"].shape
    mv16 = _k_to_mv(mins["k16"], K, rng)                   # (mbh, mbw, 2)
    mv168 = _k_to_mv(mins["k168"], K, rng)                 # (mbh, mbw, 2h, 2)
    mv816 = _k_to_mv(mins["k816"], K, rng)                 # (mbh, mbw, 2v, 2)
    mv8q = _k_to_mv(mins["k8"], K, rng)                    # (2mbh, 2mbw, 2)
    v8m = mins["v8"].reshape(mbh, 2, mbw, 2).sum(axis=(1, 3))

    # lambda-scaled header-bit estimates (ue(mb_type) + mvd-per-partition)
    lam = (jnp.maximum(1, jnp.round(
        3.4 * jnp.exp2((jnp.asarray(qp, jnp.float32) - 12.0) / 3.0)))
        .astype(jnp.int32) if lam_bits is None else lam_bits)
    cost = jnp.stack([
        mins["v16"] + lam * 7,
        mins["v168"].sum(-1) + lam * 15,
        mins["v816"].sum(-1) + lam * 15,
        v8m + lam * 33,
    ])
    part = jnp.argmin(cost, axis=0).astype(jnp.int32)      # (mbh, mbw)

    # assemble the 8x8 motion field for the chosen layout
    f16 = jnp.repeat(jnp.repeat(mv16, 2, 0), 2, 1)
    f168 = jnp.repeat(
        mv168.transpose(0, 2, 1, 3).reshape(2 * mbh, mbw, 2), 2, 1)
    f816 = jnp.repeat(mv816.reshape(mbh, 2 * mbw, 2), 2, 0)
    p8 = jnp.repeat(jnp.repeat(part, 2, 0), 2, 1)[..., None]
    mv8 = jnp.where(p8 == 0, f16,
                    jnp.where(p8 == 1, f168,
                              jnp.where(p8 == 2, f816, mv8q)))
    return part, mv8


def partition_decide(q, rng: int, qp, lam_bits=None):
    """Integer-pel partition decision from quadrant SADs (XLA path)."""
    return partition_decide_from_minima(_minima_from_q(q, rng), rng, qp,
                                        lam_bits)


def _to_bands8(pl_, qh, Wb, bh, PAD, Mg):
    return jnp.stack([
        jax.lax.dynamic_slice(pl_, (PAD - Mg + 8 * i, PAD - Mg), (bh, Wb))
        for i in range(qh)])                               # (qh, bh, Wb)


def partition_search_and_mc(src_y, src_u, src_v, ref_y, ref_u, ref_v,
                            rng: int, qp, subpel=True, me_backend="auto"):
    """Full partition ME + MC.  Returns (part (mbh,mbw), mv8 (2mbh,2mbw,2)
    quarter-pel, pred_y, pred_u, pred_v)."""
    H, W = src_y.shape
    mbh, mbw = H // 16, W // 16
    qh, qw = 2 * mbh, 2 * mbw
    K = 2 * rng + 1
    PAD = rng + 8
    src16 = src_y.astype(jnp.int16)
    ref_pad = jnp.pad(ref_y, PAD, mode="edge").astype(jnp.int16)
    backend = _resolve_me_backend(
        me_backend[:-5] if me_backend.endswith(":hier") else me_backend)

    if backend in ("pallas", "pallas_interpret"):
        from ..ops.pallas.sad import sad_partition_minima
        mins = sad_partition_minima(
            src16, ref_pad[8:-8, 8:-8], rng,
            interpret=(backend == "pallas_interpret"))
    else:
        mins = _minima_from_q(_quad_sads(src16, ref_pad, rng, backend), rng)
    part, mv8i = partition_decide_from_minima(mins, rng, qp)

    sub_lv = 2 if subpel is True else int(subpel)
    if backend in ("pallas", "pallas_interpret") and sub_lv == 2:
        # fused Pallas path: halfpel + alignment + qpel refine + MC in one
        # VMEM-resident kernel (bit-identical to _refine_and_mc_xla)
        from ..ops.pallas.memc import partition_refine_mc
        mv8, pred_y = partition_refine_mc(
            src16, ref_pad, mv8i, part, rng,
            interpret=(backend == "pallas_interpret"))
    else:
        mv8, pred_y = _refine_and_mc_xla(src16, ref_pad, mv8i, part, rng,
                                         sub_lv)

    pred_u, pred_v = _chroma_mc_8x8(mv8, ref_u, ref_v, rng, H, W)
    return part, mv8, pred_y, pred_u, pred_v


def refine_deltas(sub_lv: int) -> list:
    """Quarter-pel refine candidate grid (tx, ty) around the integer best:
    full [-2,2]^2 at quarter precision, even offsets at half, (0,0) at
    integer (unifies the no-subpel path with the refine/select machinery)."""
    if sub_lv >= 2:
        return [(tx, ty) for ty in range(-2, 3) for tx in range(-2, 3)]
    if sub_lv == 1:
        return [(tx, ty) for ty in (-2, 0, 2) for tx in (-2, 0, 2)]
    return [(0, 0)]


def _refine_and_mc_xla(src16, ref_pad, mv8i, part, rng: int, sub_lv: int = 2):
    """Quarter-pel refine + exact MC from the integer partition decision
    (XLA masked-shift formulation — the golden model for the fused Pallas
    kernel in ops/pallas/memc.py).  Returns (mv8 qpel, pred_y (H,W) i32).

    Alignment is EXACT per horizontal operand offset: for each plane the
    h-pass accumulates THREE aligned variants (o = -1/0/+1), where variant o
    column x holds plane[x + o + dx(block(x))] — i.e. the slice is shifted,
    never the read.  A single wider aligned array indexed at x + o is wrong
    at interior 8-px block boundaries (the neighbour block's dx leaks into
    the operand; frame-edge padding does not cover that), which broke
    conformance vs FFmpeg at partition seams.  MC is then a select over the
    refine candidates — no second alignment pass is needed."""
    H = src16.shape[0]
    W = src16.shape[1]
    mbh, mbw = H // 16, W // 16
    qh, qw = 2 * mbh, 2 * mbw
    K = 2 * rng + 1
    PAD = rng + 8
    dxb = mv8i[..., 0]
    dyb = mv8i[..., 1]

    # ---- masked-shift alignment at 8-row band granularity ----
    Mg = rng + 1
    bh = 8 + 2 * Mg
    Wb = W + 2 * Mg
    if sub_lv:
        hb, hh, hj = _halfpel_planes(ref_pad)
        planes = (ref_pad, hb, hh, hj)
    else:
        planes = (ref_pad,)
    bands = tuple(_to_bands8(p, qh, Wb, bh, PAD, Mg) for p in planes)
    # per-column masks: every column x uses its OWN block's offset
    oxc = jnp.repeat(dxb, 8, axis=1)[:, None, :]            # (qh, 1, W)
    oyc = jnp.repeat(dyb, 8, axis=1)[:, None, :]
    shifts = jnp.arange(K, dtype=jnp.int32) - rng
    NV = 3 if sub_lv else 1                                 # h variants

    def h_step(carry, s):
        out = []
        for pi, b in enumerate(bands):
            sl = jax.lax.dynamic_slice(b, (0, 0, Mg + s - 1), (qh, bh, W + 2))
            for o in range(NV):
                out.append(carry[pi * NV + o]
                           + jnp.where(oxc == s, sl[:, :, o:o + W], 0))
        return tuple(out), None

    Ah, _ = jax.lax.scan(
        h_step,
        tuple(jnp.zeros((qh, bh, W), jnp.int16)
              for _ in range(NV * len(bands))),
        shifts)

    def v_step(carry, s):
        out = []
        for acc, a in zip(carry, Ah):
            sl = jax.lax.dynamic_slice(a, (0, Mg + s - 1, 0), (qh, 10, W))
            out.append(acc + jnp.where(oyc == s, sl, 0))
        return tuple(out), None

    amap, _ = jax.lax.scan(
        v_step,
        tuple(jnp.zeros((qh, 10, W), jnp.int16)
              for _ in range(NV * len(bands))),
        shifts)   # amap[p*NV + o+1] (qh, 10, W); row 1 = vertical offset 0

    deltas = refine_deltas(sub_lv)
    ops = [_qpel_operands(tx, ty) for tx, ty in deltas]

    def read(op):
        p_, ox_, oy_ = op
        return amap[p_ * NV + (ox_ + 1 if sub_lv else 0)][
            :, 1 + oy_:9 + oy_, :]

    def cand(op1, op2):
        a = read(op1)
        return a if op1 == op2 else (a + read(op2) + 1) >> 1

    src_r = src16.reshape(qh, 8, W)
    sads_r = [jnp.abs(src_r - cand(op1, op2)).astype(jnp.int32)
              .reshape(qh, 8, qw, 8).sum(axis=(1, 3)) for op1, op2 in ops]
    hsads = jnp.stack(sads_r)                          # (ncand, qh, qw)
    # group refine SADs by the chosen partition so the delta is shared
    h5 = hsads.reshape(-1, mbh, 2, mbw, 2)
    g16 = jnp.repeat(jnp.repeat(
        h5.sum(axis=(2, 4)), 2, 1), 2, 2)              # (nc, qh, qw)
    g168 = jnp.repeat(h5.sum(axis=4).reshape(-1, qh, mbw), 2, 2)
    g816 = jnp.repeat(h5.sum(axis=2).reshape(-1, mbh, qw), 2, 1)
    p8 = jnp.repeat(jnp.repeat(part, 2, 0), 2, 1)[None]
    gsel = jnp.where(p8 == 0, g16,
                     jnp.where(p8 == 1, g168,
                               jnp.where(p8 == 2, g816, hsads)))
    hcost = jnp.asarray([(abs(tx) + abs(ty)) for tx, ty in deltas])
    hbest = jnp.argmin(gsel * 4 + hcost[:, None, None], axis=0)
    txs = jnp.asarray([d[0] for d in deltas])[hbest]
    tys = jnp.asarray([d[1] for d in deltas])[hbest]
    mv8 = mv8i * 4 + jnp.stack([txs, tys], axis=-1)

    # ---- MC = select over the refine candidates ----
    hb8 = jnp.repeat(hbest, 8, axis=1)[:, None, :]     # (qh, 1, W)
    pred = jnp.zeros((qh, 8, W), jnp.int16)
    for c, (op1, op2) in enumerate(ops):
        pred = jnp.where(hb8 == c, cand(op1, op2), pred)
    pred_y = pred.reshape(H, W).astype(jnp.int32)
    return mv8, pred_y


def _chroma_mc_8x8(mv8, ref_u, ref_v, rng: int, H: int, W: int):
    """Chroma MC from the 8x8-grid qpel motion field: one 4x4 chroma block
    per luma 8x8, eighth-pel bilinear (§8.4.2.2.2).  Returns (pred_u,
    pred_v) (H/2, W/2) int32."""
    qh = 2 * (H // 16)
    ci = mv8 >> 3
    f = mv8 & 7
    clo = -((4 * rng + 2) >> 3) - 1
    chi = (4 * rng + 2) >> 3
    cpad = chi + 2
    ref_pad_u = jnp.pad(ref_u, cpad, mode="edge").astype(jnp.int16)
    ref_pad_v = jnp.pad(ref_v, cpad, mode="edge").astype(jnp.int16)
    nc = chi - clo + 1
    Wc = W // 2
    bhc = nc + 4                 # rows [clo, chi + 5) rel. chroma-block start
    Wbc = Wc + nc + 1

    def to_cbands(pl_):
        return jnp.stack([
            jax.lax.dynamic_slice(pl_, (cpad + 4 * i + clo, cpad + clo),
                                  (bhc, Wbc))
            for i in range(qh)])  # (qh, bhc, Wbc)

    cb_u = to_cbands(ref_pad_u)
    cb_v = to_cbands(ref_pad_v)
    cixc = jnp.repeat(ci[..., 0], 4, axis=1)[:, None, :]   # (qh, 1, Wc)
    ciyc = jnp.repeat(ci[..., 1], 4, axis=1)[:, None, :]
    fxc = jnp.repeat(f[..., 0], 4, axis=1)[:, None, :].astype(jnp.int32)
    fyc = jnp.repeat(f[..., 1], 4, axis=1)[:, None, :].astype(jnp.int32)
    cshifts = jnp.arange(nc, dtype=jnp.int32) + clo

    def ch_step(carry, s):
        Au, Bu, Av_, Bv_ = carry
        m_ = cixc == s
        sl_u0 = jax.lax.dynamic_slice(cb_u, (0, 0, s - clo), (qh, bhc, Wc))
        sl_u1 = jax.lax.dynamic_slice(cb_u, (0, 0, s - clo + 1), (qh, bhc, Wc))
        sl_v0 = jax.lax.dynamic_slice(cb_v, (0, 0, s - clo), (qh, bhc, Wc))
        sl_v1 = jax.lax.dynamic_slice(cb_v, (0, 0, s - clo + 1), (qh, bhc, Wc))
        return (Au + jnp.where(m_, sl_u0, 0), Bu + jnp.where(m_, sl_u1, 0),
                Av_ + jnp.where(m_, sl_v0, 0), Bv_ + jnp.where(m_, sl_v1, 0)), None

    zc = jnp.zeros((qh, bhc, Wc), jnp.int16)
    (Au, Bu, Av_, Bv_), _ = jax.lax.scan(ch_step, (zc, zc, zc, zc), cshifts)

    def cv_step(carry, s):
        pu, pv = carry
        m_ = ciyc == s

        def bil(A_, B_):
            a0 = jax.lax.dynamic_slice(A_, (0, s - clo, 0), (qh, 4, Wc)).astype(jnp.int32)
            b0 = jax.lax.dynamic_slice(B_, (0, s - clo, 0), (qh, 4, Wc)).astype(jnp.int32)
            a1 = jax.lax.dynamic_slice(A_, (0, s - clo + 1, 0), (qh, 4, Wc)).astype(jnp.int32)
            b1 = jax.lax.dynamic_slice(B_, (0, s - clo + 1, 0), (qh, 4, Wc)).astype(jnp.int32)
            return ((8 - fxc) * (8 - fyc) * a0 + fxc * (8 - fyc) * b0
                    + (8 - fxc) * fyc * a1 + fxc * fyc * b1 + 32) >> 6

        return (pu + jnp.where(m_, bil(Au, Bu), 0),
                pv + jnp.where(m_, bil(Av_, Bv_), 0)), None

    zp = jnp.zeros((qh, 4, Wc), jnp.int32)
    (pu_r, pv_r), _ = jax.lax.scan(cv_step, (zp, zp), cshifts)
    return pu_r.reshape(H // 2, Wc), pv_r.reshape(H // 2, Wc)


# ---------------------------------------------------------------------------
# MV prediction / mvd derivation (§8.4.1.3) for the 8x8-grid motion field.
# Single-reference P slices: every available inter neighbour has refIdx 0,
# so "refIdxN == refIdx" reduces to availability (the tpu encoder gates
# partitions to nref == 1; the decoder path decoder._mv_pred is the scalar
# golden this mirrors).
# ---------------------------------------------------------------------------

def _median3(a, b, c):
    return a + b + c - jnp.maximum(a, jnp.maximum(b, c)) \
        - jnp.minimum(a, jnp.minimum(b, c))


def partition_mvds(mv8, part):
    """mv8 (2mbh, 2mbw, 2) qpel, part (mbh, mbw) in {0..3} ->
    (mvd8 (2mbh, 2mbw, 2): each partition's mvd stored at its FIRST
     quadrant slot (zeros elsewhere),
     nslot (2mbh, 2mbw) bool: quadrant slots that carry an mvd,
     skip_zero (mbh, mbw) bool: P_Skip's derived mv is forced zero).
    """
    qh, qw, _ = mv8.shape
    mbh, mbw = qh // 2, qw // 2
    mv8p = jnp.pad(mv8, ((2, 2), (2, 2), (0, 0)))

    def rd(Y, X):
        """(2my + Y, 2mx + X) for every MB -> (mbh, mbw, 2)."""
        return mv8p[Y + 2::2, X + 2::2][:mbh, :mbw]

    my = jnp.arange(mbh)[:, None] * jnp.ones((1, mbw), jnp.int32)
    mx = jnp.ones((mbh, 1), jnp.int32) * jnp.arange(mbw)[None, :]
    has_l = mx > 0
    has_t = my > 0
    has_tr = has_t & (mx < mbw - 1)
    has_tl = has_t & has_l
    T = jnp.bool_(True)
    ones = jnp.ones((mbh, mbw), bool)

    def pmv(A, aA, B, aB, C, aC, D, aD):
        """Median rule with C->D fallback and the 1-match/A-only cases."""
        Ce = jnp.where(aC[..., None], C, D)
        aCe = aC | aD
        only_a = aA & ~aB & ~aCe
        n = aA.astype(jnp.int32) + aB + aCe
        mA = jnp.where(aA[..., None], A, 0)
        mB = jnp.where(aB[..., None], B, 0)
        mC = jnp.where(aCe[..., None], Ce, 0)
        med = _median3(mA, mB, mC)
        one = jnp.where(aA[..., None], mA,
                        jnp.where(aB[..., None], mB, mC))
        return jnp.where(only_a[..., None], mA,
                         jnp.where((n == 1)[..., None], one, med))

    # quadrant mvs of the current MB (final field values)
    q00 = rd(0, 0)
    q01 = rd(0, 1)
    q10 = rd(1, 0)
    q11 = rd(1, 1)

    # ---- 16x16 ----
    A = rd(0, -1); B = rd(-1, 0); C = rd(-1, 2); D = rd(-1, -1)
    pmv16 = pmv(A, has_l, B, has_t, C, has_tr, D, has_tl)
    # P_Skip §8.4.1.1: A/B unavailable or zero-mv(ref0) forces mv 0
    zeroA = has_l & (A == 0).all(-1)
    zeroB = has_t & (B == 0).all(-1)
    skip_zero_cond = (~has_l) | (~has_t) | zeroA | zeroB
    pskip = jnp.where(skip_zero_cond[..., None], 0, pmv16)
    skip_zero = (pskip == 0).all(-1)

    # ---- 16x8 (§8.4.1.3.1 directional) ----
    p168_t = jnp.where((has_t)[..., None], B,
                       pmv(A, has_l, B, has_t, C, has_tr, D, has_tl))
    A2 = rd(1, -1)          # left MB, lower quadrant
    D2 = rd(0, -1)          # left MB, upper quadrant (C for bottom part)
    p168_b = jnp.where((has_l)[..., None], A2,
                       pmv(A2, has_l, q00, ones, D2, jnp.zeros_like(has_l),
                           D2, has_l))
    # ---- 8x16 ----
    p816_l = jnp.where((has_l)[..., None], A,
                       pmv(A, has_l, B, has_t, rd(-1, 1), has_t, D, has_tl))
    # right partition: C = (gx+4, gy-1) -> above-right MB; the directional
    # rule applies to the EFFECTIVE C (after the D fallback, D = above MB)
    C2 = rd(-1, 2)
    D2r = rd(-1, 0)
    Ce816 = jnp.where(has_tr[..., None], C2, D2r)
    aCe816 = has_tr | has_t
    p816_r = jnp.where(aCe816[..., None], Ce816,
                       pmv(q00, ones, rd(-1, 1), has_t, C2, has_tr,
                           D2r, has_t))

    # ---- 8x8 subs (median rule per sub) ----
    p8_0 = pmv(A, has_l, B, has_t, rd(-1, 1), has_t, D, has_tl)
    p8_1 = pmv(q00, ones, rd(-1, 1), has_t, C, has_tr, rd(-1, 0), has_t)
    p8_2 = pmv(rd(1, -1), has_l, q00, ones, q01, ones, rd(0, -1), has_l)
    p8_3 = pmv(q10, ones, q01, ones, jnp.zeros_like(q01),
               jnp.zeros_like(ones), q00, ones)

    def at(field, Y, X):
        """scatter per-MB (mbh,mbw,2) values into quadrant slots (Y,X)."""
        z = jnp.zeros((mbh, mbw, 2, 2, 2), jnp.int32)
        return z.at[:, :, Y, X, :].set(field)

    def quadmap(v00, v01, v10, v11):
        q = jnp.stack([jnp.stack([v00, v01], 2), jnp.stack([v10, v11], 2)], 2)
        # (mbh, mbw, 2, 2, 2) -> (qh, qw, 2)
        return q.transpose(0, 2, 1, 3, 4).reshape(qh, qw, 2)

    z2 = jnp.zeros((mbh, mbw, 2), jnp.int32)
    pm_l0 = quadmap(pmv16, z2, z2, z2)
    pm_l1 = quadmap(p168_t, z2, p168_b, z2)
    pm_l2 = quadmap(p816_l, p816_r, z2, z2)
    pm_l3 = quadmap(p8_0, p8_1, p8_2, p8_3)
    p8x = jnp.repeat(jnp.repeat(part, 2, 0), 2, 1)[..., None]
    pm = jnp.where(p8x == 0, pm_l0,
                   jnp.where(p8x == 1, pm_l1,
                             jnp.where(p8x == 2, pm_l2, pm_l3)))

    f = jnp.zeros((mbh, mbw), bool)
    t = jnp.ones((mbh, mbw), bool)

    def slotmap(s00, s01, s10, s11):
        q = jnp.stack([jnp.stack([s00, s01], 2), jnp.stack([s10, s11], 2)], 2)
        return q.transpose(0, 2, 1, 3).reshape(qh, qw)

    sl_l0 = slotmap(t, f, f, f)
    sl_l1 = slotmap(t, f, t, f)
    sl_l2 = slotmap(t, t, f, f)
    sl_l3 = slotmap(t, t, t, t)
    p8s = p8x[..., 0]
    nslot = jnp.where(p8s == 0, sl_l0,
                      jnp.where(p8s == 1, sl_l1,
                                jnp.where(p8s == 2, sl_l2, sl_l3)))

    mvd8 = jnp.where(nslot[..., None], mv8 - pm, 0)
    return mvd8, nslot, skip_zero
