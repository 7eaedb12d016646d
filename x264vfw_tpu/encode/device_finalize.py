"""Device-side slice finalization: syntax slots -> packed RBSP bytes.

Everything between the per-MB compute and the NAL wrapper runs on device:
MV prediction, skip-run derivation, nC context maps, CAVLC slot generation
(cavlc_jax) and bit packing (device_pack).  The host receives only the
packed byte payload (plus a bit count) — ~the size of the final bitstream —
which is what makes the encoder viable over low-bandwidth host links and
removes the host entropy bottleneck entirely.

Slice-header bits are assembled on host (tiny, frame-varying) and passed in
as a fixed-size slot array.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..bitstream import cavlc_jax as cj
from ..bitstream.mb_syntax import CBP_TO_CODE
from .device_pack import pack_slots

S = cj.SLOTS
MAX_HDR = 64  # header slot capacity

CBP_TO_CODE_J = CBP_TO_CODE  # numpy; embedded at trace time

import numpy as _np
BLK_X = _np.array([0, 1, 0, 1, 2, 3, 2, 3, 0, 1, 0, 1, 2, 3, 2, 3])
BLK_Y = _np.array([0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3])
SBX = _np.array([0, 1, 0, 1])
SBY = _np.array([0, 0, 1, 1])


def _nc_from_map(tcm):
    tA = jnp.zeros_like(tcm).at[:, 1:].set(tcm[:, :-1])
    tB = jnp.zeros_like(tcm).at[1:, :].set(tcm[:-1, :])
    availA = jnp.zeros(tcm.shape, jnp.bool_).at[:, 1:].set(True)
    availB = jnp.zeros(tcm.shape, jnp.bool_).at[1:, :].set(True)
    return jnp.where(availA & availB, (tA + tB + 1) >> 1,
                     jnp.where(availA, tA, jnp.where(availB, tB, 0)))


# block coding order <-> raster-within-MB: fixed 16-permutations (scatters
# with computed indices are pathological on TPU; these are pure layout ops)
_RAS = _np.asarray(BLK_Y * 4 + BLK_X)          # block order -> raster pos
_INV16 = _np.zeros(16, _np.int32)
_INV16[_RAS] = _np.arange(16)                  # raster pos -> block order


def _nc_luma(tc_blk, mbh, mbw):
    """tc_blk (n,16) block coding order -> nC (n,16)."""
    n = mbh * mbw
    raster = jnp.take(tc_blk, jnp.asarray(_INV16), axis=1)
    tcm = (raster.reshape(mbh, mbw, 4, 4).transpose(0, 2, 1, 3)
           .reshape(4 * mbh, 4 * mbw))
    nc = _nc_from_map(tcm)
    back = (nc.reshape(mbh, 4, mbw, 4).transpose(0, 2, 1, 3).reshape(n, 16))
    return jnp.take(back, jnp.asarray(_RAS), axis=1)


def _nc_chroma(tc_c, mbh, mbw):
    # chroma sub-block order is raster already
    n = mbh * mbw
    tcm = (tc_c.reshape(mbh, mbw, 2, 2).transpose(0, 2, 1, 3)
           .reshape(2 * mbh, 2 * mbw))
    nc = _nc_from_map(tcm)
    return nc.reshape(mbh, 2, mbw, 2).transpose(0, 2, 1, 3).reshape(n, 4)


def _median3(a, b, c):
    return a + b + c - jnp.maximum(a, jnp.maximum(b, c)) \
        - jnp.minimum(a, jnp.minimum(b, c))


def p16_mv_pred(mv, ref=None):
    """(mbh,mbw,2)[, (mbh,mbw) ref_idx] -> (pmv, pmv_skip_is_zero).
    Device port of the host reference (§8.4.1.3 for an all-P16x16 frame).
    With `ref`, applies the same-refIdx one-neighbour rule
    (§8.4.1.3.1) and the refIdx-0 condition of the P_Skip derivation."""
    mbh, mbw, _ = mv.shape
    if ref is None:
        ref = jnp.zeros((mbh, mbw), jnp.int32)

    def sh(arr, dy, dx, fill=0):
        out = jnp.full_like(arr, fill)
        ys = slice(max(dy, 0), mbh + min(dy, 0))
        xs = slice(max(dx, 0), mbw + min(dx, 0))
        yd = slice(max(-dy, 0), mbh + min(-dy, 0))
        xd = slice(max(-dx, 0), mbw + min(-dx, 0))
        return out.at[yd, xd].set(arr[ys, xs])

    mvA = sh(mv, 0, -1)
    mvB = sh(mv, -1, 0)
    mvC = sh(mv, -1, 1)
    mvD = sh(mv, -1, -1)
    rA = sh(ref, 0, -1)
    rB = sh(ref, -1, 0)
    rC = sh(ref, -1, 1)
    rD = sh(ref, -1, -1)
    yy = jnp.arange(mbh)[:, None] * jnp.ones((1, mbw), jnp.int32)
    xx = jnp.ones((mbh, 1), jnp.int32) * jnp.arange(mbw)[None, :]
    availA = xx > 0
    availB = yy > 0
    availC_raw = (yy > 0) & (xx < mbw - 1)
    availD = (yy > 0) & (xx > 0)
    mvC_eff = jnp.where(availC_raw[..., None], mvC, mvD)
    rC_eff = jnp.where(availC_raw, rC, rD)
    availC = availC_raw | availD

    only_a = availA & ~availB & ~availC
    # refIdx-match rule: exactly one neighbour with the SAME refIdx
    # contributes its mv directly (unavailable neighbours count as
    # refIdx -1, never matching)
    msk_a = availA & (rA == ref)
    msk_b = availB & (rB == ref)
    msk_c = availC & (rC_eff == ref)
    nmatch = msk_a.astype(jnp.int32) + msk_b + msk_c
    zeros = jnp.zeros_like(mv)
    mA = jnp.where(availA[..., None], mvA, zeros)
    mB = jnp.where(availB[..., None], mvB, zeros)
    mC = jnp.where(availC[..., None], mvC_eff, zeros)
    med = _median3(mA, mB, mC)
    one = jnp.where(msk_a[..., None], mvA,
                    jnp.where(msk_b[..., None], mvB, mvC_eff))
    pmv = jnp.where(only_a[..., None], mvA,
                    jnp.where((nmatch == 1)[..., None], one, med))
    zeroA = availA & (rA == 0) & (mvA == 0).all(-1)
    zeroB = availB & (rB == 0) & (mvB == 0).all(-1)
    skip_cond = (~availA) | (~availB) | zeroA | zeroB
    pmv_skip = jnp.where(skip_cond[..., None], 0, pmv)
    return pmv, (pmv_skip == 0).all(-1)


@partial(jax.jit, static_argnames=("rng", "subpel", "me_backend",
                                   "deblock", "dbA", "dbB", "aq_strength",
                                   "qpc_offset", "trellis", "partitions",
                                   "dct8x8"))
def encode_p_slots(src_yuv, ref_y, ref_u, ref_v, qp, qpc, hdr_vals, hdr_lens,
                   rng, subpel=True, me_backend="auto", deblock=False,
                   dbA=0, dbB=0, aq_strength=0.0, qpc_offset=0, trellis=False,
                   qp_off=None, wp=None, partitions=False, dct8x8=False):
    """Fused device program phase 1: unpack uint8 frame -> P encode ->
    syntax slots.  Returns (slot_vals, slot_lens, nbits, recon planes, mv).
    The mv field stays on device — it is the colocated-motion input of the
    next mini-GOP's B frames (spatial direct colZeroFlag, §8.4.1.2.2).
    Phase 2 (pack_phase) runs with a right-sized word capacity chosen from
    nbits on the host — worst-case-sized packing would dominate runtime."""
    from .device import encode_p_frame_core
    H, W = ref_y.shape[-2:]
    ys = H * W
    cs = ys // 4
    sy = src_yuv[:ys].reshape(H, W).astype(jnp.int32)
    su = src_yuv[ys:ys + cs].reshape(H // 2, W // 2).astype(jnp.int32)
    sv = src_yuv[ys + cs:].reshape(H // 2, W // 2).astype(jnp.int32)
    out = encode_p_frame_core(sy, su, sv, ref_y, ref_u, ref_v, qp, qpc,
                              rng, subpel, me_backend,
                              aq_strength=aq_strength, qpc_offset=qpc_offset,
                              trellis=trellis, qp_off=qp_off, wp=wp,
                              partitions=partitions, dct8x8=dct8x8)
    nref = ref_y.shape[0] if ref_y.ndim == 3 else 1
    v, l = _finalize_p_core(out, hdr_vals, hdr_lens, H // 16, W // 16,
                            nref=nref, t8_mode=dct8x8)
    recon = _maybe_deblock(out, qp, H // 16, W // 16, False, deblock, dbA, dbB,
                           qpc_offset=qpc_offset)
    n = (H // 16) * (W // 16)
    return v, l, l.sum(), *recon, colocated_mv(out, n)


def colocated_mv(out, n):
    """Colocated-motion field handed to the next mini-GOP's B frames
    (spatial direct colZeroFlag, §8.4.1.2.2).  colZeroFlag additionally
    requires refIdxCol == 0, so MBs the anchor predicted from ref_idx > 0
    are reported with a large mv — the B core's |mv| <= 1 test then stays
    a conservative lower bound of the decoder's derivation (partitioned
    MBs are already conservative: the core reports their per-component
    max |mv| over the quadrants)."""
    mv = out["mv"].reshape(n, 2)
    if "ref_idx" in out:
        mv = jnp.where((out["ref_idx"].reshape(n) != 0)[:, None],
                       jnp.int32(1 << 12), mv)
    return mv


def b_mv_pred(mv, uses):
    """§8.4.1.3 MV prediction for one list of a B frame with single-entry
    ref lists: a neighbour 'matches' iff it is available AND uses the list
    (refIdx 0 == refIdx 0); non-using neighbours contribute mv 0 to the
    median.  mv: (mbh,mbw,2) the FINAL per-MB mv of this list (0 where the
    MB doesn't use the list or is direct); uses: (mbh,mbw) bool."""
    mbh, mbw, _ = mv.shape

    def sh(arr, dy, dx):
        out = jnp.zeros_like(arr)
        ys = slice(max(dy, 0), arr.shape[0] + min(dy, 0))
        xs = slice(max(dx, 0), arr.shape[1] + min(dx, 0))
        yd = slice(max(-dy, 0), arr.shape[0] + min(-dy, 0))
        xd = slice(max(-dx, 0), arr.shape[1] + min(-dx, 0))
        return out.at[yd, xd].set(arr[ys, xs])

    mvA = sh(mv, 0, -1)
    mvB = sh(mv, -1, 0)
    mvC = sh(mv, -1, 1)
    mvD = sh(mv, -1, -1)
    usA = sh(uses[..., None], 0, -1)[..., 0]
    usB = sh(uses[..., None], -1, 0)[..., 0]
    usC = sh(uses[..., None], -1, 1)[..., 0]
    usD = sh(uses[..., None], -1, -1)[..., 0]
    yy = jnp.arange(mbh)[:, None] * jnp.ones((1, mbw), jnp.int32)
    xx = jnp.ones((mbh, 1), jnp.int32) * jnp.arange(mbw)[None, :]
    availA = xx > 0
    availB = yy > 0
    availC_raw = (yy > 0) & (xx < mbw - 1)
    availD = (yy > 0) & (xx > 0)
    mvC_eff = jnp.where(availC_raw[..., None], mvC, mvD)
    usC_eff = jnp.where(availC_raw, usC, usD)
    availC = availC_raw | availD

    matchA = availA & usA
    matchB = availB & usB
    matchC = availC & usC_eff
    mA = jnp.where(matchA[..., None], mvA, 0)
    mB = jnp.where(matchB[..., None], mvB, 0)
    mC = jnp.where(matchC[..., None], mvC_eff, 0)
    nmatch = matchA.astype(jnp.int32) + matchB + matchC
    med = _median3(mA, mB, mC)
    one = mA + mB + mC                      # exact when nmatch == 1
    only_a = availA & ~availB & ~availC     # MB-level availability
    pmv = jnp.where(only_a[..., None], jnp.where(matchA[..., None], mvA, 0),
                    jnp.where((nmatch == 1)[..., None], one, med))
    return pmv


@partial(jax.jit, static_argnames=("rng", "subpel", "me_backend",
                                   "want_recon", "dct8x8"))
def encode_b_slots(src_yuv, ref0_y, ref0_u, ref0_v, ref1_y, ref1_u, ref1_v,
                   mvcol, qp, qpc, hdr_vals, hdr_lens,
                   rng, subpel=True, me_backend="auto", want_recon=False,
                   dct8x8=False):
    """Fused B-frame phase 1: unpack -> B encode -> syntax slots.
    Returns (slot_vals, slot_lens, nbits) — B is non-reference, so recon is
    only computed (and appended to the return) under want_recon, which the
    session enables for PSNR/SSIM telemetry."""
    from .device import encode_b_frame_core
    H, W = ref0_y.shape
    ys = H * W
    cs = ys // 4
    sy = src_yuv[:ys].reshape(H, W).astype(jnp.int32)
    su = src_yuv[ys:ys + cs].reshape(H // 2, W // 2).astype(jnp.int32)
    sv = src_yuv[ys + cs:].reshape(H // 2, W // 2).astype(jnp.int32)
    out = encode_b_frame_core(sy, su, sv, ref0_y, ref0_u, ref0_v,
                              ref1_y, ref1_u, ref1_v, mvcol, qp, qpc,
                              rng, subpel, me_backend,
                              want_recon=want_recon, dct8x8=dct8x8)
    v, l = _finalize_b_core(out, hdr_vals, hdr_lens, H // 16, W // 16,
                            t8_mode=dct8x8)
    if want_recon:
        return v, l, l.sum(), out["recon_y"], out["recon_u"], out["recon_v"]
    return v, l, l.sum()


def _finalize_b_core(out, hdr_vals, hdr_lens, mbh, mbw,
                     t8_mode: bool = False):
    """B-slice syntax tensors -> CAVLC slot arrays.

    mode: 0=B_Direct_16x16, 1=B_L0_16x16, 2=B_L1_16x16, 3=B_Bi_16x16
    (Table 7-14 values coincide with our mode numbering).  Direct MBs with
    cbp == 0 fold into mb_skip_run (B_Skip)."""
    n = mbh * mbw
    mode = out["mode"]
    mv0 = out["mv0"].reshape(mbh, mbw, 2)
    mv1 = out["mv1"].reshape(mbh, mbw, 2)
    levels = out["levels"]
    cbp_luma = out["cbp_luma"]
    cbp_chroma = out["cbp_chroma"]
    dc_u = out["dc_u"].reshape(n, 4)
    dc_v = out["dc_v"].reshape(n, 4)
    ac_u, ac_v = out["ac_u"], out["ac_v"]

    ac_u = jnp.where((cbp_chroma == 2)[:, None, None], ac_u, 0)
    ac_v = jnp.where((cbp_chroma == 2)[:, None, None], ac_v, 0)
    dc_u = jnp.where((cbp_chroma >= 1)[:, None], dc_u, 0)
    dc_v = jnp.where((cbp_chroma >= 1)[:, None], dc_v, 0)
    cbp = cbp_luma | (cbp_chroma << 4)

    # FINAL per-list mv/usage fields (decoder view: direct MBs use the
    # lists of their flavor at mv 0 — device._direct_flip_mask guarantees
    # the decoder derives exactly this)
    mmap = mode.reshape(mbh, mbw)
    uses0 = out["uses0"].reshape(mbh, mbw)
    uses1 = out["uses1"].reshape(mbh, mbw)
    mvL0 = jnp.where(((mmap == 1) | (mmap == 3))[..., None], mv0, 0)
    mvL1 = jnp.where(((mmap == 2) | (mmap == 3))[..., None], mv1, 0)
    pmv0 = b_mv_pred(mvL0, uses0)
    pmv1 = b_mv_pred(mvL1, uses1)
    mvd0 = (mvL0 - pmv0).reshape(n, 2)
    mvd1 = (mvL1 - pmv1).reshape(n, 2)

    skip = (mode == 0) & (cbp == 0)
    i = jnp.arange(n, dtype=jnp.int32)
    ns = ~skip
    ns_pos = jnp.where(ns, i, -1)
    prev_ns = jnp.concatenate([jnp.full((1,), -1, jnp.int32),
                               jax.lax.cummax(ns_pos)[:-1]])
    runs = jnp.where(ns, i - prev_ns - 1, 0)
    last_ns = jnp.max(ns_pos)
    trailing = n - 1 - last_ns

    quad_coded = ((cbp_luma[:, None] >> (jnp.arange(16) // 4)) & 1).astype(bool)
    levels = jnp.where(quad_coded[:, :, None], levels, 0)

    tc_blk = (levels != 0).sum(-1)
    nc_l = _nc_luma(tc_blk, mbh, mbw)
    nc_cu = _nc_chroma((ac_u != 0).sum(-1), mbh, mbw)
    nc_cv = _nc_chroma((ac_v != 0).sum(-1), mbh, mbw)

    vlu, llu = cj.encode_blocks(levels.reshape(-1, 16), nc_l.reshape(-1), 16)
    vlu = vlu.reshape(n, 16, S)
    llu = jnp.where(quad_coded[:, :, None], llu.reshape(n, 16, S), 0)
    vcdu, lcdu = cj.encode_blocks(dc_u, jnp.full(n, -1), 4)
    vcdv, lcdv = cj.encode_blocks(dc_v, jnp.full(n, -1), 4)
    has_cdc = (cbp_chroma >= 1)[:, None]
    lcdu = jnp.where(has_cdc, lcdu, 0)
    lcdv = jnp.where(has_cdc, lcdv, 0)
    vcau, lcau = cj.encode_blocks(ac_u.reshape(-1, 15), nc_cu.reshape(-1), 15)
    vcav, lcav = cj.encode_blocks(ac_v.reshape(-1, 15), nc_cv.reshape(-1), 15)
    has_cac = (cbp_chroma == 2)[:, None, None]
    vcau = vcau.reshape(n, 4, S)
    lcau = jnp.where(has_cac, lcau.reshape(n, 4, S), 0)
    vcav = vcav.reshape(n, 4, S)
    lcav = jnp.where(has_cac, lcav.reshape(n, 4, S), 0)

    # header slots: [skip_run, mb_type, mvd0x, mvd0y, mvd1x, mvd1y, cbp,
    # t8, qpd] — t8 is always 0 (B cores stay 4x4) but the bit must exist
    # when the PPS enables the 8x8 mode
    hv = jnp.zeros((n, 9), jnp.uint32)
    hl = jnp.zeros((n, 9), jnp.int32)
    rv, rl = cj.ue_codes_j(runs)
    hv = hv.at[:, 0].set(rv)
    hl = hl.at[:, 0].set(rl)
    tv, tl = cj.ue_codes_j(mode)
    hv = hv.at[:, 1].set(tv)
    hl = hl.at[:, 1].set(tl)
    has0 = (mode == 1) | (mode == 3)
    has1 = (mode == 2) | (mode == 3)
    for k, (mvd, hasl) in enumerate(((mvd0, has0), (mvd1, has1))):
        xv, xl = cj.se_codes_j(mvd[:, 0])
        yv, yl = cj.se_codes_j(mvd[:, 1])
        hv = hv.at[:, 2 + 2 * k].set(xv)
        hl = hl.at[:, 2 + 2 * k].set(jnp.where(hasl, xl, 0))
        hv = hv.at[:, 3 + 2 * k].set(yv)
        hl = hl.at[:, 3 + 2 * k].set(jnp.where(hasl, yl, 0))
    bv, bl = cj.ue_codes_j(jnp.asarray(CBP_TO_CODE_J)[0, cbp])
    hv = hv.at[:, 6].set(bv)
    hl = hl.at[:, 6].set(bl)
    if t8_mode:
        hv = hv.at[:, 7].set(out.get("t8", jnp.zeros((n,), jnp.int32))
                             .astype(jnp.uint32))
        hl = hl.at[:, 7].set(jnp.where(cbp_luma != 0, 1, 0))
    hv = hv.at[:, 8].set(1)
    hl = hl.at[:, 8].set(jnp.where(cbp != 0, 1, 0))  # se(0) qp_delta

    mb_vals = jnp.concatenate([
        hv, vlu.reshape(n, -1), vcdu, vcdv,
        vcau.reshape(n, -1), vcav.reshape(n, -1)], axis=1)
    mb_lens = jnp.concatenate([
        hl, llu.reshape(n, -1), lcdu, lcdv,
        lcau.reshape(n, -1), lcav.reshape(n, -1)], axis=1)
    mb_lens = jnp.where(skip[:, None], 0, mb_lens)

    tv2, tl2 = cj.ue_codes_j(jnp.maximum(trailing, 0))
    tl2 = jnp.where(trailing > 0, tl2, 0)
    body_bits = hdr_lens.sum() + mb_lens.sum() + tl2
    pad = (-(body_bits + 1)) % 8
    tail_vals = jnp.concatenate([
        tv2[None], jnp.ones((1,), jnp.uint32) << pad.astype(jnp.uint32)])
    tail_lens = jnp.concatenate([tl2[None], (1 + pad)[None]])
    return _stack_rows(hdr_vals, hdr_lens, mb_vals, mb_lens,
                       tail_vals, tail_lens)


@partial(jax.jit, static_argnames=("cap_words",))
def pack_phase(vals, lens, cap_words):
    return pack_slots(vals, lens, cap_words)


@partial(jax.jit, static_argnames=("rng", "subpel", "me_backend",
                                   "dct8x8"))
def encode_bgop_slots(rows, r0y, r0u, r0v, r1y, r1u, r1v, mvcols,
                      qps, qpcs, hdr_vals, hdr_lens, rng, subpel,
                      me_backend="auto", dct8x8=False):
    """Batched B-frame phase 1: Gb independent B frames in one program.

    B frames have no recon dependency on each other, so the scan carries
    nothing — it exists to bound peak memory (one frame's ME intermediates
    at a time) while still amortizing the dispatch.  Reference planes are
    stacked per frame (Gb, H, W) uint8 (the anchors' recons), mvcols
    (Gb, mbh, mbw, 2) the colocated anchor motion.
    Returns (slot_vals (Gb, R, L), slot_lens (Gb, R, L)).
    """
    from .device import encode_b_frame_core
    H, W = r0y.shape[-2:]
    ys = H * W
    cs = ys // 4
    mbh, mbw = H // 16, W // 16

    def step(_, xs):
        row, a0y, a0u, a0v, a1y, a1u, a1v, mvc, hv, hl, qp, qpc = xs
        sy = row[:ys].reshape(H, W).astype(jnp.int32)
        su = row[ys:ys + cs].reshape(H // 2, W // 2).astype(jnp.int32)
        sv = row[ys + cs:].reshape(H // 2, W // 2).astype(jnp.int32)
        out = encode_b_frame_core(
            sy, su, sv, a0y.astype(jnp.int32), a0u.astype(jnp.int32),
            a0v.astype(jnp.int32), a1y.astype(jnp.int32),
            a1u.astype(jnp.int32), a1v.astype(jnp.int32), mvc, qp, qpc,
            rng, subpel, me_backend, want_recon=False, dct8x8=dct8x8)
        v, l = _finalize_b_core(out, hv, hl, mbh, mbw, t8_mode=dct8x8)
        return 0, (v, l)

    _, (vs, ls) = jax.lax.scan(
        step, 0, (rows, r0y, r0u, r0v, r1y, r1u, r1v, mvcols,
                  hdr_vals, hdr_lens, qps, qpcs))
    return vs, ls


@partial(jax.jit, static_argnames=("rng", "subpel",
                                   "me_backend", "deblock", "dbA", "dbB",
                                   "aq_strength", "qpc_offset", "trellis",
                                   "partitions", "dct8x8", "has_qp_off",
                                   "want_mv", "want_recons"))
def encode_pgop_slots(frames_yuv, ref_y, ref_u, ref_v, qps, qpcs,
                      hdr_vals, hdr_lens, rng, subpel,
                      me_backend="auto", deblock=False, dbA=0, dbB=0,
                      aq_strength=0.0, qpc_offset=0, trellis=False,
                      partitions=False, dct8x8=False, qp_offs=None,
                      has_qp_off=False, want_mv=False, want_recons=False):
    """Batched P-frame encoding phase 1: G frames in ONE device program.

    A lax.scan carries the reconstruction between frames; each step encodes
    and finalizes its frame to slot arrays.  Packing runs OUTSIDE the scan
    (pack_gop below): the packer's word-boundary searchsorted degrades by
    ~10x when embedded in a loop body (XLA:TPU serializes the gathers), so
    the scan stacks the slot arrays and the caller packs per frame at top
    level.

    frames_yuv: (G, H*W*3//2) uint8; hdr_vals/lens: (G, MAX_HDR);
    qps/qpcs: (G,) per-frame QP (rate control decides per frame);
    qp_offs: (G, n) per-MB QP offsets (MB-tree) when has_qp_off.
    ref planes may be a multi-reference stack (R, H, W): the scan then
    carries the whole sliding DPB window (newest first).
    Returns (slot_vals (G, R, L), slot_lens (G, R, L), recon planes
    [, mv stack (G, mbh, mbw, 2) when want_mv]).
    """
    from .device import encode_p_frame_core
    multi = ref_y.ndim == 3
    H, W = ref_y.shape[-2:]
    ys = H * W
    cs = ys // 4
    mbh, mbw = H // 16, W // 16
    nref = ref_y.shape[0] if multi else 1

    def step(ref, xs):
        if has_qp_off:
            row, hv, hl, qp, qpc, qo = xs
        else:
            (row, hv, hl, qp, qpc), qo = xs, None
        sy = row[:ys].reshape(H, W).astype(jnp.int32)
        su = row[ys:ys + cs].reshape(H // 2, W // 2).astype(jnp.int32)
        sv = row[ys + cs:].reshape(H // 2, W // 2).astype(jnp.int32)
        out = encode_p_frame_core(sy, su, sv, *ref, qp, qpc, rng, subpel,
                                  me_backend, aq_strength=aq_strength,
                                  qpc_offset=qpc_offset, trellis=trellis,
                                  qp_off=qo, partitions=partitions,
                                  dct8x8=dct8x8)
        v, l = _finalize_p_core(out, hv, hl, mbh, mbw, nref=nref,
                                t8_mode=dct8x8)
        rec = _maybe_deblock(out, qp, mbh, mbw, False, deblock, dbA, dbB,
                             qpc_offset=qpc_offset)
        if multi:
            # slide the DPB window: newest recon enters at ref_idx 0
            new_ref = tuple(
                jnp.concatenate([r[None], old[:-1]], axis=0)
                for r, old in zip(rec, ref))
        else:
            new_ref = rec
        outs = (v, l)
        if want_mv:
            outs += (colocated_mv(out, mbh * mbw),)  # (n,2) mvcol shape
        if want_recons:
            # per-frame recon stack (uint8: 4x smaller pull/HBM than int32)
            # — the B mini-GOP batch reads anchors' recons as references
            outs += tuple(p.astype(jnp.uint8) for p in rec)
        return new_ref, outs

    xs = (frames_yuv, hdr_vals, hdr_lens, qps, qpcs)
    if has_qp_off:
        xs += (qp_offs,)
    ref_fin, outs = jax.lax.scan(step, (ref_y, ref_u, ref_v), xs)
    return (*outs[:2], ref_fin[0], ref_fin[1], ref_fin[2]) + tuple(outs[2:])


def encode_pgop_packed(frames_yuv, ref_y, ref_u, ref_v, qp, qpc,
                       hdr_vals, hdr_lens, rng, subpel, bucket_words,
                       me_backend="auto", deblock=False, dbA=0, dbB=0,
                       aq_strength=0.0, qpc_offset=0, trellis=False,
                       partitions=False, dct8x8=False, qp_offs=None,
                       want_mv=False, want_recons=False):
    """Batched P-frame encode + pack: phase-1 scan then per-frame top-level
    pack dispatches (see encode_pgop_slots for why packing is hoisted).

    qp/qpc may be scalars or (G,) arrays (per-frame rate control).
    Returns (bytes (G, bucket*4), nbits (G,), recon planes
    [, mv stack when want_mv][, per-frame uint8 recon stacks when
    want_recons]).
    """
    G = frames_yuv.shape[0]
    qps = jnp.broadcast_to(jnp.asarray(qp, jnp.int32), (G,))
    qpcs = jnp.broadcast_to(jnp.asarray(qpc, jnp.int32), (G,))
    res = encode_pgop_slots(
        frames_yuv, ref_y, ref_u, ref_v, qps, qpcs, hdr_vals, hdr_lens,
        rng, subpel, me_backend, deblock, dbA, dbB,
        aq_strength, qpc_offset, trellis, partitions, dct8x8,
        qp_offs=qp_offs, has_qp_off=qp_offs is not None, want_mv=want_mv,
        want_recons=want_recons)
    vs, ls = res[0], res[1]
    rest = res[2:]
    datas, nbits = pack_batch(vs, ls, bucket_words)
    return (datas, nbits) + tuple(rest)


@partial(jax.jit, static_argnames=("cap_words",))
def pack_batch(vs, ls, cap_words: int):
    """Pack a (G, R, L) slot batch in ONE dispatch.

    The G packs are UNROLLED inside one jit: as separate dispatches each
    pack pays ~3 ms of per-dispatch overhead on top of its ~4 ms compute
    (measured at 1080p G=12), and a vmapped form is 3x worse still (the
    batched searchsorted lowers to a pathological gather)."""
    G = vs.shape[0]
    outs = [pack_slots(vs[k], ls[k], cap_words) for k in range(G)]
    return (jnp.stack([o[0] for o in outs]),
            jnp.stack([o[1] for o in outs]))


def encode_i_slots_fn(H: int, W: int, deblock: bool = False,
                      dbA: int = 0, dbB: int = 0, qpc_offset: int = 0,
                      i4x4: bool = False, dct8x8: bool = False):
    """Returns a jitted fused I-frame phase-1 program for a geometry.

    Deliberately a PER-SESSION jitted closure, NOT a shared module-level
    jit with static geometry args: on jax 0.9 XLA:CPU, the second
    static-args entry of one pjit whose trace captures concrete device
    constants dispatches with only the runtime args ("Execution supplied 5
    buffers but compiled program expected 66").  Separate closures compile
    separate executables and dodge that path.  The persistent compilation
    cache must also stay off on CPU (utils/cache.py) — reloaded CPU AOT
    artifacts lose the same captured-constant bindings.
    """
    from .device import encode_i_frame_core

    @jax.jit
    def fn(src_yuv, qp, qpc, hdr_vals, hdr_lens):
        ys = H * W
        cs = ys // 4
        sy = src_yuv[:ys].reshape(H, W).astype(jnp.int32)
        su = src_yuv[ys:ys + cs].reshape(H // 2, W // 2).astype(jnp.int32)
        sv = src_yuv[ys + cs:].reshape(H // 2, W // 2).astype(jnp.int32)
        out = encode_i_frame_core(sy, su, sv, qp, qpc, i4x4)
        v, l = _finalize_i_core(out, hdr_vals, hdr_lens, H // 16, W // 16,
                                t8_mode=dct8x8)
        recon = _maybe_deblock(out, qp, H // 16, W // 16, True, deblock,
                               dbA, dbB, qpc_offset=qpc_offset)
        return v, l, l.sum(), *recon

    return fn


def _maybe_deblock(out, qp, mbh, mbw, intra, deblock, dbA, dbB,
                   qpc_offset=0):
    if not deblock:
        return out["recon_y"], out["recon_u"], out["recon_v"]
    from .device import apply_loop_filter
    return apply_loop_filter(out, qp, mbh, mbw, intra,
                             offA=2 * dbA, offB=2 * dbB,
                             qpc_offset=qpc_offset)


@partial(jax.jit, static_argnames=("mbh", "mbw", "cap_words"))
def finalize_p(out, hdr_vals, hdr_lens, mbh, mbw, cap_words):
    v, l = _finalize_p_core(out, hdr_vals, hdr_lens, mbh, mbw)
    return pack_slots(v, l, cap_words)


def _finalize_p_core(out, hdr_vals, hdr_lens, mbh, mbw, nref: int = 1,
                     t8_mode: bool = False):
    """P-slice syntax tensors -> (packed bytes, total_bits)."""
    n = mbh * mbw
    mv = out["mv"].reshape(mbh, mbw, 2)
    ref_idx = (out["ref_idx"].reshape(mbh, mbw) if "ref_idx" in out
               else None)
    levels = out["levels"]
    cbp_luma = out["cbp_luma"]
    cbp_chroma = out["cbp_chroma"]
    dc_u = out["dc_u"].reshape(n, 4)
    dc_v = out["dc_v"].reshape(n, 4)
    ac_u, ac_v = out["ac_u"], out["ac_v"]

    ac_u = jnp.where((cbp_chroma == 2)[:, None, None], ac_u, 0)
    ac_v = jnp.where((cbp_chroma == 2)[:, None, None], ac_v, 0)
    dc_u = jnp.where((cbp_chroma >= 1)[:, None], dc_u, 0)
    dc_v = jnp.where((cbp_chroma >= 1)[:, None], dc_v, 0)
    cbp = cbp_luma | (cbp_chroma << 4)

    part = out.get("part")
    if part is not None:
        from .inter_partition import partition_mvds
        mv8 = out["mv8"]
        mvd8, nslot, skip_zero8 = partition_mvds(mv8, part.reshape(mbh, mbw))
        mv00 = mv8[0::2, 0::2].reshape(n, 2)
        skip = ((cbp == 0) & (part == 0) & (mv00 == 0).all(axis=1)
                & skip_zero8.reshape(n))
        # mvd pairs in quadrant raster order == partition decode order for
        # every layout; inactive slots are zero-length and vanish
        mvd4 = (mvd8.reshape(mbh, 2, mbw, 2, 2).transpose(0, 2, 1, 3, 4)
                .reshape(n, 4, 2))
        nsl4 = (nslot.reshape(mbh, 2, mbw, 2).transpose(0, 2, 1, 3)
                .reshape(n, 4))
        mvd = mvd4[:, 0]                       # 16x16 slot shares hv[3:5]
    else:
        pmv, skip_zero = p16_mv_pred(mv, ref_idx)
        mv_flat = mv.reshape(n, 2)
        skip = ((cbp == 0) & (mv_flat == 0).all(axis=1)
                & skip_zero.reshape(n))
        if ref_idx is not None:
            skip = skip & (ref_idx.reshape(n) == 0)  # P_Skip is refIdx 0
        mvd = mv_flat - pmv.reshape(n, 2)

    i = jnp.arange(n, dtype=jnp.int32)
    ns = ~skip
    ns_pos = jnp.where(ns, i, -1)
    prev_ns = jnp.concatenate([jnp.full((1,), -1, jnp.int32),
                               jax.lax.cummax(ns_pos)[:-1]])
    runs = jnp.where(ns, i - prev_ns - 1, 0)
    last_ns = jnp.max(ns_pos)
    trailing = n - 1 - last_ns

    quad_coded = ((cbp_luma[:, None] >> (jnp.arange(16) // 4)) & 1).astype(bool)
    levels = jnp.where(quad_coded[:, :, None], levels, 0)

    tc_blk = (levels != 0).sum(-1)
    nc_l = _nc_luma(tc_blk, mbh, mbw)
    nc_cu = _nc_chroma((ac_u != 0).sum(-1), mbh, mbw)
    nc_cv = _nc_chroma((ac_v != 0).sum(-1), mbh, mbw)

    vlu, llu = cj.encode_blocks(levels.reshape(-1, 16), nc_l.reshape(-1), 16)
    vlu = vlu.reshape(n, 16, S)
    llu = jnp.where(quad_coded[:, :, None], llu.reshape(n, 16, S), 0)
    vcdu, lcdu = cj.encode_blocks(dc_u, jnp.full(n, -1), 4)
    vcdv, lcdv = cj.encode_blocks(dc_v, jnp.full(n, -1), 4)
    has_cdc = (cbp_chroma >= 1)[:, None]
    lcdu = jnp.where(has_cdc, lcdu, 0)
    lcdv = jnp.where(has_cdc, lcdv, 0)
    vcau, lcau = cj.encode_blocks(ac_u.reshape(-1, 15), nc_cu.reshape(-1), 15)
    vcav, lcav = cj.encode_blocks(ac_v.reshape(-1, 15), nc_cv.reshape(-1), 15)
    has_cac = (cbp_chroma == 2)[:, None, None]
    vcau = vcau.reshape(n, 4, S)
    lcau = jnp.where(has_cac, lcau.reshape(n, 4, S), 0)
    vcav = vcav.reshape(n, 4, S)
    lcav = jnp.where(has_cac, lcav.reshape(n, 4, S), 0)

    NS = 8 if part is None else 17
    hv = jnp.zeros((n, NS), jnp.uint32)
    hl = jnp.zeros((n, NS), jnp.int32)
    rv, rl = cj.ue_codes_j(runs)
    hv = hv.at[:, 0].set(rv)
    hl = hl.at[:, 0].set(rl)
    if part is None:
        hv = hv.at[:, 1].set(1)
        hl = hl.at[:, 1].set(1)  # ue(P_L0_16x16 = 0)
        if nref > 1 and ref_idx is not None:
            rif = ref_idx.reshape(n)
            if nref == 2:       # te(v), range 1: single bit = !value
                refv = 1 - rif.astype(jnp.uint32)
                refl = jnp.ones(n, jnp.int32)
            else:               # te(v), range > 1: ue(v)
                refv, refl = cj.ue_codes_j(rif)
            hv = hv.at[:, 2].set(refv)
            hl = hl.at[:, 2].set(refl)
        xv, xl = cj.se_codes_j(mvd[:, 0])
        yv, yl = cj.se_codes_j(mvd[:, 1])
        hv = hv.at[:, 3].set(xv)
        hl = hl.at[:, 3].set(xl)
        hv = hv.at[:, 4].set(yv)
        hl = hl.at[:, 4].set(yl)
        CBP_SLOT, T8_SLOT, QPD_SLOT = 5, 6, 7
    else:
        # [run, mb_type, sub0..3, (mvdx, mvdy) x 4 quad slots, cbp, qpd]
        tv_, tl_ = cj.ue_codes_j(part)
        hv = hv.at[:, 1].set(tv_)
        hl = hl.at[:, 1].set(tl_)
        is8 = (part == 3)
        for s in range(4):      # sub_mb_type = P_L0_8x8 -> ue(0) = '1'
            hv = hv.at[:, 2 + s].set(1)
            hl = hl.at[:, 2 + s].set(jnp.where(is8, 1, 0))
        for s in range(4):
            xv, xl = cj.se_codes_j(mvd4[:, s, 0])
            yv, yl = cj.se_codes_j(mvd4[:, s, 1])
            act = nsl4[:, s]
            hv = hv.at[:, 6 + 2 * s].set(xv)
            hl = hl.at[:, 6 + 2 * s].set(jnp.where(act, xl, 0))
            hv = hv.at[:, 7 + 2 * s].set(yv)
            hl = hl.at[:, 7 + 2 * s].set(jnp.where(act, yl, 0))
        CBP_SLOT, T8_SLOT, QPD_SLOT = 14, 15, 16
    bv, bl = cj.ue_codes_j(jnp.asarray(CBP_TO_CODE_J)[0, cbp])
    hv = hv.at[:, CBP_SLOT].set(bv)
    hl = hl.at[:, CBP_SLOT].set(bl)
    if t8_mode or "t8" in out:
        # transform_size_8x8_flag (§7.3.5): coded only when luma cbp != 0.
        # When the PPS enables the 8x8 mode every eligible coded MB must
        # carry the bit, so paths without a device decision emit 0.
        t8 = out.get("t8", jnp.zeros((n,), jnp.int32))
        hv = hv.at[:, T8_SLOT].set(t8.astype(jnp.uint32))
        hl = hl.at[:, T8_SLOT].set(jnp.where(cbp_luma != 0, 1, 0))
    if "qp_delta" in out:        # per-MB AQ: real se(mb_qp_delta) codes
        qv, ql = cj.se_codes_j(out["qp_delta"])
        hv = hv.at[:, QPD_SLOT].set(qv)
        hl = hl.at[:, QPD_SLOT].set(jnp.where(cbp != 0, ql, 0))
    else:
        hv = hv.at[:, QPD_SLOT].set(1)
        hl = hl.at[:, QPD_SLOT].set(jnp.where(cbp != 0, 1, 0))

    mb_vals = jnp.concatenate([
        hv, vlu.reshape(n, -1), vcdu, vcdv,
        vcau.reshape(n, -1), vcav.reshape(n, -1)], axis=1)
    mb_lens = jnp.concatenate([
        hl, llu.reshape(n, -1), lcdu, lcdv,
        lcau.reshape(n, -1), lcav.reshape(n, -1)], axis=1)
    mb_lens = jnp.where(skip[:, None], 0, mb_lens)

    # trailing skip run + rbsp trailing bits
    tv, tl = cj.ue_codes_j(jnp.maximum(trailing, 0))
    tl = jnp.where(trailing > 0, tl, 0)
    body_bits = hdr_lens.sum() + mb_lens.sum() + tl
    pad = (-(body_bits + 1)) % 8
    tail_vals = jnp.concatenate([
        tv[None], jnp.ones((1,), jnp.uint32) << pad.astype(jnp.uint32)])
    tail_lens = jnp.concatenate([tl[None], (1 + pad)[None]])
    return _stack_rows(hdr_vals, hdr_lens, mb_vals, mb_lens,
                       tail_vals, tail_lens)


def _stack_rows(hdr_vals, hdr_lens, mb_vals, mb_lens, tail_vals, tail_lens):
    """Assemble the slice's slot stream as a 2D (rows, L) array: one row of
    header codes, n rows of per-MB codes, one row of tail codes — row-major
    order IS the bitstream order, and the 2D shape lets the packer use the
    cheap two-level cumsum."""
    L = mb_vals.shape[1]
    hv = jnp.zeros((1, L), jnp.uint32).at[0, :hdr_vals.shape[0]].set(
        hdr_vals.astype(jnp.uint32))
    hl = jnp.zeros((1, L), jnp.int32).at[0, :hdr_lens.shape[0]].set(
        hdr_lens.astype(jnp.int32))
    tv = jnp.zeros((1, L), jnp.uint32).at[0, :tail_vals.shape[0]].set(
        tail_vals.astype(jnp.uint32))
    tl = jnp.zeros((1, L), jnp.int32).at[0, :tail_lens.shape[0]].set(
        tail_lens.astype(jnp.int32))
    return (jnp.concatenate([hv, mb_vals, tv]),
            jnp.concatenate([hl, mb_lens, tl]))


@partial(jax.jit, static_argnames=("mbh", "mbw", "cap_words"))
def finalize_i(out, hdr_vals, hdr_lens, mbh, mbw, cap_words):
    v, l = _finalize_i_core(out, hdr_vals, hdr_lens, mbh, mbw)
    return pack_slots(v, l, cap_words)


def _finalize_i_core(out, hdr_vals, hdr_lens, mbh, mbw,
                     t8_mode: bool = False):
    """I-slice syntax tensors -> slot rows (mixed I16x16 / I_NxN MBs)."""
    n = mbh * mbw
    dc = out["dc"]
    ac = out["ac"]
    cbp_luma_nz = out["cbp_luma_nz"]
    cbp_chroma = out["cbp_chroma"]
    dc_u = out["dc_u"].reshape(n, 4)
    dc_v = out["dc_v"].reshape(n, 4)
    ac_u, ac_v = out["ac_u"], out["ac_v"]

    i16_mode = out["i16_mode"]
    chroma_mode = out["cmode"]
    mb_type = 1 + i16_mode + 4 * cbp_chroma + 12 * cbp_luma_nz

    use_i4 = out.get("use_i4")
    if use_i4 is None:
        use_i4 = jnp.zeros((n,), bool)
        levels4 = jnp.zeros((n, 16, 16), jnp.int32)
        i4_prev = jnp.zeros((n, 16), bool)
        i4_rem = jnp.zeros((n, 16), jnp.int32)
        cbp4 = jnp.zeros((n,), jnp.int32)
    else:
        levels4 = out["levels4"]
        i4_prev = out["i4_prev"]
        i4_rem = out["i4_rem"]
        cbp4 = out["cbp_luma4"]
    mb_type = jnp.where(use_i4, 0, mb_type)

    ac = jnp.where(cbp_luma_nz[:, None, None] & ~use_i4[:, None, None],
                   ac, 0)
    ac_u = jnp.where((cbp_chroma == 2)[:, None, None], ac_u, 0)
    ac_v = jnp.where((cbp_chroma == 2)[:, None, None], ac_v, 0)
    dc_u = jnp.where((cbp_chroma >= 1)[:, None], dc_u, 0)
    dc_v = jnp.where((cbp_chroma >= 1)[:, None], dc_v, 0)

    # unified per-block total_coeff map: I_NxN blocks count all 16 coeffs,
    # I16 blocks their 15 AC coeffs (§9.2.1 nC derivation)
    tc_blk = jnp.where(use_i4[:, None], (levels4 != 0).sum(-1),
                       (ac != 0).sum(-1))
    nc_l = _nc_luma(tc_blk, mbh, mbw)
    nc_cu = _nc_chroma((ac_u != 0).sum(-1), mbh, mbw)
    nc_cv = _nc_chroma((ac_v != 0).sum(-1), mbh, mbw)

    vdc, ldc = cj.encode_blocks(dc, nc_l[:, 0], 16)
    ldc = jnp.where(use_i4[:, None], 0, ldc)
    vac, lac = cj.encode_blocks(ac.reshape(-1, 15), nc_l.reshape(-1), 15)
    vac = vac.reshape(n, 16, S)
    lac = jnp.where((cbp_luma_nz & ~use_i4)[:, None, None],
                    lac.reshape(n, 16, S), 0)
    # I_NxN luma residual: 16-coeff blocks, coded iff the 8x8 quadrant's
    # cbp bit is set
    vl4, ll4 = cj.encode_blocks(levels4.reshape(-1, 16),
                                nc_l.reshape(-1), 16)
    quad4 = ((cbp4[:, None] >> (jnp.arange(16) // 4)) & 1).astype(bool)
    vl4 = vl4.reshape(n, 16, S)
    ll4 = jnp.where((use_i4[:, None] & quad4)[:, :, None],
                    ll4.reshape(n, 16, S), 0)
    vcdu, lcdu = cj.encode_blocks(dc_u, jnp.full(n, -1), 4)
    vcdv, lcdv = cj.encode_blocks(dc_v, jnp.full(n, -1), 4)
    has_cdc = (cbp_chroma >= 1)[:, None]
    lcdu = jnp.where(has_cdc, lcdu, 0)
    lcdv = jnp.where(has_cdc, lcdv, 0)
    vcau, lcau = cj.encode_blocks(ac_u.reshape(-1, 15), nc_cu.reshape(-1), 15)
    vcav, lcav = cj.encode_blocks(ac_v.reshape(-1, 15), nc_cv.reshape(-1), 15)
    has_cac = (cbp_chroma == 2)[:, None, None]
    vcau = vcau.reshape(n, 4, S)
    lcau = jnp.where(has_cac, lcau.reshape(n, 4, S), 0)
    vcav = vcav.reshape(n, 4, S)
    lcav = jnp.where(has_cac, lcav.reshape(n, 4, S), 0)

    # header slots: [mb_type, t8, 16 x intra4x4 pred modes, cmode, cbp,
    # qpd] — t8 (transform_size_8x8_flag, always 0: no Intra_8x8 yet) is
    # coded by I_NxN MBs when the PPS enables the 8x8 mode (§7.3.5)
    hv = jnp.zeros((n, 21), jnp.uint32)
    hl = jnp.zeros((n, 21), jnp.int32)
    tv, tl = cj.ue_codes_j(mb_type)
    hv = hv.at[:, 0].set(tv)
    hl = hl.at[:, 0].set(tl)
    if t8_mode:
        hl = hl.at[:, 1].set(jnp.where(use_i4, 1, 0))
    # prev_intra4x4_pred_mode_flag (+ rem): '1' (1 bit) or '0rrr' (4 bits)
    pmv = jnp.where(i4_prev, 1, i4_rem).astype(jnp.uint32)
    pml = jnp.where(use_i4[:, None], jnp.where(i4_prev, 1, 4), 0)
    hv = hv.at[:, 2:18].set(pmv)
    hl = hl.at[:, 2:18].set(pml.astype(jnp.int32))
    cv, cl = cj.ue_codes_j(chroma_mode)
    hv = hv.at[:, 18].set(cv)
    hl = hl.at[:, 18].set(cl)
    # coded_block_pattern, me() intra mapping (I_NxN only)
    from ..bitstream.mb_syntax import CBP_TO_CODE
    code = jnp.asarray(CBP_TO_CODE[1])[cbp4 | (cbp_chroma << 4)]
    bv, bl = cj.ue_codes_j(code)
    hv = hv.at[:, 19].set(bv)
    hl = hl.at[:, 19].set(jnp.where(use_i4, bl, 0))
    # mb_qp_delta se(0): always for I16, only when cbp != 0 for I_NxN
    qpd_on = ~use_i4 | (cbp4 != 0) | (cbp_chroma != 0)
    hv = hv.at[:, 20].set(1)
    hl = hl.at[:, 20].set(jnp.where(qpd_on, 1, 0))

    mb_vals = jnp.concatenate([
        hv, vdc, vac.reshape(n, -1), vl4.reshape(n, -1), vcdu, vcdv,
        vcau.reshape(n, -1), vcav.reshape(n, -1)], axis=1)
    mb_lens = jnp.concatenate([
        hl, ldc, lac.reshape(n, -1), ll4.reshape(n, -1), lcdu, lcdv,
        lcau.reshape(n, -1), lcav.reshape(n, -1)], axis=1)

    body_bits = hdr_lens.sum() + mb_lens.sum()
    pad = (-(body_bits + 1)) % 8
    tail_vals = jnp.ones((1,), jnp.uint32) << pad.astype(jnp.uint32)
    tail_lens = (1 + pad)[None]
    return _stack_rows(hdr_vals, hdr_lens, mb_vals, mb_lens,
                       tail_vals, tail_lens)
