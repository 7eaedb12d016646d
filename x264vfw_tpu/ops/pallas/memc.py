"""Pallas TPU kernel: fused subpel refine + motion compensation.

Replaces the XLA masked-shift alignment / refine / MC pipeline of the
partition path (encode/inter_partition._refine_and_mc_xla) with ONE kernel
that keeps a macroblock row's reference band resident in VMEM:

  * the spec half-pel planes (b/h/j, §8.4.2.2.1) are computed band-locally
    (the XLA path builds three full-frame planes in HBM),
  * the h-then-v masked alignment at the integer-best offset runs entirely
    in VMEM (the XLA lax.scan streams (qh, 26, W)-sized accumulators
    through HBM K times per plane),
  * the 25 quarter-pel refine candidates, their partition-grouped SAD
    argmin, and the final prediction (a select over the same candidates)
    never leave VMEM.

HBM traffic drops from O(K * frame * planes) to O(frame): one band read +
one prediction write per MB row — the speed-of-light for this operation.

Bit-exactness: every intermediate matches _refine_and_mc_xla exactly —
int32 arithmetic, the same candidate order, the same lexicographic
(cost, index) tie-break as jnp.argmin, and the same EXACT alignment
semantics: per plane/half, THREE aligned variants (horizontal operand
offset o = -1/0/+1) are built by shifting the slice under each column's
OWN block mask, so a candidate read never crosses into a neighbour
block's alignment (a single wider array indexed at x + o is wrong at
interior 8-px block seams and broke conformance vs FFmpeg).  Validated by
tests/test_pallas_memc.py in interpret mode and by the cross-backend
byte-identical encoder test.

Capability replaced: libx264 subpel refine + MC inner loops
(/root/reference/codec.c:892-896 me/subme surface).

Mosaic constraints shaping the code (probed on real TPU, see
ops/pallas/sad.py): int16 vector ops other than add/xor fail to legalize,
so all arithmetic is int32 with int16 VMEM storage; dynamic sublane
indices must be 8-aligned, so every slice offset here is static (python
loops over shift/candidate indices); accumulations write through VMEM
scratch refs statement-by-statement to bound Mosaic's per-statement stack
allocations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...encode.device import _qpel_operands


def _deltas():
    return [(tx, ty) for ty in range(-2, 3) for tx in range(-2, 3)]


# (plane, o = ox+1) alignment variants actually reachable from the 25
# qpel candidates' operands (enumerated from _qpel_operands over the
# [-2,2]^2 grid) — building all 12 would double the alignment work
_VARIANTS = ((0, 1), (1, 0), (1, 1), (2, 1), (3, 0), (3, 1))
_VIDX = {po: i for i, po in enumerate(_VARIANTS)}
_NVAR = len(_VARIANTS)
_PLANE_OS = {p: tuple(o for (pp, o) in _VARIANTS if pp == p)
             for p in range(4)}


def _cand(alg_ref, b: int, op1, op2, Wp: int):
    """Candidate prediction (8, Wp) i32 from the aligned-plane scratch.

    alg slot layout: rows [(b*_NVAR + _VIDX[p, ox+1]) * 16, +10) hold
    plane p of half b at horizontal operand offset ox, rows oy-1..oy+9,
    cols x = 0..Wp — each variant is exactly aligned per column, so a
    read never shifts columns."""
    def read(op):
        p_, ox_, oy_ = op
        base = (b * _NVAR + _VIDX[(p_, ox_ + 1)]) * 16
        return alg_ref[base + 1 + oy_: base + 9 + oy_, 0:Wp].astype(jnp.int32)

    a = read(op1)
    return a if op1 == op2 else (a + read(op2) + 1) >> 1


def _memc_kernel(src_ref, band_ref, maps_ref, hck_ref, pred_ref, mv_ref,
                 b1_ref, bs_ref, hs_ref, js_ref, hacc_ref, alg_ref, rs_ref,
                 *, R: int, W: int, Wp: int, Lq: int, BH: int, BW: int):
    i16, i32, f32 = jnp.int16, jnp.int32, jnp.float32
    K = 2 * R + 1
    NA = 2 * R + 10                 # aligned h-pass rows per half
    HS = (NA + 7) // 8 * 8          # 8-aligned hacc slot height
    OPS = [_qpel_operands(tx, ty) for tx, ty in _deltas()]
    NC = len(OPS)

    # ---- half-pel planes of the band (b/h/j, 6-tap §8.4.2.2.1) ----
    # storage convention: bs[y, c] = b at band col c+2; hs[r, x] = h at band
    # row r+2; js[r, c] = j at (row r+2, col c+2).  Valid: cols < BW-5,
    # rows < BH-5 — every later read stays inside by construction.
    BWv = BW - 5
    BHv = BH - 5
    band32 = band_ref[0].astype(i32)
    b1 = (band32[:, 0:BWv] - 5 * band32[:, 1:1 + BWv]
          + 20 * band32[:, 2:2 + BWv] + 20 * band32[:, 3:3 + BWv]
          - 5 * band32[:, 4:4 + BWv] + band32[:, 5:5 + BWv])
    b1_ref[:, 0:BWv] = b1
    bs_ref[:, 0:BWv] = jnp.clip((b1 + 16) >> 5, 0, 255).astype(i16)
    h1 = (band32[0:BHv] - 5 * band32[1:1 + BHv] + 20 * band32[2:2 + BHv]
          + 20 * band32[3:3 + BHv] - 5 * band32[4:4 + BHv]
          + band32[5:5 + BHv])
    hs_ref[0:BHv, :] = jnp.clip((h1 + 16) >> 5, 0, 255).astype(i16)
    b1a = b1_ref[:, :]
    j1 = (b1a[0:BHv] - 5 * b1a[1:1 + BHv] + 20 * b1a[2:2 + BHv]
          + 20 * b1a[3:3 + BHv] - 5 * b1a[4:4 + BHv] + b1a[5:5 + BHv])
    js_ref[0:BHv, :] = jnp.clip((j1 + 512) >> 10, 0, 255).astype(i16)

    # ---- integer-best offsets per output column x (each column uses its
    # OWN block's offset; padded columns inherit the last block) ----
    jq = jax.lax.broadcasted_iota(i32, (Lq, Wp), 0)
    jx = jax.lax.broadcasted_iota(i32, (Lq, Wp), 1)
    Exa = (jq == (jnp.clip(jx, 0, W - 1) >> 3)).astype(f32)
    m8 = maps_ref[0].astype(f32)                         # (8, Lq)
    mja = jnp.dot(m8, Exa, preferred_element_type=f32).astype(i32)

    # ---- alignment at the integer best: 4 planes x 2 halves x 3 exact
    # horizontal variants (operand offset o; the slice shifts, the mask
    # stays per-column) ----
    # band row t <-> plane row 16*i + t - (R+4); hacc row r of half b <->
    # plane row 16*i + 8*b - R - 1 + r; aligned row k <-> oy + k - 1.
    for b in (0, 1):
        oxj = mja[b:b + 1, :]                            # (1, Wp)
        oyj = mja[2 + b:3 + b, :]
        t0 = 8 * b + 3
        for p in range(4):
            os_ = _PLANE_OS[p]
            for oi in range(len(os_)):
                hacc_ref[oi * HS:oi * HS + NA, 0:Wp] = jnp.zeros((NA, Wp),
                                                                 i32)
            for s in range(-R, R + 1):
                c0 = R + 3 + s                 # variant o reads cols o..o+Wp
                if p == 0:
                    sl = band_ref[0][t0:t0 + NA, c0:c0 + Wp + 2]
                elif p == 1:
                    sl = bs_ref[t0:t0 + NA, c0 - 2:c0 - 2 + Wp + 2]
                elif p == 2:
                    sl = hs_ref[t0 - 2:t0 - 2 + NA, c0:c0 + Wp + 2]
                else:
                    sl = js_ref[t0 - 2:t0 - 2 + NA, c0 - 2:c0 - 2 + Wp + 2]
                m = (oxj == s)
                for oi, o in enumerate(os_):
                    hacc_ref[oi * HS:oi * HS + NA, 0:Wp] = (
                        hacc_ref[oi * HS:oi * HS + NA, 0:Wp]
                        + jnp.where(m, sl[:, o:o + Wp].astype(i32), 0))
            for oi, o in enumerate(os_):
                base = (b * _NVAR + _VIDX[(p, o)]) * 16
                alg_ref[base:base + 10, 0:Wp] = jnp.zeros((10, Wp), i16)
                for s in range(-R, R + 1):
                    r0 = oi * HS + s + R
                    alg_ref[base:base + 10, 0:Wp] = (
                        alg_ref[base:base + 10, 0:Wp].astype(i32)
                        + jnp.where(oyj == s, hacc_ref[r0:r0 + 10, 0:Wp], 0)
                    ).astype(i16)

    # ---- refine pass 1: per-candidate SAD row sums ----
    for b in (0, 1):
        sh = src_ref[8 * b:8 * b + 8, :].astype(i32)
        for ci, (op1, op2) in enumerate(OPS):
            cnd = _cand(alg_ref, b, op1, op2, Wp)
            d = jnp.maximum(sh - cnd, cnd - sh)
            rs_ref[b * 32 + ci, 0:Wp] = jnp.sum(d, axis=0)
        rs_ref[b * 32 + NC:b * 32 + 32, 0:Wp] = jnp.zeros((32 - NC, Wp), i32)

    # ---- 8-wide block sums (byte-split MXU matmul, exact) ----
    xw = jax.lax.broadcasted_iota(i32, (Wp, Lq), 0)
    qw_ = jax.lax.broadcasted_iota(i32, (Wp, Lq), 1)
    E8 = ((xw >> 3) == qw_).astype(jnp.bfloat16)

    def blocksums(rows0):
        cs = rs_ref[rows0:rows0 + 32, 0:Wp]
        lo = (cs & 0xFF).astype(jnp.bfloat16)
        hi = ((cs >> 8) & 0xFF).astype(jnp.bfloat16)
        return (jnp.dot(lo, E8, preferred_element_type=f32)
                + 256.0 * jnp.dot(hi, E8, preferred_element_type=f32)
                ).astype(i32)

    st = blocksums(0)
    sb = blocksums(32)                                   # (32, Lq)

    # ---- partition-grouped costs + argmin (ties: smallest index) ----
    lane = jax.lax.broadcasted_iota(i32, (32, Lq), 1)
    even = (lane & 1) == 0

    def pairsum(x):
        # roll is circular with non-negative shift: left-by-1 == Lq - 1
        return jnp.where(even, x + pltpu.roll(x, Lq - 1, axis=1),
                         x + pltpu.roll(x, 1, axis=1))

    pt = pairsum(st)
    pb = pairsum(sb)
    g16 = pt + pb
    g816 = st + sb
    p8t = maps_ref[0, 4:5, :]
    p8b = maps_ref[0, 5:6, :]
    hcost = hck_ref[0:32, :]
    kidx = hck_ref[32:64, :]
    BIG = jnp.int32(1 << 28)

    def hbest(p8, g168, s):
        g = jnp.where(p8 == 0, g16,
                      jnp.where(p8 == 1, g168,
                                jnp.where(p8 == 2, g816, s)))
        cost = g * 4 + hcost
        m = jnp.min(cost, axis=0, keepdims=True)
        return jnp.min(jnp.where(cost == m, kidx, BIG), axis=0,
                       keepdims=True)

    hb_t = hbest(p8t, pt, st)
    hb_b = hbest(p8b, pb, sb)                            # (1, Lq)

    # ---- mv8 out: mv8 = mv8i * 4 + winning delta ----
    DX = [d[0] for d in _deltas()]
    DY = [d[1] for d in _deltas()]

    def dsel(hb, tab):
        v = jnp.zeros((1, Lq), i32)
        for ci in range(NC):
            if tab[ci]:
                v = jnp.where(hb == ci, jnp.int32(tab[ci]), v)
        return v

    mv_ref[0, 0:1, :] = maps_ref[0, 0:1, :] * 4 + dsel(hb_t, DX)
    mv_ref[0, 1:2, :] = maps_ref[0, 1:2, :] * 4 + dsel(hb_b, DX)
    mv_ref[0, 2:3, :] = maps_ref[0, 2:3, :] * 4 + dsel(hb_t, DY)
    mv_ref[0, 3:4, :] = maps_ref[0, 3:4, :] * 4 + dsel(hb_b, DY)
    mv_ref[0, 4:8, :] = jnp.zeros((4, Lq), i32)

    # ---- MC pass 2: prediction = select over the same candidates ----
    jq2 = jax.lax.broadcasted_iota(i32, (Lq, Wp), 0)
    jx2 = jax.lax.broadcasted_iota(i32, (Lq, Wp), 1)
    Exq = (jq2 == (jx2 >> 3)).astype(f32)
    hb8 = jnp.concatenate(
        [hb_t, hb_b, jnp.zeros((6, Lq), i32)], axis=0).astype(f32)
    hcol = jnp.dot(hb8, Exq, preferred_element_type=f32).astype(i32)
    for b in (0, 1):
        hc = hcol[b:b + 1, :]
        pred_ref[0, 8 * b:8 * b + 8, :] = jnp.zeros((8, Wp), i32)
        for ci, (op1, op2) in enumerate(OPS):
            pred_ref[0, 8 * b:8 * b + 8, :] = jnp.where(
                hc == ci, _cand(alg_ref, b, op1, op2, Wp),
                pred_ref[0, 8 * b:8 * b + 8, :])


@partial(jax.jit, static_argnames=("R", "interpret"))
def partition_refine_mc(src16: jnp.ndarray, ref_pad: jnp.ndarray,
                        mv8i: jnp.ndarray, part: jnp.ndarray, R: int,
                        interpret: bool = False):
    """Fused quarter-pel refine + MC on the 8x8 partition grid.

    src16: (H, W) int16; ref_pad: (H + 2*(R+8), W + 2*(R+8)) int16
    edge-padded (the partition path's PAD = R + 8 layout); mv8i
    (2mbh, 2mbw, 2) integer-pel best per 8x8 block; part (mbh, mbw) in
    {0: 16x16, 1: 16x8, 2: 8x16, 3: 8x8}.

    Returns (mv8 (2mbh, 2mbw, 2) quarter-pel int32, pred_y (H, W) int32) —
    bit-identical to encode.inter_partition._refine_and_mc_xla.
    """
    H, W = src16.shape
    mbh, mbw = H // 16, W // 16
    qh, qw = 2 * mbh, 2 * mbw
    PAD = R + 8
    Wp = (W + 127) // 128 * 128
    Lq = (qw + 127) // 128 * 128
    BH = 2 * R + 24
    BW = (Wp + 2 * R + 16 + 127) // 128 * 128
    NA = 2 * R + 10
    HS = (NA + 7) // 8 * 8

    srcp = jnp.pad(src16, ((0, 0), (0, Wp - W)), mode="edge")
    # band rows of MB row i: plane rows 16i - (R+4) .. + BH; cols
    # -(R+4) .. BW - (R+4)  (ref_pad index offset PAD - (R+4) = 4)
    need_w = 4 + BW
    refw = ref_pad
    if need_w > ref_pad.shape[1]:
        refw = jnp.pad(ref_pad, ((0, 0), (0, need_w - ref_pad.shape[1])),
                       mode="edge")
    bands = jnp.stack([
        jax.lax.dynamic_slice(refw, (16 * i + 4, 4), (BH, BW))
        for i in range(mbh)])

    # per-block maps: rows 0/1 dx top/bottom, 2/3 dy, 4/5 partition code
    dxb = mv8i[..., 0]
    dyb = mv8i[..., 1]
    p8 = jnp.repeat(jnp.repeat(part, 2, 0), 2, 1)
    padq = ((0, 0), (0, Lq - qw))

    def rows(a):
        return jnp.stack([jnp.pad(a[0::2], padq), jnp.pad(a[1::2], padq)])

    maps = jnp.concatenate([rows(dxb), rows(dyb), rows(p8),
                            jnp.zeros((2, mbh, Lq), jnp.int32)]
                           ).reshape(4, 2, mbh, Lq)
    maps = maps.transpose(2, 0, 1, 3).reshape(mbh, 8, Lq)

    deltas = _deltas()
    NC = len(deltas)
    hcost = np.full((32, Lq), 1 << 28, np.int32)
    hcost[:NC] = np.asarray([abs(tx) + abs(ty)
                             for tx, ty in deltas])[:, None]
    kidx = np.full((32, Lq), 1 << 28, np.int32)
    kidx[:NC] = np.arange(NC)[:, None]
    hck = jnp.asarray(np.concatenate([hcost, kidx]))

    pred, mv = pl.pallas_call(
        partial(_memc_kernel, R=R, W=W, Wp=Wp, Lq=Lq, BH=BH, BW=BW),
        out_shape=(jax.ShapeDtypeStruct((mbh, 16, Wp), jnp.int32),
                   jax.ShapeDtypeStruct((mbh, 8, Lq), jnp.int32)),
        grid=(mbh,),
        in_specs=[
            pl.BlockSpec((16, Wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BH, BW), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, Lq), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, Lq), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, 16, Wp), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 8, Lq), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((BH, BW), jnp.int32),      # b1 (pre-shift, for j)
            pltpu.VMEM((BH, BW), jnp.int16),      # b plane
            pltpu.VMEM((BH, BW), jnp.int16),      # h plane
            pltpu.VMEM((BH, BW), jnp.int16),      # j plane
            pltpu.VMEM((2 * HS, BW), jnp.int32),  # h-pass acc (<=2 variants)
            pltpu.VMEM((12 * 16, BW), jnp.int16),  # aligned planes (12 slots)
            pltpu.VMEM((64, Wp), jnp.int32),      # refine SAD row sums
        ],
        interpret=interpret,
    )(srcp, bands.astype(jnp.int16), maps, hck)

    # mv rows: 0 x_t, 1 x_b, 2 y_t, 3 y_b -> (qh, qw, 2)
    mvx = mv[:, 0:2, :qw].reshape(qh, qw)
    mvy = mv[:, 2:4, :qw].reshape(qh, qw)
    mv8 = jnp.stack([mvx, mvy], axis=-1)
    pred_y = pred[:, :, :W].reshape(H, W)
    return mv8, pred_y
