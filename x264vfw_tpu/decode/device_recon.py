"""Device (TPU) reconstruction for the decode path — BASELINE config 4.

Split mirrors the encoder: the host parses entropy (CAVLC -> syntax tensors,
the serial part), the device does the math — motion compensation, dequant,
inverse transform, reconstruction — batched over all MBs of a frame.

Round-1 scope: P slices whose MBs are all P_L0_16x16 / P_Skip with one
reference (what our encoder emits).  The host decoder detects eligibility
and routes; anything else falls back to the host recon path.  MC reuses the
single-stage masked-shift machinery of the encoder (exactness proven against
mc_np in tests), driven by the *decoded* MV field instead of motion search.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import transform as tj
from ..encode.device import (_halfpel_planes, _qpel_operands, mbize, unmbize,
                             blocks_to_mb, BLK_X, BLK_Y)

# quarter-frac (fy*4+fx) -> two (plane, ox, oy) operands as arrays
_QP1 = np.zeros((16, 3), np.int32)
_QP2 = np.zeros((16, 3), np.int32)
for _fy in range(4):
    for _fx in range(4):
        _o1, _o2 = _qpel_operands(_fx, _fy)
        _QP1[_fy * 4 + _fx] = _o1
        _QP2[_fy * 4 + _fx] = _o2


@partial(jax.jit, static_argnames=("rng",))
def recon_p16_frame(levels_zz, dc_u, dc_v, ac_u, ac_v, cbp_luma, cbp_chroma,
                    mv_q, ref_y, ref_u, ref_v, qp, qpc, rng=16):
    """Reconstruct a P16x16/P_Skip frame on device.

    levels_zz: (n,16,16) zigzag luma levels (block coding order)
    dc_u/dc_v: (n,2,2); ac_u/ac_v: (n,4,15); cbp_*: (n,)
    mv_q: (mbh,mbw,2) quarter-pel decoded MVs; ref planes int32.
    Returns (y, u, v) int32 planes.
    """
    H, W = ref_y.shape
    mbh, mbw = H // 16, W // 16
    n = mbh * mbw

    # ---- motion compensation from the decoded MV field (quarter-pel:
    # prediction = rounded mean of two {int,b,h,j} plane samples) ----
    mv_int = mv_q >> 2                       # floor (arithmetic)
    frac = mv_q & 3
    K = 2 * rng + 3                          # +-1 operand offsets around mv
    PAD = rng + 8
    ref_pad = jnp.pad(ref_y, PAD, mode="edge").astype(jnp.int16)
    hb, hh, hj = _halfpel_planes(ref_pad)
    planes = (ref_pad, hb, hh, hj)

    fid = frac[..., 1] * 4 + frac[..., 0]    # (mbh, mbw) quarter class
    qp1 = jnp.asarray(_QP1)[fid]             # (mbh, mbw, 3) plane/ox/oy
    qp2 = jnp.asarray(_QP2)[fid]

    def sel_maps(op):
        ox = jnp.clip(mv_int[..., 0] + op[..., 1] + rng + 1, 0, K - 1)
        oy = jnp.clip(mv_int[..., 1] + op[..., 2] + rng + 1, 0, K - 1)
        oid = jnp.repeat(jnp.repeat(oy * K + ox, 16, 0), 16, 1)
        ps = jnp.repeat(jnp.repeat(op[..., 0], 16, 0), 16, 1)
        return oid, ps

    oid1, ps1 = sel_maps(qp1)
    oid2, ps2 = sel_maps(qp2)

    def mc_body(carry, k):
        a1, a2 = carry
        oy = k // K
        ox = k % K
        base = (PAD - rng - 1 + oy, PAD - rng - 1 + ox)
        val = [None] * 4
        for pi, pl_ in enumerate(planes):
            val[pi] = jax.lax.dynamic_slice(pl_, base, (H, W))
        v1 = jnp.zeros((H, W), jnp.int16)
        v2 = jnp.zeros((H, W), jnp.int16)
        for pi in range(4):
            v1 = v1 + jnp.where(ps1 == pi, val[pi], 0)
            v2 = v2 + jnp.where(ps2 == pi, val[pi], 0)
        return (a1 + jnp.where(oid1 == k, v1, 0),
                a2 + jnp.where(oid2 == k, v2, 0)), None

    (p1, p2), _ = jax.lax.scan(
        mc_body, (jnp.zeros((H, W), jnp.int16), jnp.zeros((H, W), jnp.int16)),
        jnp.arange(K * K))
    pred_y = ((p1.astype(jnp.int32) + p2 + 1) >> 1)

    # chroma MC (same single-stage as the encoder)
    ci = mv_q >> 3
    f = mv_q & 7
    clo = -((4 * rng + 2) >> 3) - 1
    chi = (4 * rng + 2) >> 3
    cpad = chi + 2
    rpu = jnp.pad(ref_u, cpad, mode="edge").astype(jnp.int16)
    rpv = jnp.pad(ref_v, cpad, mode="edge").astype(jnp.int16)

    def exp_c(field):
        return jnp.repeat(jnp.repeat(field, 8, 0), 8, 1)

    cix = exp_c(ci[..., 0])
    ciy = exp_c(ci[..., 1])
    fx = exp_c(f[..., 0])
    fy = exp_c(f[..., 1])
    csize = (H // 2, W // 2)
    ncc = chi - clo + 1

    def cbody(carry, k):
        oy = k // ncc + clo
        ox = k % ncc + clo
        sel = (ciy == oy) & (cix == ox)
        au, av = carry

        def bil(rp):
            A = jax.lax.dynamic_slice(rp, (cpad + oy, cpad + ox), csize).astype(jnp.int32)
            B = jax.lax.dynamic_slice(rp, (cpad + oy, cpad + ox + 1), csize).astype(jnp.int32)
            C = jax.lax.dynamic_slice(rp, (cpad + oy + 1, cpad + ox), csize).astype(jnp.int32)
            D = jax.lax.dynamic_slice(rp, (cpad + oy + 1, cpad + ox + 1), csize).astype(jnp.int32)
            return ((8 - fx) * (8 - fy) * A + fx * (8 - fy) * B
                    + (8 - fx) * fy * C + fx * fy * D + 32) >> 6

        return (au + jnp.where(sel, bil(rpu), 0),
                av + jnp.where(sel, bil(rpv), 0)), None

    (pred_u, pred_v), _ = jax.lax.scan(
        cbody, (jnp.zeros(csize, jnp.int32), jnp.zeros(csize, jnp.int32)),
        jnp.arange(ncc * ncc))

    # ---- residuals (identical math to the encoder's recon) ----
    quad = ((cbp_luma[:, None] >> (jnp.arange(16) // 4)) & 1).astype(bool)
    lv = jnp.where(quad[:, :, None], levels_zz, 0)
    blocks = tj.zigzag_unscan(lv)
    d = tj.dequant4x4(blocks, qp)
    res = tj.idct4x4_core(d)
    res_pl = unmbize(blocks_to_mb(res), H, W)
    y = jnp.clip(pred_y + res_pl, 0, 255)

    def chroma_res(pred, dc, ac):
        use_dc = (cbp_chroma >= 1)
        use_ac = (cbp_chroma == 2)
        dc = jnp.where(use_dc[:, None, None], dc, 0)
        ac = jnp.where(use_ac[:, None, None], ac, 0)
        dc_rec = tj.chroma_dc_dequant(dc, qpc)
        full = jnp.concatenate([jnp.zeros((n, 4, 1), jnp.int32), ac], axis=-1)
        cb = tj.zigzag_unscan(full)
        dd = tj.dequant4x4(cb, qpc)
        dd = dd.at[:, :, 0, 0].set(dc_rec.reshape(n, 4))
        r = tj.idct4x4_core(dd)
        r8 = r.reshape(n, 2, 2, 4, 4).transpose(0, 1, 3, 2, 4).reshape(n, 8, 8)
        pred_mbs = mbize(pred, 8)
        return unmbize(jnp.clip(pred_mbs + r8, 0, 255), H // 2, W // 2, 8)

    u = chroma_res(pred_u, dc_u, ac_u)
    v = chroma_res(pred_v, dc_v, ac_v)
    return y, u, v
