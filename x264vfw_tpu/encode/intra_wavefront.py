"""Wavefront I-frame encode with per-MB intra mode decision (device, JAX).

Full Intra_16x16 mode decision (V/H/DC/Plane, §8.3.3) and intra chroma mode
decision (DC/H/V/Plane, §8.3.4) under exact reconstruction feedback.  The
reference exposes this capability as libx264's intra analysis
(/root/reference/codec.c:887 partitions/analyse surface).

TPU formulation
---------------
Intra prediction of MB (y, x) needs the reconstructed bottom row of
(y-1, x), the right column of (y, x-1) and the corner pixel of
(y-1, x-1) — the classic anti-diagonal wavefront dependency.  We scan
diagonals d = y + x with ONE lax.scan step per diagonal and a fixed slot
per MB row:

  * slot layout: step d, slot y processes MB (y, d - y) (masked when out
    of range).  Every dependency is then a *static* slot shift into the
    previous step's outputs: top border of slot y = bottom row emitted at
    step d-1, slot y-1; left border = right column emitted at step d-1,
    slot y; corner = bottom row at step d-2, slot y-1.  The scan carry is
    just those three small (mbh, 16/8) arrays per plane — no frame-sized
    border state, no scatters, no gathers.
  * input/output skew: mapping (y, x) <-> (d, slot) is the standard skew
    transform, implementable with pad+reshape+transpose only:
    flat[y*(steps+1) + x] == flat'[y*steps + (x+y)] for row-major layouts,
    so both directions are pure layout ops XLA handles at memory speed.

Mode decisions use SATD (4x4 Hadamard) + a small lambda-weighted rate bias
for the chroma mode's ue() length, mirroring x264's satd metric.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import transform as tj


def _skew(b, mbh, mbw, steps, slope: int = 1):
    """(mbh, mbw, ...) -> (steps, mbh, ...) with out[d, y] = b[y, d - slope*y]
    (junk in out-of-range slots).  slope 2 is required when dependencies
    include the top-right neighbour (I4x4 — the same reason HEVC WPP lags
    two CTUs per row)."""
    trail = b.shape[2:]
    pad = [(0, 0), (0, steps + slope - mbw)] + [(0, 0)] * len(trail)
    g = jnp.pad(b, pad).reshape((mbh * (steps + slope),) + trail)
    f = g[: mbh * steps].reshape((mbh, steps) + trail)
    return jnp.swapaxes(f, 0, 1)


def _unskew(a, mbh, mbw, steps, slope: int = 1):
    """(steps, mbh, ...) -> (mbh, mbw, ...) with out[y, x] = a[slope*y+x, y]."""
    trail = a.shape[2:]
    f = jnp.swapaxes(a, 0, 1).reshape((mbh * steps,) + trail)
    pad = [(0, slope * mbh)] + [(0, 0)] * len(trail)
    g = jnp.pad(f, pad).reshape((mbh, steps + slope) + trail)
    return g[:, :mbw]


_HAD4 = np.array([[1, 1, 1, 1],
                  [1, 1, -1, -1],
                  [1, -1, -1, 1],
                  [1, -1, 1, -1]], np.int32)


def _satd(res_blocks):
    """(n, nb, 4, 4) residual blocks -> (n,) SATD (sum |H r H^T| >> 1)."""
    H = jnp.asarray(_HAD4)
    t = jnp.einsum("ij,nbjk,kl->nbil", H, res_blocks, H)
    return jnp.abs(t).sum(axis=(1, 2, 3)) >> 1


def _mb_blocks(mbs, bs):
    """(n, S, S) -> (n, (S//4)^2, 4, 4) raster blocks."""
    n, S, _ = mbs.shape
    q = S // 4
    return (mbs.reshape(n, q, 4, q, 4).transpose(0, 1, 3, 2, 4)
            .reshape(n, q * q, 4, 4))


def _satd_mb(src, pred):
    return _satd(_mb_blocks(src - pred, src.shape[-1]))


def _plane_pred(top, left, tl, size: int):
    """§8.3.3.4 / §8.3.4 plane prediction, batched over slots.

    top/left: (n, size), tl: (n,).  size 16 (luma) or 8 (chroma)."""
    n = top.shape[0]
    h = size // 2
    xs = jnp.arange(1, h, dtype=jnp.int32)              # 1..h-1
    # H = sum_{x=1..h} x * (p[-1, h-1+x] - p[-1, h-1-x]); x=h term uses tl
    Hs = (xs[None, :] * (top[:, h - 1 + xs] - top[:, h - 1 - xs])).sum(-1) \
        + h * (top[:, size - 1] - tl)
    Vs = (xs[None, :] * (left[:, h - 1 + xs] - left[:, h - 1 - xs])).sum(-1) \
        + h * (left[:, size - 1] - tl)
    if size == 16:
        b = (5 * Hs + 32) >> 6
        c = (5 * Vs + 32) >> 6
    else:
        b = (17 * Hs + 16) >> 5
        c = (17 * Vs + 16) >> 5
    a = 16 * (left[:, size - 1] + top[:, size - 1])
    yy = jnp.arange(size, dtype=jnp.int32)
    xx = jnp.arange(size, dtype=jnp.int32)
    p = (a[:, None, None] + b[:, None, None] * (xx[None, None, :] - (h - 1))
         + c[:, None, None] * (yy[None, :, None] - (h - 1)) + 16) >> 5
    return jnp.clip(p, 0, 255)


def _chroma_dc_pred(top, left, availT, availL):
    """§8.3.4.1 per-4x4-quadrant chroma DC, batched.  top/left (n,8)."""
    n = top.shape[0]
    t0 = top[:, :4].sum(-1)
    t1 = top[:, 4:].sum(-1)
    l0 = left[:, :4].sum(-1)
    l1 = left[:, 4:].sum(-1)

    def dc_both(t, l):
        return jnp.where(availT & availL, (t + l + 4) >> 3,
                         jnp.where(availT, (t + 2) >> 2,
                                   jnp.where(availL, (l + 2) >> 2, 128)))

    def dc_prefer(pref, alt, avail_pref, avail_alt):
        return jnp.where(avail_pref, (pref + 2) >> 2,
                         jnp.where(avail_alt, (alt + 2) >> 2, 128))

    q00 = dc_both(t0, l0)
    q11 = dc_both(t1, l1)
    q10 = dc_prefer(t1, l0, availT, availL)   # top-right quad: prefer top
    q01 = dc_prefer(l1, t0, availL, availT)   # bottom-left: prefer left
    out = jnp.zeros((n, 8, 8), jnp.int32)
    out = out.at[:, :4, :4].set(q00[:, None, None])
    out = out.at[:, :4, 4:].set(q10[:, None, None])
    out = out.at[:, 4:, :4].set(q01[:, None, None])
    out = out.at[:, 4:, 4:].set(q11[:, None, None])
    return out


def _i16_dc_pred(top, left, availT, availL):
    ts = top.sum(-1)
    ls = left.sum(-1)
    dc = jnp.where(availT & availL, (ts + ls + 16) >> 5,
                   jnp.where(availT, (ts + 8) >> 4,
                             jnp.where(availL, (ls + 8) >> 4, 128)))
    return jnp.broadcast_to(dc[:, None, None], (top.shape[0], 16, 16))


# plain int (NOT a module-level concrete jnp scalar: captured device
# constants poison pjit re-dispatch on jax 0.9 XLA:CPU — see
# device_finalize.encode_i_slots_fn)
BIG = 1 << 29


def encode_i_frame_core_wf(src_y, src_u, src_v, qp, qpc, i4x4: bool = False):
    """Device I-frame encode with full I16 + chroma mode decision.

    Returns the syntax-tensor dict of encode_i_frame_core plus
    'i16_mode' (n,) in {0=V,1=H,2=DC,3=Plane} and 'cmode' (n,) in
    {0=DC,1=H,2=V,3=Plane} (§7.4.5 numbering for both).

    With i4x4=True the wavefront runs at slope 2 (the I4x4 top-right-MB
    dependency) and every MB additionally runs the full 9-mode I_NxN
    encode (encode/intra4x4.py); the per-MB winner is selected by
    SATD + lambda*bits and reported via 'use_i4' / 'i4_modes' /
    'levels4' / 'cbp_luma4'."""
    from .device import (mbize, unmbize, _luma_residual_pipeline_i16,
                         _finish_intra_mb)
    H, W = src_y.shape
    mbh, mbw = H // 16, W // 16
    slope = 2 if i4x4 else 1
    steps = slope * (mbh - 1) + mbw

    sy = _skew(mbize(src_y).reshape(mbh, mbw, 16, 16), mbh, mbw, steps, slope)
    su = _skew(mbize(src_u, 8).reshape(mbh, mbw, 8, 8), mbh, mbw, steps, slope)
    sv = _skew(mbize(src_v, 8).reshape(mbh, mbw, 8, 8), mbh, mbw, steps, slope)

    ys_idx = jnp.arange(mbh, dtype=jnp.int32)
    # satd-domain lambda (x264 lambda table shape)
    lam = jnp.maximum(
        1, jnp.round(0.85 * jnp.exp2((jnp.asarray(qp, jnp.float32) - 12.0)
                                     / 3.0))).astype(jnp.int32)

    def shift_down(a):
        """slot y -> value from slot y-1 (slot 0 gets zeros)."""
        return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]])

    def step(carry, xs):
        # bots_*[k] = bottom rows emitted at step d-1-k (depth slope+1);
        # mode borders only carried when i4x4
        (bots_y, right_y, bots_u, right_u, bots_v, right_v,
         mbots, mright) = carry
        smb_y, smb_u, smb_v, d = xs
        x = d - slope * ys_idx                          # (mbh,)
        availT = ys_idx >= 1                            # top nbr (y-1, x)
        availL = x >= 1                                 # left nbr (y, x-1)
        availTL = availT & availL

        top_y = shift_down(bots_y[slope - 1])           # (mbh, 16)
        tl_y = shift_down(bots_y[slope])[:, 15]         # corner pixel
        left_y = right_y
        # ---- luma I16 mode decision ----
        pV = jnp.broadcast_to(top_y[:, None, :], (mbh, 16, 16))
        pH = jnp.broadcast_to(left_y[:, :, None], (mbh, 16, 16))
        pDC = _i16_dc_pred(top_y, left_y, availT, availL)
        pPL = _plane_pred(top_y, left_y, tl_y, 16)
        cV = jnp.where(availT, _satd_mb(smb_y, pV), BIG)
        cH = jnp.where(availL, _satd_mb(smb_y, pH), BIG)
        cDC = _satd_mb(smb_y, pDC)
        cPL = jnp.where(availTL, _satd_mb(smb_y, pPL), BIG)
        costs = jnp.stack([cV, cH, cDC, cPL])           # mode order 0..3
        i16_mode = jnp.argmin(costs, axis=0).astype(jnp.int32)
        sel = i16_mode[:, None, None]
        pred_y = jnp.where(sel == 0, pV,
                           jnp.where(sel == 1, pH,
                                     jnp.where(sel == 2, pDC, pPL)))

        # ---- chroma mode decision (joint over U+V) ----
        top_u = shift_down(bots_u[slope - 1])
        tl_u = shift_down(bots_u[slope])[:, 7]
        left_u = right_u
        top_v = shift_down(bots_v[slope - 1])
        tl_v = shift_down(bots_v[slope])[:, 7]
        left_v = right_v
        cand_u = [
            _chroma_dc_pred(top_u, left_u, availT, availL),
            jnp.broadcast_to(left_u[:, :, None], (mbh, 8, 8)),
            jnp.broadcast_to(top_u[:, None, :], (mbh, 8, 8)),
            _plane_pred(top_u, left_u, tl_u, 8),
        ]
        cand_v = [
            _chroma_dc_pred(top_v, left_v, availT, availL),
            jnp.broadcast_to(left_v[:, :, None], (mbh, 8, 8)),
            jnp.broadcast_to(top_v[:, None, :], (mbh, 8, 8)),
            _plane_pred(top_v, left_v, tl_v, 8),
        ]
        avail_c = [jnp.ones_like(availT), availL, availT, availTL]
        ue_bits = (1, 3, 3, 5)                          # ue(cmode) lengths
        ccosts = jnp.stack([
            jnp.where(av, _satd_mb(smb_u, cu) + _satd_mb(smb_v, cv)
                      + lam * (nb - 1), BIG)
            for cu, cv, av, nb in zip(cand_u, cand_v, avail_c, ue_bits)])
        cmode = jnp.argmin(ccosts, axis=0).astype(jnp.int32)
        cs = cmode[:, None, None]
        pred_u = jnp.where(cs == 0, cand_u[0],
                           jnp.where(cs == 1, cand_u[1],
                                     jnp.where(cs == 2, cand_u[2], cand_u[3])))
        pred_v = jnp.where(cs == 0, cand_v[0],
                           jnp.where(cs == 1, cand_v[1],
                                     jnp.where(cs == 2, cand_v[2], cand_v[3])))

        levels, res = _luma_residual_pipeline_i16(smb_y, pred_y, qp)
        out = _finish_intra_mb(smb_y, pred_y, levels, res,
                               smb_u, pred_u, smb_v, pred_v, qp, qpc)
        out["i16_mode"] = i16_mode
        out["cmode"] = cmode

        if i4x4:
            from .intra4x4 import encode_i4x4_batch
            availTR = availT & (x + 1 < mbw) & (x + 1 > 0)
            tr4 = shift_down(bots_y[0])[:, :4]          # (y-1, x+1) bottom
            top_modes = shift_down(mbots[1])            # top MB bottom modes
            left_modes = mright                         # left MB right modes
            i4 = encode_i4x4_batch(
                smb_y, top_y, tr4, left_y, tl_y, top_modes, left_modes,
                availT, availL, availTR, qp, lam)
            # MB-type decision: total satd + lambda * signalling bits.
            # I16 header ~ ue(mb_type 1..24) ~ 9 bits; I_NxN adds
            # mb_type ue(0) = 1 bit + coded_block_pattern me() ~ 6 bits.
            cost_i16 = jnp.min(costs, axis=0) + lam * 9
            cost_i4 = i4["cost"] + lam * 7
            use_i4 = cost_i4 < cost_i16
            u3 = use_i4[:, None, None]
            out["recon_y"] = jnp.where(u3, i4["recon"], out["recon_y"])
            out["use_i4"] = use_i4
            out["i4_modes"] = i4["modes"]
            out["i4_prev"] = i4["prev"]
            out["i4_rem"] = i4["rem"]
            out["levels4"] = jnp.where(u3, i4["levels"], 0)
            out["cbp_luma4"] = jnp.where(use_i4, i4["cbp_luma"], 0)
            two = jnp.full((mbh, 4), 2, jnp.int32)
            new_mbots = (jnp.where(use_i4[:, None], i4["bot_modes"], two),
                         mbots[0])
            new_mright = jnp.where(use_i4[:, None], i4["right_modes"], two)
        else:
            new_mbots, new_mright = mbots, mright

        new_carry = ((out["recon_y"][:, -1, :],) + bots_y[:-1],
                     out["recon_y"][:, :, -1],
                     (out["recon_u"][:, -1, :],) + bots_u[:-1],
                     out["recon_u"][:, :, -1],
                     (out["recon_v"][:, -1, :],) + bots_v[:-1],
                     out["recon_v"][:, :, -1],
                     new_mbots, new_mright)
        return new_carry, out

    z16 = jnp.zeros((mbh, 16), jnp.int32)
    z8 = jnp.zeros((mbh, 8), jnp.int32)
    zm = jnp.full((mbh, 4), 2, jnp.int32)
    init = ((z16,) * (slope + 1), z16,
            (z8,) * (slope + 1), z8,
            (z8,) * (slope + 1), z8,
            (zm, zm), zm)
    _, outs = jax.lax.scan(step, init,
                           (sy, su, sv, jnp.arange(steps, dtype=jnp.int32)))

    # unskew every output back to MB raster order
    out = {k: _unskew(v, mbh, mbw, steps, slope)
           .reshape((mbh * mbw,) + v.shape[2:])
           for k, v in outs.items()}
    out["recon_y"] = unmbize(out.pop("recon_y"), H, W)
    out["recon_u"] = unmbize(out.pop("recon_u"), H // 2, W // 2, 8)
    out["recon_v"] = unmbize(out.pop("recon_v"), H // 2, W // 2, 8)
    return out
