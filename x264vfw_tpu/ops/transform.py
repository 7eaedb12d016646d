"""H.264 integer transform + quantization — JAX device implementation.

Bit-exact mirror of `transform_np.py` (the spec-derived golden model); all
arithmetic is int32 (value ranges proven to fit: |W|<=9180 for 8-bit
residuals, |W|*MF <= 1.2e8 < 2^31).  These run on the TPU VPU as fused
elementwise/butterfly ops; the 4x4 transforms are butterfly adds/shifts, not
matmuls, because exactness matters more than MXU utilization and the VPU is
not the bottleneck for them.

Shapes: all functions are batched over arbitrary leading dims; blocks are
(..., 4, 4) int32; qp is a scalar or an array broadcastable against
blocks.shape[:-2] (per-MB adaptive quant).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import transform_np as tnp

# numpy constants (embedded at trace time; no device traffic at import)
DEQUANT_TABLE = tnp.DEQUANT_TABLE.astype(np.int32)   # (6,4,4)
QUANT_TABLE = tnp.QUANT_TABLE.astype(np.int32)       # (6,4,4)
QUANT_MF0 = tnp.QUANT_MF[:, 0].astype(np.int32)      # (6,)
DEQUANT_V0 = tnp.DEQUANT_V[:, 0].astype(np.int32)    # (6,)
ZIGZAG_4x4 = tnp.ZIGZAG_4x4.astype(np.int32)
CHROMA_QP_TABLE = tnp._CHROMA_QP_TABLE.astype(np.int32)


def chroma_qp(qp_luma, chroma_qp_offset: int = 0):
    qpi = jnp.clip(qp_luma + chroma_qp_offset, 0, 51)
    idx = jnp.clip(qpi - 30, 0, 21)
    return jnp.where(qpi < 30, qpi, jnp.asarray(CHROMA_QP_TABLE)[idx]).astype(jnp.int32)


def fdct4x4(x: jnp.ndarray) -> jnp.ndarray:
    """Forward 4x4 integer transform via butterflies (x264 dct4x4 structure).

    Equivalent to Cf @ X @ Cf^T with Cf = [[1,1,1,1],[2,1,-1,-2],
    [1,-1,-1,1],[1,-2,2,-1]].
    """
    x = x.astype(jnp.int32)
    # columns pass (transform along axis -2)
    s0 = x[..., 0, :] + x[..., 3, :]
    s3 = x[..., 0, :] - x[..., 3, :]
    s1 = x[..., 1, :] + x[..., 2, :]
    s2 = x[..., 1, :] - x[..., 2, :]
    t0 = s0 + s1
    t2 = s0 - s1
    t1 = 2 * s3 + s2
    t3 = s3 - 2 * s2
    y = jnp.stack([t0, t1, t2, t3], axis=-2)
    # rows pass (transform along axis -1)
    s0 = y[..., 0] + y[..., 3]
    s3 = y[..., 0] - y[..., 3]
    s1 = y[..., 1] + y[..., 2]
    s2 = y[..., 1] - y[..., 2]
    t0 = s0 + s1
    t2 = s0 - s1
    t1 = 2 * s3 + s2
    t3 = s3 - 2 * s2
    return jnp.stack([t0, t1, t2, t3], axis=-1)


def _lut6(table, idx, extra_dims: int):
    """table[idx] for the 6 qp%6 classes WITHOUT a gather (runtime-index
    gathers serialize on TPU): unrolled compare-select chain; table rows
    embed as HLO literals."""
    import numpy as _np
    tb = _np.asarray(table)
    idx = _expand_qp(idx, extra_dims)
    out = jnp.asarray(tb[-1]) + 0 * idx          # broadcast join
    for k in range(tb.shape[0] - 2, -1, -1):
        out = jnp.where(idx == k, jnp.asarray(tb[k]), out)
    return out


def _expand_qp(qp, extra_dims: int):
    qp = jnp.asarray(qp, dtype=jnp.int32)
    for _ in range(extra_dims):
        qp = qp[..., None]
    return qp


def quant4x4(w: jnp.ndarray, qp, intra: bool, dc_mode: bool = False) -> jnp.ndarray:
    """Dead-zone quant: sign * ((|w| * MF + f) >> qbits)."""
    qp = jnp.asarray(qp, dtype=jnp.int32)
    if dc_mode:
        mf = _lut6(QUANT_MF0, qp % 6, 2)
        qbits = 16 + qp // 6
    else:
        mf = _lut6(QUANT_TABLE, qp % 6, 2)
        qbits = 15 + qp // 6
    f = (jnp.int32(1) << qbits) // (3 if intra else 6)
    f = _expand_qp(f, 2)
    qbits = _expand_qp(qbits, 2)
    w = w.astype(jnp.int32)
    level = (jnp.abs(w) * mf + f) >> qbits
    if not dc_mode:
        # int16 dynamic-range clamp (see transform_np.quant4x4)
        v = _lut6(DEQUANT_TABLE, qp % 6, 2) << _expand_qp(qp // 6, 2)
        level = jnp.minimum(level, 32767 // v)
    return jnp.sign(w) * level


def dequant4x4(coef: jnp.ndarray, qp) -> jnp.ndarray:
    """d = c * V[qp%6][pos] << (qp/6)."""
    qp = jnp.asarray(qp, dtype=jnp.int32)
    v = _lut6(DEQUANT_TABLE, qp % 6, 2)
    shift = _expand_qp(qp // 6, 2)
    return (coef.astype(jnp.int32) * v) << shift


def idct4x4_core(d: jnp.ndarray) -> jnp.ndarray:
    """Inverse 4x4 butterflies + (x+32)>>6 (§8.5.12.2).

    ROW transform first, then columns — the >>1 floors make stage order
    observable at qP/6 < 2 (see transform_np.idct4x4_core)."""
    d = d.astype(jnp.int32)
    d0, d1, d2, d3 = d[..., :, 0], d[..., :, 1], d[..., :, 2], d[..., :, 3]
    e0 = d0 + d2
    e1 = d0 - d2
    e2 = (d1 >> 1) - d3
    e3 = d1 + (d3 >> 1)
    f = jnp.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-1)
    g0, g1, g2, g3 = f[..., 0, :], f[..., 1, :], f[..., 2, :], f[..., 3, :]
    h0 = g0 + g2
    h1 = g0 - g2
    h2 = (g1 >> 1) - g3
    h3 = g1 + (g3 >> 1)
    r = jnp.stack([h0 + h3, h1 + h2, h1 - h2, h0 - h3], axis=-2)
    return (r + 32) >> 6


def hadamard4x4(x: jnp.ndarray) -> jnp.ndarray:
    """H X H^T with H = +-1 butterfly matrix (self-structure, exact)."""
    x = x.astype(jnp.int32)
    s0 = x[..., 0, :] + x[..., 2, :]
    s1 = x[..., 0, :] - x[..., 2, :]
    s2 = x[..., 1, :] + x[..., 3, :]
    s3 = x[..., 1, :] - x[..., 3, :]
    y = jnp.stack([s0 + s2, s1 + s3, s1 - s3, s0 - s2], axis=-2)
    s0 = y[..., 0] + y[..., 2]
    s1 = y[..., 0] - y[..., 2]
    s2 = y[..., 1] + y[..., 3]
    s3 = y[..., 1] - y[..., 3]
    return jnp.stack([s0 + s2, s1 + s3, s1 - s3, s0 - s2], axis=-1)


def luma_dc_fwd_quant(dc: jnp.ndarray, qp, intra: bool = True) -> jnp.ndarray:
    """Encoder luma DC: Hadamard, >>1 (floor, == numpy //2), DC-mode quant."""
    w = hadamard4x4(dc) >> 1
    return quant4x4(w, qp, intra=intra, dc_mode=True)


def luma_dc_dequant(levels: jnp.ndarray, qp) -> jnp.ndarray:
    """Decoder §8.5.10: inverse Hadamard then LevelScale."""
    qp = jnp.asarray(qp, dtype=jnp.int32)
    f = hadamard4x4(levels)
    ls = 16 * _lut6(DEQUANT_V0, qp % 6, 2)
    qp6 = _expand_qp(qp // 6, 2)
    qpe = _expand_qp(qp, 2)
    hi = (f * ls) << jnp.maximum(qp6 - 6, 0)
    lo = (f * ls + (jnp.int32(1) << jnp.maximum(5 - qp6, 0))) >> jnp.maximum(6 - qp6, 0)
    return jnp.where(qpe >= 36, hi, lo)


def hadamard2x2(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.int32)
    a, b = x[..., 0, 0], x[..., 0, 1]
    c, d = x[..., 1, 0], x[..., 1, 1]
    r0 = jnp.stack([a + b + c + d, a - b + c - d], axis=-1)
    r1 = jnp.stack([a + b - c - d, a - b - c + d], axis=-1)
    return jnp.stack([r0, r1], axis=-2)


def chroma_dc_fwd_quant(dc: jnp.ndarray, qp, intra: bool) -> jnp.ndarray:
    w = hadamard2x2(dc)
    return quant4x4(w, qp, intra=intra, dc_mode=True)


def chroma_dc_dequant(levels: jnp.ndarray, qp) -> jnp.ndarray:
    qp = jnp.asarray(qp, dtype=jnp.int32)
    f = hadamard2x2(levels)
    ls = 16 * _lut6(DEQUANT_V0, qp % 6, 2)
    qp6 = _expand_qp(qp // 6, 2)
    return ((f * ls) << qp6) >> 5


def zigzag_scan(blocks: jnp.ndarray) -> jnp.ndarray:
    flat = blocks.reshape(*blocks.shape[:-2], 16)
    return jnp.take(flat, ZIGZAG_4x4, axis=-1)


def zigzag_unscan(scanned: jnp.ndarray) -> jnp.ndarray:
    inv = jnp.asarray(np.argsort(tnp.ZIGZAG_4x4), dtype=jnp.int32)
    out = jnp.take(scanned, inv, axis=-1)
    return out.reshape(*scanned.shape[:-1], 4, 4)


# --- 8x8 transform family (High profile) -------------------------------
# int32 ranges: |W8| <= ~2e4 for 8-bit residuals, |W8|*MF8 <= 4.3e8 < 2^31.

DEQUANT8_TABLE = tnp.DEQUANT8_TABLE.astype(np.int32)   # (6,8,8), x16 scale
QUANT8_TABLE = tnp.QUANT8_TABLE.astype(np.int32)       # (6,8,8)


def _fdct8_1d(x, axis_last: bool):
    ix = (lambda k: x[..., :, k]) if axis_last else (lambda k: x[..., k, :])
    p = [ix(k) for k in range(8)]
    s07, s16, s25, s34 = p[0] + p[7], p[1] + p[6], p[2] + p[5], p[3] + p[4]
    a0, a1, a2, a3 = s07 + s34, s16 + s25, s07 - s34, s16 - s25
    d07, d16, d25, d34 = p[0] - p[7], p[1] - p[6], p[2] - p[5], p[3] - p[4]
    a4 = d16 + d25 + (d07 + (d07 >> 1))
    a5 = d07 - d34 - (d25 + (d25 >> 1))
    a6 = d07 + d34 - (d16 + (d16 >> 1))
    a7 = d16 - d25 + (d34 + (d34 >> 1))
    outs = [a0 + a1, a4 + (a7 >> 2), a2 + (a3 >> 1), a5 + (a6 >> 2),
            a0 - a1, a6 - (a5 >> 2), (a2 >> 1) - a3, (a4 >> 2) - a7]
    return jnp.stack(outs, axis=-1 if axis_last else -2)


def fdct8x8(x: jnp.ndarray) -> jnp.ndarray:
    """Forward 8x8 integer transform; x: (..., 8, 8) int32 residual."""
    return _fdct8_1d(_fdct8_1d(x.astype(jnp.int32), True), False)


def quant8x8(w: jnp.ndarray, qp, intra: bool) -> jnp.ndarray:
    """Mirror of transform_np.quant8x8 (derived MF8, dead-zone, 16-bit
    dequant-range clamp)."""
    qp = jnp.asarray(qp, jnp.int32)
    qbits = 16 + qp // 6
    mf = jnp.take(jnp.asarray(QUANT8_TABLE), qp % 6, axis=0)
    f = (jnp.int32(1) << qbits) // (3 if intra else 6)
    if qp.ndim:
        mf = mf.reshape(qp.shape + (8, 8))
        f = f[..., None, None]
        qbits = qbits[..., None, None]
    # |w|*mf <= 4.3e8: keep the product in int64 via two int32 halves is
    # unnecessary — it fits int32? 4.3e8 < 2^31 yes, but w*mf intermediate
    # uses int64 on TPU only if asked; stay in int64-free range by int32
    aw = jnp.abs(w)
    level = ((aw * mf) + f) >> qbits
    ls = jnp.take(jnp.asarray(DEQUANT8_TABLE), qp % 6, axis=0)
    dv = qp // 6
    if qp.ndim:
        ls = ls.reshape(qp.shape + (8, 8))
        dv = dv[..., None, None]
    gain = jnp.where(dv >= 6, ls << jnp.maximum(dv - 6, 0),
                     jnp.maximum(ls >> jnp.maximum(6 - dv, 0), 1))
    level = jnp.minimum(level, 32767 // jnp.maximum(gain, 1))
    return jnp.sign(w) * level


def dequant8x8(coef: jnp.ndarray, qp) -> jnp.ndarray:
    """§8.5.13.1 with flat scaling lists (matches transform_np.dequant8x8)."""
    qp = jnp.asarray(qp, jnp.int32)
    ls = jnp.take(jnp.asarray(DEQUANT8_TABLE), qp % 6, axis=0)
    dv = qp // 6
    if qp.ndim:
        ls = ls.reshape(qp.shape + (8, 8))
        dv = dv[..., None, None]
    c = coef.astype(jnp.int32)
    hi = (c * ls) << jnp.maximum(dv - 6, 0)
    lo = (c * ls + (jnp.int32(1) << jnp.maximum(5 - dv, 0))) >> \
        jnp.maximum(6 - dv, 0)
    return jnp.where(dv >= 6, hi, lo)


def _idct8_1d(p, axis_last: bool):
    ix = (lambda k: p[..., :, k]) if axis_last else (lambda k: p[..., k, :])
    c = [ix(k) for k in range(8)]
    a0 = c[0] + c[4]
    a2 = c[0] - c[4]
    a4 = (c[2] >> 1) - c[6]
    a6 = (c[6] >> 1) + c[2]
    b0, b2, b4, b6 = a0 + a6, a2 + a4, a2 - a4, a0 - a6
    a1 = -c[3] + c[5] - c[7] - (c[7] >> 1)
    a3 = c[1] + c[7] - c[3] - (c[3] >> 1)
    a5 = -c[1] + c[7] + c[5] + (c[5] >> 1)
    a7 = c[3] + c[5] + c[1] + (c[1] >> 1)
    b1 = (a7 >> 2) + a1
    b3 = a3 + (a5 >> 2)
    b5 = (a3 >> 2) - a5
    b7 = a7 - (a1 >> 2)
    outs = [b0 + b7, b2 + b5, b4 + b3, b6 + b1,
            b6 - b1, b4 - b3, b2 - b5, b0 - b7]
    return jnp.stack(outs, axis=-1 if axis_last else -2)


def idct8x8_core(d: jnp.ndarray) -> jnp.ndarray:
    """Inverse 8x8 transform (§8.5.12.3): rows, then columns, (x+32)>>6."""
    r = _idct8_1d(_idct8_1d(d.astype(jnp.int32), True), False)
    return (r + 32) >> 6


ZIGZAG_8x8 = tnp.ZIGZAG_8x8.astype(np.int32)


def zigzag8x8_scan(blocks: jnp.ndarray) -> jnp.ndarray:
    flat = blocks.reshape(*blocks.shape[:-2], 64)
    return jnp.take(flat, jnp.asarray(ZIGZAG_8x8), axis=-1)


def zigzag8x8_unscan(scanned: jnp.ndarray) -> jnp.ndarray:
    inv = jnp.asarray(np.argsort(tnp.ZIGZAG_8x8), dtype=jnp.int32)
    out = jnp.take(scanned, inv, axis=-1)
    return out.reshape(*scanned.shape[:-1], 8, 8)
