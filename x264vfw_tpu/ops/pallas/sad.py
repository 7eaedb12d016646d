"""Pallas TPU kernel: full-search SAD over a +-R window, 8x8 granularity.

The XLA slice-formulated search (encode/device.py) re-reads the padded
reference frame from HBM once per candidate offset ((2R+1)^2 times); this
kernel keeps one MB-row band of source + reference resident in VMEM and
sweeps all offsets from there — HBM traffic drops from O(K^2 * H * W) to
O(H * W), the speed-of-light for this operation.

Grid: one program per MB row; the (overlapping) reference bands are
materialized once as (mbh, 16+2R, W+2R) so plain BlockSpecs apply.

Structure: phase 1 accumulates per-column |src-cand| sums for ALL K^2
offsets into a VMEM scratch — split into the MB's TOP and BOTTOM 8-row
halves (pure VPU work, both offset loops unrolled so every candidate is a
static lane-shifted slice).  Phase 2 reduces columns to per-8x8-QUADRANT
SADs with large MXU matmuls against an iota-built 8-wide block-indicator
matrix (one small matmul per offset would be latency-bound).  Quadrant SADs
serve every inter partition decision at once: 16x16 = sum of 4, 16x8 =
row-half pairs, 8x16 = column-half pairs, 8x8 = the quadrants themselves
(the reference forwards this capability surface as x264 --partitions,
/root/reference/codec.c:887).

The MXU rounds operands to bf16 (8-bit mantissa), so column sums are split
into exact byte halves — every product is exactly representable and the
SADs are bit-exact.

Used behind EncoderConfig.me_backend; validated bit-equal to the XLA search
(interpret mode on CPU in tests, compiled vs golden on real TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sad_kernel(src_ref, band_ref, out_ref, cs_ref, *, R: int, mbw: int):
    K = 2 * R + 1
    W = mbw * 16
    src = src_ref[:]                                   # (16, W) int16

    # phase 1: per-column abs-diff sums for every offset, split into the
    # top/bottom 8-row halves -> scratch rows [2k] / [2k+1].  Both offset
    # loops are UNROLLED so every candidate is a *static* (possibly
    # lane-unaligned) slice — Mosaic lowers those to one or two lane-shift
    # ops, an order of magnitude cheaper than a dynamic pltpu.roll per
    # offset (which dominated the whole encoder).
    for oy in range(K):
        rows = band_ref[0, oy:oy + 16, :]  # (16, bw), static slice
        for ox in range(K):
            cand = rows[:, ox:ox + W]                  # static unaligned
            # |src-cand| as max(a-b, b-a): Mosaic has no int16 vector absi
            # (math.absi fails to legalize on real TPU; interpret mode and
            # CPU hide this — the gotcha in .claude/skills/verify)
            d = jnp.maximum(src - cand, cand - src)    # int16: <= 255
            k = oy * K + ox
            cs_ref[2 * k, :W] = jnp.sum(d[:8], axis=0)          # <= 2040
            cs_ref[2 * k + 1, :W] = jnp.sum(d[8:], axis=0)

    # phase 2: column -> 8-wide block reduction as big MXU matmuls (chunked
    # over offset rows to bound transient f32 VMEM).  Output row layout
    # matches the scratch: row 2k = top half, 2k+1 = bottom half; columns
    # are the 2*mbw 8-pel-wide block positions.
    mbw2_pad = out_ref.shape[2]
    bw = band_ref.shape[2]
    iw = jax.lax.broadcasted_iota(jnp.int32, (bw, mbw2_pad), 0)
    im = jax.lax.broadcasted_iota(jnp.int32, (bw, mbw2_pad), 1)
    E = ((iw >> 3) == im).astype(jnp.float32)

    KK2 = 2 * K * K
    CH = 256
    for c in range(0, KK2, CH):
        h = min(CH, KK2 - c)
        cs = cs_ref[c:c + h, :].astype(jnp.int32)      # sums are >= 0
        lo = (cs & 0xFF).astype(jnp.float32)
        hi = ((cs >> 8) & 0xFF).astype(jnp.float32)
        sums = (jnp.dot(lo, E, preferred_element_type=jnp.float32)
                + 256.0 * jnp.dot(hi, E, preferred_element_type=jnp.float32))
        out_ref[0, c:c + h, :] = sums.astype(jnp.int32)


@partial(jax.jit, static_argnames=("R", "interpret"))
def sad_search_quad(src_y: jnp.ndarray, ref_pad: jnp.ndarray, R: int,
                    interpret: bool = False) -> jnp.ndarray:
    """src_y: (H, W) int; ref_pad: (H + 2R, W + 2R) int (edge-padded).

    Returns quadrant SADs (K*K, 2*mbh, 2*mbw) int32 at 8x8 granularity:
    entry [k, qy, qx] is the SAD of the 8x8 block at (8*qy, 8*qx) against
    the reference displaced by (dy, dx) = (k // K - R, k % K - R).
    """
    H, W = src_y.shape
    mbh, mbw = H // 16, W // 16
    K = 2 * R + 1
    band_h = 16 + 2 * R
    # lane-align the band width and the per-row block count (Mosaic
    # requires 128-multiples on the minor dim)
    bw = (W + 2 * R + 127) // 128 * 128
    mbw2_pad = (2 * mbw + 127) // 128 * 128
    kk2_pad = (2 * K * K + 7) // 8 * 8
    ref_w = jnp.pad(ref_pad, ((0, 0), (0, bw - (W + 2 * R))), mode="edge")
    bands = jnp.stack([
        jax.lax.dynamic_slice(ref_w, (i * 16, 0), (band_h, bw))
        for i in range(mbh)])

    out = pl.pallas_call(
        partial(_sad_kernel, R=R, mbw=mbw),
        out_shape=jax.ShapeDtypeStruct((mbh, 2 * K * K, mbw2_pad), jnp.int32),
        grid=(mbh,),
        in_specs=[
            pl.BlockSpec((16, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, band_h, bw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * K * K, mbw2_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((kk2_pad, bw), jnp.int16)],
        interpret=interpret,
    )(src_y.astype(jnp.int16), bands.astype(jnp.int16))
    # (mbh, 2*K*K, 2*mbw) -> (K*K, 2*mbh, 2*mbw)
    q = out[:, :, :2 * mbw].reshape(mbh, K * K, 2, 2 * mbw)
    return q.transpose(1, 0, 2, 3).reshape(K * K, 2 * mbh, 2 * mbw)


@partial(jax.jit, static_argnames=("R", "interpret"))
def sad_search(src_y: jnp.ndarray, ref_pad: jnp.ndarray, R: int,
               interpret: bool = False) -> jnp.ndarray:
    """16x16 SAD view of sad_search_quad (kept for the P16-only paths).

    Returns sads (K*K, mbh, mbw) int32 with offset id k = (dy+R)*K + (dx+R).
    """
    H, W = src_y.shape
    mbh, mbw = H // 16, W // 16
    q = sad_search_quad(src_y, ref_pad, R, interpret=interpret)
    KK = q.shape[0]
    q4 = q.reshape(KK, mbh, 2, mbw, 2)
    return q4.sum(axis=(2, 4))
