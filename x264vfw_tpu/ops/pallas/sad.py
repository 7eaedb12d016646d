"""Pallas TPU kernel: full-search 16x16 SAD over a +-R window.

The XLA slice-formulated search (encode/device.py) re-reads the padded
reference frame from HBM once per candidate offset ((2R+1)^2 times); this
kernel keeps one MB-row band of source + reference resident in VMEM and
sweeps all offsets from there — HBM traffic drops from O(K^2 * H * W) to
O(H * W), the speed-of-light for this operation.

Grid: one program per MB row; the (overlapping) reference bands are
materialized once as (mbh, 16+2R, W+2R) so plain BlockSpecs apply.

Structure: phase 1 accumulates per-column |src-cand| sums for ALL K^2
offsets into a VMEM scratch (pure VPU work); phase 2 reduces columns
to per-MB SADs with a handful of large MXU matmuls against an iota-built
block-indicator matrix (one small matmul per offset would be latency-bound).
The MXU rounds operands to bf16 (8-bit mantissa), so column sums are split
into exact byte halves — every product is exactly representable and the SADs
are bit-exact.

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
    bw = band_ref.shape[2]
    src = jnp.pad(src_ref[:], ((0, 0), (0, bw - W)))   # (16, bw) int32
    # (dynamic rotate is only implemented for 32-bit data, hence int32 inputs)

    # phase 1: per-column abs-diff sums for every offset -> scratch rows.
    # Columns >= W are junk-but-bounded (they only reach output rows/cols
    # that are sliced away).  pltpu.roll requires shift >= 0; negative
    # traced shifts miscompile at odd lane-tile widths (v5e), so use the
    # positive equivalent.
    for oy in range(K):
        rows = band_ref[0, oy:oy + 16, :]  # (16, bw), static slice

        def body(ox, _, rows=rows, oy=oy):
            cand = pltpu.roll(rows, jnp.where(ox == 0, 0, bw - ox), 1)
            d = jnp.abs(src - cand)
            colsum = jnp.sum(d, axis=0)                        # <= 4080
            cs_ref[pl.ds(oy * K + ox, 1), :] = colsum[None]
            return 0

        jax.lax.fori_loop(0, K, body, 0)

    # phase 2: column -> MB reduction as big MXU matmuls (chunked over
    # offset rows to bound transient f32 VMEM)
    mbw_pad = out_ref.shape[2]
    iw = jax.lax.broadcasted_iota(jnp.int32, (bw, mbw_pad), 0)
    im = jax.lax.broadcasted_iota(jnp.int32, (bw, mbw_pad), 1)
    E = ((iw >> 4) == im).astype(jnp.float32)

    KK = K * K
    CH = 128
    for c in range(0, KK, CH):
        h = min(CH, KK - c)
        cs = cs_ref[c:c + h, :]
        lo = (cs & 0xFF).astype(jnp.float32)
        hi = ((cs >> 8) & 0xFF).astype(jnp.float32)
        sums = (jnp.dot(lo, E, preferred_element_type=jnp.float32)
                + 256.0 * jnp.dot(hi, E, preferred_element_type=jnp.float32))
        out_ref[0, c:c + h, :] = sums.astype(jnp.int32)


@partial(jax.jit, static_argnames=("R", "interpret"))
def sad_search(src_y: jnp.ndarray, ref_pad: jnp.ndarray, R: int,
               interpret: bool = False) -> jnp.ndarray:
    """src_y: (H, W) int; ref_pad: (H + 2R, W + 2R) int (edge-padded).

    Returns sads (K*K, mbh, mbw) int32 with offset id k = (dy+R)*K + (dx+R).
    """
    H, W = src_y.shape
    mbh, mbw = H // 16, W // 16
    K = 2 * R + 1
    band_h = 16 + 2 * R
    # lane-align the band width and the per-row MB count (Mosaic requires
    # 128-multiples on the minor dim)
    bw = (W + 2 * R + 127) // 128 * 128
    mbw_pad = (mbw + 127) // 128 * 128
    kk_pad = (K * K + 7) // 8 * 8
    ref_w = jnp.pad(ref_pad, ((0, 0), (0, bw - (W + 2 * R))), mode="edge")
    bands = jnp.stack([
        jax.lax.dynamic_slice(ref_w, (i * 16, 0), (band_h, bw))
        for i in range(mbh)])

    out = pl.pallas_call(
        partial(_sad_kernel, R=R, mbw=mbw),
        out_shape=jax.ShapeDtypeStruct((mbh, K * K, mbw_pad), jnp.int32),
        grid=(mbh,),
        in_specs=[
            pl.BlockSpec((16, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, band_h, bw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K * K, mbw_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((kk_pad, bw), jnp.int32)],
        interpret=interpret,
    )(src_y.astype(jnp.int32), bands.astype(jnp.int32))
    return out[:, :, :mbw].transpose(1, 0, 2)   # (K*K, mbh, mbw)
