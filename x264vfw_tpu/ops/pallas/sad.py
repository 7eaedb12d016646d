"""Pallas TPU kernel: full-search 16x16 SAD over a +-R window.

The XLA slice-formulated search (encode/device.py) re-reads the padded
reference frame from HBM once per candidate offset ((2R+1)^2 times); this
kernel keeps one MB-row band of source + reference resident in VMEM and
sweeps all offsets from there — HBM traffic drops from O(K^2 * H * W) to
O(H * W), the speed-of-light for this operation.

Grid: one program per MB row; the (overlapping) reference bands are
materialized once as (mbh, 16+2R, W+2R) so plain BlockSpecs apply.

Used behind EncoderConfig.use_pallas_me; validated bit-equal to the XLA
search (interpret mode on CPU in tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sad_kernel(src_ref, band_ref, out_ref, *, R: int, mbw: int):
    K = 2 * R + 1
    W = mbw * 16
    src = src_ref[:]                       # (16, W) int32
    # per-MB column aggregation as an MXU matmul (Mosaic can't shape-cast
    # (16, W) -> (16, mbw, 16) in-kernel): E[w, m] = 1 iff column w is in MB m
    mbw_pad = (mbw + 127) // 128 * 128
    iw = jax.lax.broadcasted_iota(jnp.int32, (W, mbw_pad), 0)
    im = jax.lax.broadcasted_iota(jnp.int32, (W, mbw_pad), 1)
    E = ((iw >> 4) == im).astype(jnp.float32)

    # static vertical offsets (sublane-aligned); dynamic horizontal offsets
    # via lane rotate (unaligned lane slices are not expressible in Mosaic)
    for oy in range(K):
        rows = band_ref[0, oy:oy + 16, :]      # (16, W + 2R), static slice

        def body(ox, _, rows=rows, oy=oy):
            # pltpu.roll documents shift >= 0; traced negative shifts are
            # silently miscompiled when the lane dim is an odd multiple of
            # 128 (observed on v5e) — use the positive equivalent
            bw = rows.shape[1]
            cand = pltpu.roll(rows, jnp.where(ox == 0, 0, bw - ox), 1)[:, :W]
            d = jnp.abs(src - cand)
            colsum = jnp.sum(d, axis=0, keepdims=True)      # <= 4080 (12 bit)
            # MXU rounds operands to bf16 (8-bit mantissa): split into exact
            # byte halves so every product is exactly representable
            lo = (colsum & 0xFF).astype(jnp.float32)
            hi = (colsum >> 8).astype(jnp.float32)
            sums = (jnp.dot(lo, E, preferred_element_type=jnp.float32)
                    + 256.0 * jnp.dot(hi, E, preferred_element_type=jnp.float32))
            out_ref[0, oy * K + ox, :] = sums[0].astype(jnp.int32)
            return 0

        jax.lax.fori_loop(0, K, body, 0)


@partial(jax.jit, static_argnames=("R", "interpret"))
def sad_search(src_y: jnp.ndarray, ref_pad: jnp.ndarray, R: int,
               interpret: bool = False) -> jnp.ndarray:
    """src_y: (H, W) int32; ref_pad: (H + 2R, W + 2R) int32 (edge-padded).

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
        interpret=interpret,
    )(src_y.astype(jnp.int32), bands.astype(jnp.int32))
    return out[:, :, :mbw].transpose(1, 0, 2)   # (K*K, mbh, mbw)
