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
import numpy as np
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
    #
    # Arithmetic is int32: current libtpu Mosaic fails to legalize most
    # int16 vector ops (sub/min/max/shift/select all die in
    # tpu_compile_helper; only add/xor survive — probed on real TPU).
    # Storage stays int16 (band/scratch) for VMEM footprint; each band row
    # is widened once per oy, so the converts are O(K), not O(K^2).
    src32 = src.astype(jnp.int32)
    for oy in range(K):
        rows = band_ref[0, oy:oy + 16, :].astype(jnp.int32)  # (16, bw)
        for ox in range(K):
            cand = rows[:, ox:ox + W]                  # static unaligned
            d = jnp.maximum(src32 - cand, cand - src32)        # <= 255
            k = oy * K + ox
            cs_ref[2 * k, :W] = jnp.sum(d[:8], axis=0).astype(jnp.int16)
            cs_ref[2 * k + 1, :W] = jnp.sum(d[8:], axis=0).astype(jnp.int16)

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


def _chunking(KK: int) -> tuple:
    """Uniform phase-2 chunking: (chunk_rows, padded_row_count).

    Equal-size chunks keep the in-kernel fori_loop shape-uniform; rows in
    [KK, KKp) are argmin-neutral (host sets their pen to BIG)."""
    nch = max(1, -(-KK // 128))
    ch = (-(-KK // nch) + 7) // 8 * 8
    return ch, ch * nch


def _row_geometry(K: int) -> tuple:
    """Scratch row layout for the argmin kernel: offset (oy, ox) lives at
    row oy*Kp + ox (Kp = pad8(K)) so each oy's K-row group can be stored
    with ONE 8-aligned dynamic store (Mosaic requires dynamic sublane
    indices to be provably 8-aligned).  Returns (Kp, chunk, NRp) with NRp
    the chunk-padded total rows per half."""
    Kp = (K + 7) // 8 * 8
    ch, nrp = _chunking(K * Kp)
    return Kp, ch, nrp


def _sad_argmin_kernel(src_ref, band_ref, pen_ref, kmap_ref, out_ref,
                       cs_ref, band2_ref, *, R: int, mbw: int,
                       scales: tuple):
    """Full SAD sweep + in-kernel argmin over offsets, per partition shape.

    Emits, per MB row, only the best (cost, offset-id) pair for each of the
    six partition cost planes — 16x16, 16x8 top/bottom, 8x16 (lane = x
    half), 8x8 top/bottom (lane = x quadrant) — instead of the full
    (2*K*K, lanes) SAD tensor.  The full tensor at 1080p/R=8 is ~40 MB and
    the newer libtpu stack-allocates pallas outputs in VMEM inside scans
    (hard OOM); the reduction also kills ~190 MB/frame of HBM traffic the
    host-side argmin used to re-read.  Cost model matches the XLA path
    bit-for-bit: cost_X = 4 * SAD_X + scales[X] * (|dy| + |dx|); the
    smallest offset id k = (dy+R)*K + (dx+R) wins ties via a lexicographic
    (cost, k) reduction over the host-supplied kmap, so the padded scratch
    row layout never leaks into the result.
    """
    K = 2 * R + 1
    Kp, CH, NRp = _row_geometry(K)
    W = mbw * 16
    src32 = src_ref[:].astype(jnp.int32)

    # phase 1 (same math as _sad_kernel): per-column |src-cand| sums, int32
    # math / int16 storage; TOP halves in rows [0, NRp), BOTTOM at NRp +.
    # The oy loop is a fori_loop — a fully unrolled K^2 body makes Mosaic
    # stack-allocate every iteration's int32 temps at once (~30 MB at
    # 1080p/R=8, a hard VMEM OOM).  Mosaic constraints shape the rest:
    # dynamic sublane loads must be 2D and provably 8-aligned, so the band
    # stages through a 2D scratch, oy splits as 8a + b (b a static python
    # loop, the window load starts at 8a, b is a static slice of the
    # window), and each oy's K per-ox rows are stacked locally and written
    # with one aligned store at row oy*Kp.
    band2_ref[:16 + 2 * R, :] = band_ref[0]
    WH = 24                                     # 16 rows + max static b

    def make_body(b):
        def body(a, _):
            oy = a * 8 + b
            win = band2_ref[pl.ds(a * 8, WH), :]
            rows = win[b:b + 16].astype(jnp.int32)
            top = []
            bot = []
            for ox in range(K):
                cand = rows[:, ox:ox + W]
                d = jnp.maximum(src32 - cand, cand - src32)
                top.append(jnp.sum(d[:8], axis=0).astype(jnp.int16))
                bot.append(jnp.sum(d[8:], axis=0).astype(jnp.int16))
            pad = [jnp.zeros((W,), jnp.int16)] * (Kp - K)
            cs_ref[pl.ds(oy * Kp, Kp), :W] = jnp.stack(top + pad)
            cs_ref[pl.ds(NRp + oy * Kp, Kp), :W] = jnp.stack(bot + pad)
            return 0
        return body

    for b in range(min(8, K)):
        na = (K - 1 - b) // 8 + 1
        jax.lax.fori_loop(0, na, make_body(b), 0)

    # phase 2: two indicator matmuls give 8-wide (lane = x quadrant) and
    # 16-wide (lane = MB x) block sums of each chunk of offset rows; six
    # cost planes then reduce to running (min, smallest-k) accumulators.
    # bf16 operands are exact here (byte halves <= 255, indicator 0/1,
    # f32 accumulation of <= 2^12 exact products).
    L = out_ref.shape[2]
    bw = band_ref.shape[2]
    f32 = jnp.float32
    iw = jax.lax.broadcasted_iota(jnp.int32, (bw, L), 0)
    im = jax.lax.broadcasted_iota(jnp.int32, (bw, L), 1)
    E8 = ((iw >> 3) == im).astype(jnp.bfloat16)
    BIG = jnp.int32(1 << 28)
    # 16-wide sums are lane-pair adds of the 8-wide results (at EVEN
    # lanes; odd lanes carry garbage the host never reads) — half the
    # matmul flops of a separate E16 reduction
    lane = jax.lax.broadcasted_iota(jnp.int32, (CH, L), 1)
    even = (lane & 1) == 0

    def pairsum(x):
        return jnp.where(even, x + pltpu.roll(x, L - 1, axis=1),
                         x + pltpu.roll(x, 1, axis=1))

    def chunk_body(i, carry):
        c = i * CH

        def q_pair(base):
            cs = cs_ref[pl.ds(base + c, CH), :].astype(jnp.int32)
            lo = (cs & 0xFF).astype(jnp.bfloat16)
            hi = ((cs >> 8) & 0xFF).astype(jnp.bfloat16)
            return (jnp.dot(lo, E8, preferred_element_type=f32)
                    + 256.0 * jnp.dot(hi, E8, preferred_element_type=f32)
                    ).astype(jnp.int32)

        qt8 = q_pair(0)                 # top-half sums, 8-wide
        qb8 = q_pair(NRp)               # bottom-half sums
        qt16 = pairsum(qt8)             # 16-wide at even lanes
        qb16 = pairsum(qb8)
        # pen/kmap rows for padding (ox >= K or beyond K*Kp) are BIG on the
        # host, so scratch garbage there can never win the argmin
        pen = pen_ref[pl.ds(c, CH), :]
        kmap = kmap_ref[pl.ds(c, CH), :]
        costs = (
            (qt16 + qb16) * 4 + scales[0] * pen,   # 16x16 (lane = mbx)
            qt16 * 4 + scales[1] * pen,            # 16x8 top
            qb16 * 4 + scales[1] * pen,            # 16x8 bottom
            (qt8 + qb8) * 4 + scales[2] * pen,     # 8x16 (lane = qx)
            qt8 * 4 + scales[3] * pen,             # 8x8 top
            qb8 * 4 + scales[3] * pen,             # 8x8 bottom
        )
        out = []
        for j, cst in enumerate(costs):
            m = jnp.min(cst, axis=0, keepdims=True)
            idx = jnp.min(jnp.where(cst == m, kmap, BIG), axis=0,
                          keepdims=True)
            pb, pk = carry[2 * j], carry[2 * j + 1]
            upd = (m < pb) | ((m == pb) & (idx < pk))
            out.append(jnp.where(upd, m, pb))
            out.append(jnp.where(upd, idx, pk))
        return tuple(out)

    init = tuple(jnp.full((1, L), BIG, jnp.int32) for _ in range(12))
    res = jax.lax.fori_loop(0, NRp // CH, chunk_body, init)

    for j in range(6):
        out_ref[0, 2 * j:2 * j + 1, :] = res[2 * j]
        out_ref[0, 2 * j + 1:2 * j + 2, :] = res[2 * j + 1]
    out_ref[0, 12:16, :] = jnp.zeros((4, L), jnp.int32)


@partial(jax.jit, static_argnames=("R", "scales", "interpret"))
def sad_partition_minima(src_y: jnp.ndarray, ref_pad: jnp.ndarray, R: int,
                         scales: tuple = (4, 2, 2, 1),
                         interpret: bool = False) -> dict:
    """Best (cost, offset) per partition shape, reduced on device.

    src_y: (H, W) int; ref_pad: (H + 2R, W + 2R) int (edge-padded).
    cost_X = 4*SAD_X + scales[X]*(|dy|+|dx|); ties resolve to the smallest
    k = (dy+R)*K + (dx+R), matching jnp.argmin over the full SAD tensor.

    Returns dict of int32 arrays:
      v16/k16 (mbh, mbw), v168/k168 (mbh, mbw, 2 [top,bottom]),
      v816/k816 (mbh, mbw, 2 [left,right]), v8/k8 (2mbh, 2mbw).
    """
    H, W = src_y.shape
    mbh, mbw = H // 16, W // 16
    K = 2 * R + 1
    Kp, _, NRp = _row_geometry(K)
    band_h = 16 + 2 * R
    bw = (W + 2 * R + 127) // 128 * 128
    L = (2 * mbw + 127) // 128 * 128
    # scoped-VMEM budget: the (2*NRp, bw) int16 column-sum scratch plus —
    # under the GOP scans — the ENTIRE output tensor, which this libtpu
    # stack-allocates in VMEM (observed at 4K/merange 8 and 1080p/merange
    # 16: >16 MB scoped limit).  Split wide frames into vertical strips
    # with a 2R halo — per-MB results are invariant to the split (each
    # MB's whole search window lives inside its strip).
    est = (2 * NRp * bw * 2 + ((K - 1) // 8 * 8 + 24) * bw * 2
           + 4 * NRp * L * 4 + 2 * band_h * bw * 2
           + mbh * 16 * L * 4)
    if est > 11 << 20 and mbw > 32:
        return _sad_partition_minima_tiled(src_y, ref_pad, R, scales,
                                           interpret)
    ref_w = jnp.pad(ref_pad, ((0, 0), (0, bw - (W + 2 * R))), mode="edge")
    bands = jnp.stack([
        jax.lax.dynamic_slice(ref_w, (i * 16, 0), (band_h, bw))
        for i in range(mbh)])

    # scratch row r holds offset (oy = r // Kp, ox = r % Kp); rows with
    # ox >= K (and any beyond K*Kp) are layout padding — argmin-neutral via
    # BIG pen/kmap
    r_oy = np.arange(NRp) // Kp
    r_ox = np.arange(NRp) % Kp
    valid = (r_ox < K) & (r_oy < K)
    pen_r = np.abs(r_oy - R) + np.abs(r_ox - R)
    pen_np = np.where(valid, pen_r, 1 << 28).astype(np.int32)
    kmap_np = np.where(valid, r_oy * K + r_ox, 1 << 28).astype(np.int32)

    out = pl.pallas_call(
        partial(_sad_argmin_kernel, R=R, mbw=mbw, scales=scales),
        out_shape=jax.ShapeDtypeStruct((mbh, 16, L), jnp.int32),
        grid=(mbh,),
        in_specs=[
            pl.BlockSpec((16, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, band_h, bw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NRp, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NRp, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, L), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * NRp, bw), jnp.int16),
                        # rows: aligned window reach (8*a_max + 24) >= band_h
                        pltpu.VMEM(((K - 1) // 8 * 8 + 24, bw), jnp.int16)],
        interpret=interpret,
    )(src_y.astype(jnp.int16), bands.astype(jnp.int16),
      jnp.asarray(np.broadcast_to(pen_np[:, None], (NRp, L)).copy()),
      jnp.asarray(np.broadcast_to(kmap_np[:, None], (NRp, L)).copy()))

    q2 = 2 * mbw
    ev = slice(0, q2, 2)           # 16-wide planes live at even lanes
    v168 = jnp.stack([out[:, 2, ev], out[:, 4, ev]], axis=-1)
    k168 = jnp.stack([out[:, 3, ev], out[:, 5, ev]], axis=-1)
    v8 = jnp.stack([out[:, 8, :q2], out[:, 10, :q2]], axis=1
                   ).reshape(2 * mbh, q2)
    k8 = jnp.stack([out[:, 9, :q2], out[:, 11, :q2]], axis=1
                   ).reshape(2 * mbh, q2)
    return {
        "v16": out[:, 0, ev], "k16": out[:, 1, ev],
        "v168": v168, "k168": k168,
        "v816": out[:, 6, :q2].reshape(mbh, mbw, 2),
        "k816": out[:, 7, :q2].reshape(mbh, mbw, 2),
        "v8": v8, "k8": k8,
    }


def _sad_partition_minima_tiled(src_y, ref_pad, R, scales, interpret):
    """Width-tiled variant of sad_partition_minima (same results).

    Strips of MB_T MBs with a 2R ref halo; grid (mbh, n_t).  Used when the
    untiled per-row footprint would blow the scoped VMEM limit."""
    H, W = src_y.shape
    mbh, mbw = H // 16, W // 16
    K = 2 * R + 1
    Kp, _, NRp = _row_geometry(K)
    band_h = 16 + 2 * R
    MB_T = 32                                # 512-px strips
    TW = MB_T * 16
    n_t = (mbw + MB_T - 1) // MB_T
    Wp = n_t * TW
    tbw = (TW + 2 * R + 127) // 128 * 128
    Lt = (2 * MB_T + 127) // 128 * 128
    src_p = jnp.pad(src_y, ((0, 0), (0, Wp - W)), mode="edge")
    ref_w = jnp.pad(ref_pad, ((0, 0), (0, (Wp + 2 * R + tbw) - (W + 2 * R))),
                    mode="edge")
    # (n_t, mbh, band_h, tbw) ref strips; (n_t, mbh, 16, TW) src strips
    bands = jnp.stack([
        jnp.stack([jax.lax.dynamic_slice(ref_w, (i * 16, t * TW),
                                         (band_h, tbw))
                   for i in range(mbh)])
        for t in range(n_t)])
    src_t = jnp.stack([
        src_p[:, t * TW:(t + 1) * TW].reshape(mbh, 16, TW)
        for t in range(n_t)])

    r_oy = np.arange(NRp) // Kp
    r_ox = np.arange(NRp) % Kp
    valid = (r_ox < K) & (r_oy < K)
    pen_r = np.abs(r_oy - R) + np.abs(r_ox - R)
    pen_np = np.where(valid, pen_r, 1 << 28).astype(np.int32)
    kmap_np = np.where(valid, r_oy * K + r_ox, 1 << 28).astype(np.int32)

    def kern(src_ref, band_ref, pen_ref, kmap_ref, out_ref, cs_ref, b2_ref,
             **kw):
        _sad_argmin_kernel(src_ref.at[0, 0], band_ref.at[0], pen_ref,
                           kmap_ref, out_ref.at[:, 0], cs_ref, b2_ref, **kw)

    out = pl.pallas_call(
        partial(kern, R=R, mbw=MB_T, scales=scales),
        out_shape=jax.ShapeDtypeStruct((mbh, n_t, 16, Lt), jnp.int32),
        grid=(mbh, n_t),
        in_specs=[
            pl.BlockSpec((1, 1, 16, TW), lambda i, t: (t, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, band_h, tbw), lambda i, t: (t, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NRp, Lt), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NRp, Lt), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 16, Lt), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * NRp, tbw), jnp.int16),
                        pltpu.VMEM(((K - 1) // 8 * 8 + 24, tbw), jnp.int16)],
        interpret=interpret,
    )(src_t.astype(jnp.int16), bands.astype(jnp.int16),
      jnp.asarray(np.broadcast_to(pen_np[:, None], (NRp, Lt)).copy()),
      jnp.asarray(np.broadcast_to(kmap_np[:, None], (NRp, Lt)).copy()))

    # reassemble lanes across strips, then crop the width padding
    # (16-wide planes live at even lanes within each strip)
    one = jnp.concatenate([out[:, t, :, 0:2 * MB_T:2] for t in range(n_t)],
                          axis=-1)
    two = jnp.concatenate([out[:, t, :, :2 * MB_T] for t in range(n_t)],
                          axis=-1)
    q2 = 2 * mbw
    v168 = jnp.stack([one[:, 2, :mbw], one[:, 4, :mbw]], axis=-1)
    k168 = jnp.stack([one[:, 3, :mbw], one[:, 5, :mbw]], axis=-1)
    v8 = jnp.stack([two[:, 8, :q2], two[:, 10, :q2]], axis=1
                   ).reshape(2 * mbh, q2)
    k8 = jnp.stack([two[:, 9, :q2], two[:, 11, :q2]], axis=1
                   ).reshape(2 * mbh, q2)
    return {
        "v16": one[:, 0, :mbw], "k16": one[:, 1, :mbw],
        "v168": v168, "k168": k168,
        "v816": two[:, 6, :q2].reshape(mbh, mbw, 2),
        "k816": two[:, 7, :q2].reshape(mbh, mbw, 2),
        "v8": v8, "k8": k8,
    }


@partial(jax.jit, static_argnames=("R", "interpret"))
def sad16_argmin(src_y: jnp.ndarray, ref_pad: jnp.ndarray, R: int,
                 interpret: bool = False) -> jnp.ndarray:
    """Best offset id per MB for cost = 4*SAD16 + (|dy|+|dx|).

    Drop-in for argmin(sad_search(...)*4 + pen) without materializing the
    (K*K, mbh, mbw) tensor.  Returns k16 (mbh, mbw) int32.
    """
    mins = sad_partition_minima(src_y, ref_pad, R, scales=(1, 0, 0, 0),
                                interpret=interpret)
    return mins["k16"]


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
