"""TPU device encode pipeline (JAX/XLA).

The per-macroblock compute of the encoder as batched, jit-compiled device
functions:

* P frames are fully data-parallel over macroblocks: motion search, motion
  compensation, residual transform+quant, and reconstruction all run as one
  fused XLA program over the (nMB, ...) batch.
* I frames use a row-scan: the top MB row is a left-to-right `lax.scan`
  (DC prediction from the left neighbor's recon), subsequent rows use
  vertical (V) prediction so each row depends only on the previous row's
  bottom recon line — a `lax.scan` over rows with full-width vectorization.

Outputs are syntax tensors (levels in zigzag+block-coding order, CBPs, MVs,
modes, total-coeff maps) consumed by the numpy-vectorized host entropy stage
(bitstream/cavlc_vec.py) — the tensor->bitstream ABI from SURVEY.md §7.

Capability replaced: libx264's analyse/encode inner loops
(/root/reference/codec.c:1693).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import transform as tj
from ..ops.transform_np import ZIGZAG_4x4

# luma 4x4 block coding order <-> raster within MB
# NUMPY on purpose, not jnp: module-level concrete device arrays captured
# by a jit trace poison jax 0.9's constant handling — a later retrace sees
# the first trace's cached tracer (UnexpectedTracerError), and re-dispatch
# can drop hoisted constant buffers.  numpy constants embed as HLO literals.
BLK_X = np.asarray([0, 1, 0, 1, 2, 3, 2, 3, 0, 1, 0, 1, 2, 3, 2, 3])
BLK_Y = np.asarray([0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3])
ZZ = np.asarray(ZIGZAG_4x4)


def mbize(plane: jnp.ndarray, bs: int = 16) -> jnp.ndarray:
    """(H, W) -> (H//bs * W//bs, bs, bs) in MB raster order."""
    H, W = plane.shape
    return (plane.reshape(H // bs, bs, W // bs, bs)
            .transpose(0, 2, 1, 3)
            .reshape(-1, bs, bs))


def unmbize(mbs: jnp.ndarray, H: int, W: int, bs: int = 16) -> jnp.ndarray:
    return (mbs.reshape(H // bs, W // bs, bs, bs)
            .transpose(0, 2, 1, 3)
            .reshape(H, W))


def mb_to_blocks(mbs: jnp.ndarray) -> jnp.ndarray:
    """(n, 16, 16) -> (n, 16, 4, 4) in block coding order."""
    n = mbs.shape[0]
    q = (mbs.reshape(n, 4, 4, 4, 4).transpose(0, 1, 3, 2, 4))
    # q[n, by, bx, 4, 4] raster blocks
    raster = q.reshape(n, 16, 4, 4)
    idx = BLK_Y * 4 + BLK_X
    return jnp.take(raster, idx, axis=1)


def blocks_to_mb(blocks: jnp.ndarray) -> jnp.ndarray:
    """(n, 16, 4, 4) block coding order -> (n, 16, 16)."""
    n = blocks.shape[0]
    inv = jnp.zeros(16, jnp.int32).at[BLK_Y * 4 + BLK_X].set(jnp.arange(16, dtype=jnp.int32))
    raster = jnp.take(blocks, inv, axis=1).reshape(n, 4, 4, 4, 4)
    return raster.transpose(0, 1, 3, 2, 4).reshape(n, 16, 16)


def c8_to_blocks(c8: jnp.ndarray) -> jnp.ndarray:
    """(n, 8, 8) -> (n, 4, 4, 4) raster sub-block order."""
    n = c8.shape[0]
    return c8.reshape(n, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4).reshape(n, 4, 4, 4)


def blocks_to_c8(blocks: jnp.ndarray) -> jnp.ndarray:
    n = blocks.shape[0]
    return (blocks.reshape(n, 2, 2, 4, 4).transpose(0, 1, 3, 2, 4)
            .reshape(n, 8, 8))


def zigzag16(blocks: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) -> (..., 16) zigzag order."""
    return jnp.take(blocks.reshape(*blocks.shape[:-2], 16), ZZ, axis=-1)


def aq_qp_map(src_y: jnp.ndarray, qp, aq_strength: float) -> jnp.ndarray:
    """Variance adaptive quantization (the reference's --aq-mode 1 /
    --aq-strength surface, codec.c:911-912): busy MBs get a higher QP,
    flat MBs a lower one, normalized to the frame's mean energy.

    Returns per-MB QP (n,) int32 clipped to [1, 51]."""
    mbs = mbize(src_y).astype(jnp.float32)          # (n, 16, 16)
    mean = mbs.mean(axis=(1, 2), keepdims=True)
    var = ((mbs - mean) ** 2).mean(axis=(1, 2))     # (n,)
    energy = jnp.log2(var + 1.0)
    adj = aq_strength * 1.2 * (energy - energy.mean())
    adj = jnp.clip(jnp.round(adj), -6, 6).astype(jnp.int32)
    return jnp.clip(jnp.asarray(qp, jnp.int32) + adj, 1, 51)


def realized_qp_chain(qp_mb: jnp.ndarray, coded: jnp.ndarray, slice_qp):
    """Decoder-visible per-MB QP: only MBs that signal mb_qp_delta (coded
    residual) can move QP; others inherit the previous MB's QP (§7.4.5).

    Returns (qp_real (n,), qp_delta (n,)) — delta is meaningful only where
    coded."""
    n = qp_mb.shape[0]
    i = jnp.arange(n, dtype=jnp.int32)
    idx = jax.lax.cummax(jnp.where(coded, i, -1))
    qp_real = jnp.where(idx >= 0, qp_mb[jnp.maximum(idx, 0)],
                        jnp.asarray(slice_qp, jnp.int32))
    prev = jnp.concatenate([jnp.asarray(slice_qp, jnp.int32)[None],
                            qp_real[:-1]])
    delta = jnp.where(coded, qp_mb - prev, 0)
    return qp_real, delta


# --------------------------------------------------------------------------
# P-frame pipeline
# --------------------------------------------------------------------------

def _halfpel_planes(ref_pad):
    """Spec half-pel planes of a padded reference (§8.4.2.2.1, 6-tap).

    ref_pad: (Hp, Wp) int32, padded by >=3 on every side vs the region the
    caller will read.  Returns (b, h, j) where, for integer coords (y, x):
      b[y, x] = sample at (y, x+1/2),  h[y, x] = (y+1/2, x),
      j[y, x] = (y+1/2, x+1/2).
    Output arrays are valid on [3:-3] of each axis (edges hold garbage).
    """
    Hp, Wp = ref_pad.shape

    def f6_x(a):
        # 6-tap along x: out[y, x] uses a[y, x-2 .. x+3]; edges wrap via roll
        # (callers never read within 3 px of the border)
        return (jnp.roll(a, 2, 1) - 5 * jnp.roll(a, 1, 1) + 20 * a
                + 20 * jnp.roll(a, -1, 1) - 5 * jnp.roll(a, -2, 1)
                + jnp.roll(a, -3, 1))

    def f6_y(a):
        return (jnp.roll(a, 2, 0) - 5 * jnp.roll(a, 1, 0) + 20 * a
                + 20 * jnp.roll(a, -1, 0) - 5 * jnp.roll(a, -2, 0)
                + jnp.roll(a, -3, 0))

    a32 = ref_pad.astype(jnp.int32)
    b1 = f6_x(a32)
    h1 = f6_y(a32)
    b = jnp.clip((b1 + 16) >> 5, 0, 255).astype(jnp.int16)
    h = jnp.clip((h1 + 16) >> 5, 0, 255).astype(jnp.int16)
    j1 = f6_y(b1)
    j = jnp.clip((j1 + 512) >> 10, 0, 255).astype(jnp.int16)
    return b, h, j


def _resolve_me_backend(me_backend: str) -> str:
    """'auto' -> Pallas SAD kernel on real TPU, XLA slice-scan elsewhere
    (CPU tests exercise the kernel via interpret mode explicitly)."""
    if me_backend == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return me_backend


def _split_me_method(me_backend: str) -> tuple[str, bool]:
    """me_backend may carry an ':hier' suffix selecting hierarchical
    search (the role of x264's dia/hex/umh fast ME vs esa full search,
    reference option table codec.c:892-896): coarse full search at half
    resolution + a +-2 full-pel refine at full resolution."""
    if me_backend.endswith(":hier"):
        return me_backend[:-5], True
    return me_backend, False


# quarter-pel sample = (P1 + P2 + 1) >> 1 of two {int,b,h,j} samples
# (§8.4.2.2.1 Table 8-12).  For fractional position (fx, fy) in quarter
# units (mod 4), the two (plane, dx, dy) operands, offsets in full pels:
#   planes: 0=int 1=b 2=h 3=j
_QPEL_PAIRS = {
    (0, 0): ((0, 0, 0), (0, 0, 0)),
    (2, 0): ((1, 0, 0), (1, 0, 0)),
    (0, 2): ((2, 0, 0), (2, 0, 0)),
    (2, 2): ((3, 0, 0), (3, 0, 0)),
    (1, 0): ((0, 0, 0), (1, 0, 0)),
    (3, 0): ((1, 0, 0), (0, 1, 0)),
    (0, 1): ((0, 0, 0), (2, 0, 0)),
    (0, 3): ((2, 0, 0), (0, 0, 1)),
    (2, 1): ((1, 0, 0), (3, 0, 0)),
    (2, 3): ((3, 0, 0), (1, 0, 1)),
    (1, 2): ((2, 0, 0), (3, 0, 0)),
    (3, 2): ((3, 0, 0), (2, 1, 0)),
    (1, 1): ((1, 0, 0), (2, 0, 0)),
    (3, 1): ((1, 0, 0), (2, 1, 0)),
    (1, 3): ((2, 0, 0), (1, 0, 1)),
    (3, 3): ((2, 1, 0), (1, 0, 1)),
}


def _qpel_operands(tx: int, ty: int):
    """Total quarter offset (tx, ty) from the integer-aligned origin ->
    ((p1, o1x, o1y), (p2, o2x, o2y)) with offsets in full pels."""
    fx, fy = tx % 4, ty % 4
    ix, iy = (tx - fx) // 4, (ty - fy) // 4
    (p1, a1x, a1y), (p2, a2x, a2y) = _QPEL_PAIRS[(fx, fy)]
    return (p1, a1x + ix, a1y + iy), (p2, a2x + ix, a2y + iy)


def _motion_search_and_mc(src_y, src_u, src_v, ref_y, ref_u, ref_v, rng: int,
                          subpel: bool = True, me_backend: str = "auto"):
    """Full-search integer-pel SAD ME (+ half-pel refine) + MC, slice-
    formulated for TPU.

    Per-MB window gathers are pathological on TPU, so every candidate offset
    is ONE static shift of the whole padded reference: elementwise
    |src - shift(ref)| + per-MB block-sum for SAD, and masked accumulation
    over the same shifts for alignment/MC.  For half-pel, the spec 6-tap
    planes (b/h/j) are built once and motion-ALIGNED alongside the integer
    plane in the same single masked pass (masked shifts do NOT compose
    across stages — per-block shift amounts differ at block boundaries — so
    alignment is always single-stage).  After alignment every half-pel
    candidate is a static +-1 shift.

    Returns (mv_q (mbh,mbw,2) quarter-pel, pred_y (H,W), pred_u, pred_v).
    """
    H, W = src_y.shape
    mbh, mbw = H // 16, W // 16
    K = 2 * rng + 1
    PAD = rng + 8
    # pixel data rides the scans as int16: half the HBM traffic and twice
    # the VPU lanes of int32 (values are 8-bit; diffs fit int16 easily)
    src16 = src_y.astype(jnp.int16)
    ref_pad = jnp.pad(ref_y, PAD, mode="edge").astype(jnp.int16)
    offs = jnp.stack(jnp.meshgrid(jnp.arange(K), jnp.arange(K),
                                  indexing="ij"), -1).reshape(-1, 2)  # dy,dx in [0,K)

    backend, hier = _split_me_method(me_backend)
    backend = _resolve_me_backend(backend)
    hier = hier and rng >= 6        # small ranges: full search is cheaper

    Mg = rng + 1                    # margin beyond the MB on each axis
    bh = 16 + 2 * Mg                # band height
    Wb = W + 2 * Mg

    def to_bands(pl_):
        return jnp.stack([
            jax.lax.dynamic_slice(pl_, (PAD - Mg + 16 * i, PAD - Mg), (bh, Wb))
            for i in range(mbh)])   # (mbh, bh, Wb)

    if hier:
        # ---- hierarchical search: coarse full search on 2x2-pooled
        # planes (SADs over 8x8 pooled blocks = the same MBs), then a +-2
        # full-pel refine on motion-aligned full-res bands.  Work:
        # Kc^2/4 + 2K + 25 full-frame passes vs K^2 for full search. ----
        rng_c = (rng + 1) // 2
        Kc = 2 * rng_c + 1
        sh = (src16.reshape(H // 2, 2, W // 2, 2).sum(axis=(1, 3))
              .astype(jnp.int16))               # 2x2 sums fit int16 (<=1020)
        rh = (ref_y.astype(jnp.int16).reshape(H // 2, 2, W // 2, 2)
              .sum(axis=(1, 3)).astype(jnp.int16))
        rh_pad = jnp.pad(rh, rng_c, mode="edge")
        offs_c = jnp.stack(jnp.meshgrid(jnp.arange(Kc), jnp.arange(Kc),
                                        indexing="ij"), -1).reshape(-1, 2)

        def csad(off):
            cand = jax.lax.dynamic_slice(rh_pad, (off[0], off[1]),
                                         (H // 2, W // 2))
            d = jnp.abs(sh - cand).astype(jnp.int32)
            return d.reshape(mbh, 8, mbw, 8).sum(axis=(1, 3))

        csads = jax.lax.map(csad, offs_c)       # (Kc^2, mbh, mbw)
        # coarse SAD ~ full-res SAD magnitude (64 pooled diffs of 2x2
        # sums); mv cost in full-pel units = 2x the coarse offset
        ccost = 2 * (jnp.abs(offs_c[:, 0] - rng_c)
                     + jnp.abs(offs_c[:, 1] - rng_c))
        bestc = jnp.argmin(csads * 4 + ccost[:, None, None], axis=0)
        RF = 3                                  # refine radius (full pels):
        # pooling + the even-pel grid can put the coarse mv up to 3 pels off
        lim = rng - RF                          # keep the refine in range
        dyb0 = jnp.clip(2 * (bestc // Kc - rng_c), -lim, lim).astype(jnp.int32)
        dxb0 = jnp.clip(2 * (bestc % Kc - rng_c), -lim, lim).astype(jnp.int32)

        # aligned full-res integer band at the coarse mv, with an RF-px halo
        ib = to_bands(ref_pad)
        oxr = jnp.pad(jnp.repeat(dxb0, 16, axis=1), ((0, 0), (RF, RF)),
                      mode="edge")[:, None, :]  # (mbh, 1, W+2RF)
        oyr = jnp.pad(jnp.repeat(dyb0, 16, axis=1), ((0, 0), (RF, RF)),
                      mode="edge")[:, None, :]
        shifts_r = jnp.arange(2 * lim + 1, dtype=jnp.int32) - lim

        def hr_step(acc, s):
            sl = jax.lax.dynamic_slice(ib, (0, 0, Mg + s - RF),
                                       (mbh, bh, W + 2 * RF))
            return acc + jnp.where(oxr == s, sl, 0), None

        Ahr, _ = jax.lax.scan(
            hr_step, jnp.zeros((mbh, bh, W + 2 * RF), jnp.int16), shifts_r)

        def vr_step(acc, s):
            sl = jax.lax.dynamic_slice(Ahr, (0, Mg + s - RF, 0),
                                       (mbh, 16 + 2 * RF, W + 2 * RF))
            return acc + jnp.where(oyr == s, sl, 0), None

        Ar, _ = jax.lax.scan(
            vr_step, jnp.zeros((mbh, 16 + 2 * RF, W + 2 * RF), jnp.int16),
            shifts_r)

        # static-shift refine SADs (near-border values come from the
        # neighbour's alignment — decision heuristic only, MC is exact)
        src_mb = src16.reshape(mbh, 16, W)
        rlist = [(dx, dy) for dy in range(-RF, RF + 1)
                 for dx in range(-RF, RF + 1)]
        rsads = jnp.stack([
            jnp.abs(src_mb - Ar[:, RF + dy:RF + 16 + dy, RF + dx:RF + dx + W])
            .astype(jnp.int32).reshape(mbh, 16, mbw, 16).sum(axis=(1, 3))
            for dx, dy in rlist])               # ((2RF+1)^2, mbh, mbw)
        rdxs = jnp.asarray([d[0] for d in rlist])
        rdys = jnp.asarray([d[1] for d in rlist])
        rcost = (jnp.abs(dxb0[None] + rdxs[:, None, None])
                 + jnp.abs(dyb0[None] + rdys[:, None, None]))
        rtot = rsads * 4 + rcost
        bestr = jnp.argmin(rtot, axis=0)
        rval = jnp.min(rtot, axis=0)
        # zero-centered +-2 candidates (static shifts, no alignment): the
        # coarse stage quantizes motion to even pels, which loses slow
        # pans — a plain small search around 0 recovers them
        zlist = [(dx, dy) for dy in range(-2, 3) for dx in range(-2, 3)]
        zsads = jnp.stack([
            jnp.abs(src16 - jax.lax.dynamic_slice(
                ref_pad, (PAD + dy, PAD + dx), (H, W))).astype(jnp.int32)
            .reshape(mbh, 16, mbw, 16).sum(axis=(1, 3))
            for dx, dy in zlist])
        zdxs = jnp.asarray([d[0] for d in zlist])
        zdys = jnp.asarray([d[1] for d in zlist])
        ztot = zsads * 4 + (jnp.abs(zdxs) + jnp.abs(zdys))[:, None, None]
        bestz = jnp.argmin(ztot, axis=0)
        zval = jnp.min(ztot, axis=0)
        use_z = zval <= rval
        dxb = jnp.where(use_z, zdxs[bestz], dxb0 + rdxs[bestr])
        dyb = jnp.where(use_z, zdys[bestz], dyb0 + rdys[bestr])
    elif backend in ("pallas", "pallas_interpret"):
        # in-kernel argmin: cost = 4*SAD16 + (|dy|+|dx|), identical ints
        # and tie-break order to the XLA argmin below
        from ..ops.pallas.sad import sad16_argmin
        best = sad16_argmin(src16, ref_pad[8:-8, 8:-8], rng,
                            interpret=(backend == "pallas_interpret"))
        dyb = best // K - rng
        dxb = best % K - rng
    else:
        def sad_at(off):
            cand = jax.lax.dynamic_slice(
                ref_pad, (PAD - rng + off[0], PAD - rng + off[1]), (H, W))
            d = jnp.abs(src16 - cand).astype(jnp.int32)
            return d.reshape(mbh, 16, mbw, 16).sum(axis=(1, 3))  # (mbh,mbw)

        sads = jax.lax.map(sad_at, offs)                  # (K*K, mbh, mbw)
        cost = jnp.abs(offs[:, 0] - rng) + jnp.abs(offs[:, 1] - rng)
        best = jnp.argmin(sads * 4 + cost[:, None, None], axis=0)
        dyb = best // K - rng
        dxb = best % K - rng
    mv_int = jnp.stack([dxb, dyb], axis=-1).astype(jnp.int32)  # (mbh,mbw,[x,y])

    # ---- horizontal-then-vertical masked alignment: O(K) full-band passes
    # instead of O(K^2).  The horizontal pass mixes COLUMNS of raw plane
    # data, so per-MB column shifts are exact everywhere; the vertical pass
    # then shifts ROWS within each (already correct) column.  Rows that
    # several MB rows read with different shifts are disambiguated by
    # expanding the reference into overlapping per-MB-row bands. ----
    if subpel:
        hb, hh, hj = _halfpel_planes(ref_pad)
        planes = (ref_pad, hb, hh, hj)
    else:
        planes = (ref_pad,)

    bands = tuple(to_bands(p) for p in planes)
    oxc = jnp.repeat(dxb, 16, axis=1)[:, None, :]     # (mbh, 1, W)
    oyc = jnp.repeat(dyb, 16, axis=1)[:, None, :]
    shifts = jnp.arange(K, dtype=jnp.int32) - rng

    sub_lv = 2 if subpel is True else int(subpel)  # 0=int, 1=half, 2=quarter
    if sub_lv:
        # -- alignment at the integer best (refine-decision inputs) --
        def h_step(carry, s):
            out = []
            for acc, b in zip(carry, bands):
                sl = jax.lax.dynamic_slice(b, (0, 0, Mg + s), (mbh, bh, W))
                out.append(acc + jnp.where(oxc == s, sl, 0))
            return tuple(out), None

        Ah, _ = jax.lax.scan(
            h_step, tuple(jnp.zeros((mbh, bh, W), jnp.int16) for _ in bands),
            shifts)

        def v_step(carry, s):
            out = []
            for acc, a in zip(carry, Ah):
                sl = jax.lax.dynamic_slice(a, (0, Mg + s - 1, 0),
                                           (mbh, 18, W))
                out.append(acc + jnp.where(oyc == s, sl, 0))
            return tuple(out), None

        aligned, _ = jax.lax.scan(
            v_step, tuple(jnp.zeros((mbh, 18, W), jnp.int16) for _ in bands),
            shifts)                  # 4 x (mbh, 18, W), row 0 = MB row -1
        amap = tuple(jnp.pad(a, ((0, 0), (0, 0), (1, 1)), mode="edge")
                     for a in aligned)   # x padded by 1 each side

        # candidate grid in quarter-pel units around the integer best:
        # half refine = even offsets only; quarter = the full [-2,2]^2 grid
        # (every quarter sample is the rounded mean of two {int,b,h,j}
        # samples at offsets in {-1,0} — all within the aligned arrays)
        if sub_lv >= 2:
            deltas = [(tx, ty) for ty in range(-2, 3) for tx in range(-2, 3)]
        else:
            deltas = [(tx, ty) for ty in (-2, 0, 2) for tx in (-2, 0, 2)]
        ops = [_qpel_operands(tx, ty) for tx, ty in deltas]

        def read(op):
            p_, ox_, oy_ = op
            return amap[p_][:, 1 + oy_:17 + oy_, 1 + ox_:1 + ox_ + W]

        # refine SADs: values within 1 px of an MB border come from the
        # neighbour's alignment, so these are approximate there — a decision
        # heuristic only; the MC below is exact for whatever wins.  Rows are
        # 2:1 subsampled (decision metric only): halves the refine cost.
        src_r = src16.reshape(mbh, 16, W)[:, ::2]
        sads_r = []
        for (op1, op2) in ops:
            a = read(op1)[:, ::2]
            c = a if op1 == op2 else (a + read(op2)[:, ::2] + 1) >> 1
            sads_r.append(jnp.abs(src_r - c).astype(jnp.int32)
                          .reshape(mbh, 8, mbw, 16).sum(axis=(1, 3)))
        hsads = jnp.stack(sads_r)                         # (ncand, mbh, mbw)
        # lambda halved to match the 2:1-subsampled SAD magnitude
        hcost = jnp.asarray([(abs(tx) + abs(ty)) for tx, ty in deltas])
        hbest = jnp.argmin(hsads * 4 + hcost[:, None, None], axis=0)
        txs = jnp.asarray([d[0] for d in deltas])[hbest]
        tys = jnp.asarray([d[1] for d in deltas])[hbest]
        mv_q = mv_int * 4 + jnp.stack([txs, tys], axis=-1)

        pm1 = jnp.asarray([o[0][0] for o in ops])[hbest]  # (mbh, mbw)
        ox1 = dxb + jnp.asarray([o[0][1] for o in ops])[hbest]
        oy1 = dyb + jnp.asarray([o[0][2] for o in ops])[hbest]
        pm2 = jnp.asarray([o[1][0] for o in ops])[hbest]
        ox2 = dxb + jnp.asarray([o[1][1] for o in ops])[hbest]
        oy2 = dyb + jnp.asarray([o[1][2] for o in ops])[hbest]
    else:
        mv_q = mv_int * 4
        z = jnp.zeros((mbh, mbw), jnp.int32)
        pm1 = pm2 = z
        ox1 = ox2 = dxb
        oy1 = oy2 = dyb

    # -- exact MC: fold each operand's plane + (dx, dy) into an h-then-v
    # alignment with shifts in [-rng-1, rng]; prediction is the rounded
    # mean of the two operands (identity when they coincide) --
    shifts2 = jnp.arange(K + 1, dtype=jnp.int32) - rng - 1
    hA = 16 + 2 * rng + 1           # rows [-rng-1, rng+16) rel. MB start

    if sub_lv >= 2:
        # both operands accumulated in ONE h-then-v scan (the band slices
        # are shared; only the masks differ)
        pmc1 = jnp.repeat(pm1, 16, axis=1)[:, None, :]
        oxc1 = jnp.repeat(ox1, 16, axis=1)[:, None, :]
        oyc1 = jnp.repeat(oy1, 16, axis=1)[:, None, :]
        pmc2 = jnp.repeat(pm2, 16, axis=1)[:, None, :]
        oxc2 = jnp.repeat(ox2, 16, axis=1)[:, None, :]
        oyc2 = jnp.repeat(oy2, 16, axis=1)[:, None, :]

        def h2_step(carry, s):
            a1, a2 = carry
            for p, b in enumerate(bands):
                sl = jax.lax.dynamic_slice(b, (0, 0, Mg + s), (mbh, hA, W))
                a1 = a1 + jnp.where((oxc1 == s) & (pmc1 == p), sl, 0)
                a2 = a2 + jnp.where((oxc2 == s) & (pmc2 == p), sl, 0)
            return (a1, a2), None

        z2 = jnp.zeros((mbh, hA, W), jnp.int16)
        (Ah1, Ah2), _ = jax.lax.scan(h2_step, (z2, z2), shifts2)

        def v2_step(carry, s):
            a1, a2 = carry
            s1 = jax.lax.dynamic_slice(Ah1, (0, rng + 1 + s, 0), (mbh, 16, W))
            s2 = jax.lax.dynamic_slice(Ah2, (0, rng + 1 + s, 0), (mbh, 16, W))
            return (a1 + jnp.where(oyc1 == s, s1, 0),
                    a2 + jnp.where(oyc2 == s, s2, 0)), None

        z3 = jnp.zeros((mbh, 16, W), jnp.int16)
        (pA, pB), _ = jax.lax.scan(v2_step, (z3, z3), shifts2)
        pred_r = (pA + pB + 1) >> 1
    else:
        pmc = jnp.repeat(pm1, 16, axis=1)[:, None, :]
        oxtc = jnp.repeat(ox1, 16, axis=1)[:, None, :]
        oytc = jnp.repeat(oy1, 16, axis=1)[:, None, :]

        def h2_step(acc, s):
            for p, b in enumerate(bands):
                sl = jax.lax.dynamic_slice(b, (0, 0, Mg + s), (mbh, hA, W))
                acc = acc + jnp.where((oxtc == s) & (pmc == p), sl, 0)
            return acc, None

        Ah2, _ = jax.lax.scan(h2_step, jnp.zeros((mbh, hA, W), jnp.int16),
                              shifts2)

        def v2_step(acc, s):
            sl = jax.lax.dynamic_slice(Ah2, (0, rng + 1 + s, 0), (mbh, 16, W))
            return acc + jnp.where(oytc == s, sl, 0), None

        pred_r, _ = jax.lax.scan(v2_step, jnp.zeros((mbh, 16, W), jnp.int16),
                                 shifts2)
    pred_y = pred_r.reshape(H, W).astype(jnp.int32)

    # ---- chroma MC from the final quarter-pel MV (single-stage) ----
    # integer chroma offset ci = mv_q >> 3, eighth-pel fraction f = mv_q & 7
    ci = mv_q >> 3
    f = mv_q & 7
    clo = -((4 * rng + 2) >> 3) - 1
    chi = (4 * rng + 2) >> 3
    cpad = chi + 2
    ref_pad_u = jnp.pad(ref_u, cpad, mode="edge").astype(jnp.int16)
    ref_pad_v = jnp.pad(ref_v, cpad, mode="edge").astype(jnp.int16)

    # h-then-v alignment again (see luma): horizontal pass keeps BOTH columns
    # of the bilinear (cix, cix+1) as two accumulators, vertical pass fuses
    # the row pair (ciy, ciy+1) with the bilinear blend — 2(nc+?) band passes
    # instead of nc^2 full-plane passes.
    nc = chi - clo + 1
    Wc = W // 2
    bhc = nc + 8                 # rows [clo, chi + 9) rel. chroma-MB start
    Wbc = Wc + nc + 1

    def to_cbands(pl_):
        return jnp.stack([
            jax.lax.dynamic_slice(pl_, (cpad + 8 * i + clo, cpad + clo),
                                  (bhc, Wbc))
            for i in range(mbh)])  # (mbh, bhc, Wbc)

    cb_u = to_cbands(ref_pad_u)
    cb_v = to_cbands(ref_pad_v)
    cixc = jnp.repeat(ci[..., 0], 8, axis=1)[:, None, :]   # (mbh, 1, Wc)
    ciyc = jnp.repeat(ci[..., 1], 8, axis=1)[:, None, :]
    fxc = jnp.repeat(f[..., 0], 8, axis=1)[:, None, :].astype(jnp.int32)
    fyc = jnp.repeat(f[..., 1], 8, axis=1)[:, None, :].astype(jnp.int32)
    cshifts = jnp.arange(nc, dtype=jnp.int32) + clo

    def ch_step(carry, s):
        Au, Bu, Av_, Bv_ = carry
        m_ = cixc == s
        sl_u0 = jax.lax.dynamic_slice(cb_u, (0, 0, s - clo), (mbh, bhc, Wc))
        sl_u1 = jax.lax.dynamic_slice(cb_u, (0, 0, s - clo + 1), (mbh, bhc, Wc))
        sl_v0 = jax.lax.dynamic_slice(cb_v, (0, 0, s - clo), (mbh, bhc, Wc))
        sl_v1 = jax.lax.dynamic_slice(cb_v, (0, 0, s - clo + 1), (mbh, bhc, Wc))
        return (Au + jnp.where(m_, sl_u0, 0), Bu + jnp.where(m_, sl_u1, 0),
                Av_ + jnp.where(m_, sl_v0, 0), Bv_ + jnp.where(m_, sl_v1, 0)), None

    zc = jnp.zeros((mbh, bhc, Wc), jnp.int16)
    (Au, Bu, Av_, Bv_), _ = jax.lax.scan(ch_step, (zc, zc, zc, zc), cshifts)

    def cv_step(carry, s):
        pu, pv = carry
        m_ = ciyc == s

        def bil(A_, B_):
            a0 = jax.lax.dynamic_slice(A_, (0, s - clo, 0), (mbh, 8, Wc)).astype(jnp.int32)
            b0 = jax.lax.dynamic_slice(B_, (0, s - clo, 0), (mbh, 8, Wc)).astype(jnp.int32)
            a1 = jax.lax.dynamic_slice(A_, (0, s - clo + 1, 0), (mbh, 8, Wc)).astype(jnp.int32)
            b1 = jax.lax.dynamic_slice(B_, (0, s - clo + 1, 0), (mbh, 8, Wc)).astype(jnp.int32)
            return ((8 - fxc) * (8 - fyc) * a0 + fxc * (8 - fyc) * b0
                    + (8 - fxc) * fyc * a1 + fxc * fyc * b1 + 32) >> 6

        return (pu + jnp.where(m_, bil(Au, Bu), 0),
                pv + jnp.where(m_, bil(Av_, Bv_), 0)), None

    zp = jnp.zeros((mbh, 8, Wc), jnp.int32)
    (pu_r, pv_r), _ = jax.lax.scan(cv_step, (zp, zp), cshifts)
    return mv_q, pred_y, pu_r.reshape(H // 2, Wc), pv_r.reshape(H // 2, Wc)


def _multi_ref_search_and_mc(src_y, src_u, src_v, refs, rng: int,
                             subpel=True, me_backend: str = "auto"):
    """Multi-reference P16x16 search (the reference forwards --ref,
    codec.c:883): run the single-ref search/MC against every DPB entry
    (pure batching — TPU-friendly, no gathers), then pick per MB by final
    prediction SAD + mv/ref signalling cost.

    refs: tuple of (y, u, v) device planes, ref_idx order (newest first).
    Returns (mv_q (mbh,mbw,2), ref_idx (mbh,mbw), pred_y, pred_u, pred_v).
    """
    H, W = src_y.shape
    mbh, mbw = H // 16, W // 16
    R = len(refs)
    cands = [_motion_search_and_mc(src_y, src_u, src_v, ry, ru, rv, rng,
                                   subpel=subpel, me_backend=me_backend)
             for (ry, ru, rv) in refs]
    if R == 1:
        mv_q, py, pu, pv = cands[0]
        return mv_q, jnp.zeros((mbh, mbw), jnp.int32), py, pu, pv
    costs = []
    for r, (mv_q, py, pu, pv) in enumerate(cands):
        sad = (jnp.abs(src_y - py).reshape(mbh, 16, mbw, 16)
               .sum(axis=(1, 3)))
        # te(v) ref bits (1 bit at R==2, ue otherwise) + quarter-pel mv
        # magnitude as the signalling-cost proxy
        refbits = 1 if R == 2 else (2 * int(np.floor(np.log2(r + 1))) + 1
                                    if r > 0 else 1)
        mvcost = jnp.abs(mv_q).sum(axis=-1) >> 2
        costs.append(sad * 4 + mvcost + refbits * 8)
    sel = jnp.argmin(jnp.stack(costs), axis=0).astype(jnp.int32)  # (mbh,mbw)
    sel_pix = jnp.repeat(jnp.repeat(sel, 16, 0), 16, 1)
    sel_cpix = jnp.repeat(jnp.repeat(sel, 8, 0), 8, 1)
    mv_q = cands[0][0]
    py = cands[0][1]
    pu, pv = cands[0][2], cands[0][3]
    for r in range(1, R):
        mv_q = jnp.where((sel == r)[..., None], cands[r][0], mv_q)
        py = jnp.where(sel_pix == r, cands[r][1], py)
        pu = jnp.where(sel_cpix == r, cands[r][2], pu)
        pv = jnp.where(sel_cpix == r, cands[r][3], pv)
    return mv_q, sel, py, pu, pv


# x264's decimate run table (common/macroblock.c i_ds_table4): the score a
# lone +-1 coefficient contributes given the zero-run below it
_DS_TABLE = np.asarray([3, 2, 2, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0])


def _decimate_score(levels):
    """x264 decimate score per 4x4 block (vectorized): 9 if any |level|>1,
    else sum of ds_table[zero-run below each +-1].  levels: (..., 16)
    zigzag."""
    nz = levels != 0
    big = (jnp.abs(levels) > 1).any(axis=-1)
    idx = jnp.arange(16)
    # position of the previous nonzero below each position (or -1)
    prev = jax.lax.cummax(jnp.where(nz, idx, -1), axis=levels.ndim - 1)
    prev_below = jnp.concatenate(
        [jnp.full(levels.shape[:-1] + (1,), -1),
         prev[..., :-1]], axis=-1)
    run = idx - prev_below - 1
    score = jnp.where(nz, jnp.asarray(_DS_TABLE)[jnp.minimum(run, 15)],
                      0).sum(axis=-1)
    return jnp.where(big, 9, score)


def _trellis_adjust(coef, q, qp, intra: bool):
    """RD coefficient-level quant refinement ('trellis-lite', the role of
    the reference's --trellis surface, codec.c:906): lower a level by one
    (or drop a lone ±1) when the distortion increase is smaller than the
    rate saving at the frame lambda.

    Distortion is measured in the transform-coefficient domain, where
    dequant(L) = L * V << (qp/6) lives on the same scale as the input
    coefficient; rate deltas are CAVLC-calibrated constants (a dropped ±1
    saves ~4 bits of coeff_token/T1/run movement, a magnitude step ~1.5).
    """
    qpv = jnp.asarray(qp, jnp.int32)
    V = jnp.take(tj.DEQUANT_TABLE, qpv % 6, axis=0) << _exp2(qpv // 6)
    # dequant lives at 4x the fdct-output scale (MF*V ~= 2^17 vs the 2^15
    # quantizer shift), so compare 4*|w| against L*V
    absw4 = jnp.abs(coef) * 4
    absq = jnp.abs(q)
    e = absw4 - absq * V                # signed error at the chosen level
    dD = V * (2 * e + V)                # D(L-1) - D(L) >= 0 near boundaries
    # lambda2(qp) ~ x264's 0.9 * 2^((qp-12)/3), scaled into the dequant
    # domain; the 512 factor was fit empirically on residual RD curves
    # (the knee where ~5% of coefficients drop at <0.5 dB residual cost)
    lam = (512.0 * 0.9) * jnp.exp2((qpv.astype(jnp.float32) - 12.0) / 3.0)
    lam = lam if lam.ndim == 0 else lam[..., None, None]
    drop1 = (absq == 1) & (dD.astype(jnp.float32) < lam * 4.0)
    step = (absq >= 2) & (dD.astype(jnp.float32) < lam * 1.5)
    newabs = jnp.where(drop1, 0, jnp.where(step, absq - 1, absq))
    return jnp.sign(q) * newabs


def _exp2(x):
    return x if not hasattr(x, "ndim") or x.ndim == 0 else x[..., None, None]


def _luma_residual_pipeline(src_mbs, pred_mbs, qp, intra: bool,
                            decimate: bool = False, trellis: bool = False,
                            t8: bool = False):
    """fdct+quant+zigzag and the decoder-exact recon residual.

    decimate (inter only): zero a whole MB's luma residual when its summed
    decimate score is < 6 (the reference's --no-dct-decimate default-on
    behaviour, codec.c option surface).
    t8 (inter only): also evaluate the High-profile 8x8 transform per MB
    (x264 --8x8dct, codec.c:904) and pick 4x4 vs 8x8 by SSD + lambda*rate;
    the 8x8 levels are emitted in the CAVLC interleaved-4x4 layout
    (§8.5.6: sub-block b carries 8x8-scan positions 4j+b), so every
    downstream consumer (slots, nC, CBP) is layout-compatible.
    Returns (levels_zz (n,16,16), recon_res (n,16,16), t8_flag (n,)|None).
    """
    resid = src_mbs - pred_mbs
    blocks = mb_to_blocks(resid)
    coef = tj.fdct4x4(blocks)
    q = tj.quant4x4(coef, qp, intra=intra)
    if trellis:
        q = _trellis_adjust(coef, q, qp, intra)
    levels = zigzag16(q)                            # (n, 16, 16)
    if decimate and not intra:
        mb_score = _decimate_score(levels).sum(axis=-1)   # (n,)
        keep = (mb_score >= 6)[:, None, None]
        levels = jnp.where(keep, levels, 0)
        q = jnp.where(keep[..., None], q, 0)
    d = tj.dequant4x4(q, qp)
    res = blocks_to_mb(tj.idct4x4_core(d))
    if not t8 or intra:
        return levels, res, None

    # ---- 8x8 transform candidate ----
    n = resid.shape[0]
    # (n, 2, 2, 8, 8) quadrant blocks in cbp order (TL, TR, BL, BR)
    b8 = resid.reshape(n, 2, 8, 2, 8).transpose(0, 1, 3, 2, 4) \
        .reshape(n, 4, 8, 8)
    w8 = tj.fdct8x8(b8)
    q8 = tj.quant8x8(w8, qp, intra=False)
    zz8 = tj.zigzag8x8_scan(q8)                     # (n, 4, 64)
    # interleaved-4x4 layout: sub-block b of 8x8 block k sits in 4x4 slot
    # 4k+b and carries scan positions 4j+b
    lv8 = zz8.reshape(n, 4, 16, 4).transpose(0, 1, 3, 2).reshape(n, 16, 16)
    if decimate:
        sc8 = _decimate_score(lv8).sum(axis=-1)
        keep8 = (sc8 >= 6)[:, None, None]
        lv8 = jnp.where(keep8, lv8, 0)
        q8 = jnp.where(keep8[..., None], q8, 0)
    res8 = tj.idct8x8_core(tj.dequant8x8(q8, qp))   # (n, 4, 8, 8)
    res8_mb = res8.reshape(n, 2, 2, 8, 8).transpose(0, 1, 3, 2, 4) \
        .reshape(n, 16, 16)

    # decision: SSD against the true residual + lambda * rate proxy
    def cost(levels_, res_):
        ssd = ((res_ - resid) ** 2).sum(axis=(-1, -2))
        a = jnp.abs(levels_)
        bits = (2 * (a > 0).sum(axis=(-1, -2))
                + (31 - _clz32(jnp.maximum(a, 1))).sum(axis=(-1, -2)))
        return ssd, bits

    qv = jnp.asarray(qp, jnp.int32)
    lam2 = jnp.maximum(1, jnp.round(
        0.9 * jnp.exp2((qv.astype(jnp.float32) - 12.0) / 3.0))
        ).astype(jnp.int32)
    lam2 = lam2 if lam2.ndim == 0 else lam2.reshape(n)
    ssd4, bits4 = cost(levels, res)
    ssd8, bits8 = cost(lv8, res8_mb)
    flag8 = (ssd8 + lam2 * bits8) < (ssd4 + lam2 * bits4)
    levels = jnp.where(flag8[:, None, None], lv8, levels)
    res = jnp.where(flag8[:, None, None], res8_mb, res)
    return levels, res, flag8


def _clz32(x):
    """Count leading zeros of positive int32 via float exponent bits."""
    return 31 - jnp.log2(x.astype(jnp.float32)).astype(jnp.int32)


def _chroma_residual_pipeline(src_c8, pred_c8, qpc, intra: bool, qp_dc=None):
    """Chroma 8x8: DC Hadamard + AC. Returns (dc_levels (n,2,2),
    ac_levels (n,4,15), recon (n,8,8) given final cbp known later).

    qpc: scalar or (n,1) per-MB; qp_dc: scalar or (n,) for the DC path."""
    if qp_dc is None:
        qp_dc = qpc
    resid = src_c8 - pred_c8
    blocks = c8_to_blocks(resid)                    # (n,4,4,4)
    coef = tj.fdct4x4(blocks)
    dc = jnp.stack([jnp.stack([coef[:, 0, 0, 0], coef[:, 1, 0, 0]], axis=-1),
                    jnp.stack([coef[:, 2, 0, 0], coef[:, 3, 0, 0]], axis=-1)],
                   axis=-2)                         # (n,2,2)
    dc_lv = tj.chroma_dc_fwd_quant(dc, qp_dc, intra=intra)
    q = tj.quant4x4(coef, qpc, intra=intra)
    q = q.at[:, :, 0, 0].set(0)
    ac_lv = zigzag16(q)[:, :, 1:]                   # (n,4,15)
    return dc_lv, ac_lv


def _chroma_recon(pred_c8, dc_lv, ac_lv, qpc, use_dc, use_ac, qp_dc=None):
    """Decoder-exact chroma recon with cbp masking.

    use_dc/use_ac: (n,) bool."""
    if qp_dc is None:
        qp_dc = qpc
    n = pred_c8.shape[0]
    dc_lv = jnp.where(use_dc[:, None, None], dc_lv, 0)
    ac_lv = jnp.where(use_ac[:, None, None], ac_lv, 0)
    dc_rec = tj.chroma_dc_dequant(dc_lv, qp_dc)     # (n,2,2)
    full = jnp.concatenate([jnp.zeros((n, 4, 1), jnp.int32), ac_lv], axis=-1)
    blocks = tj.zigzag_unscan(full)                 # (n,4,4,4)
    d = tj.dequant4x4(blocks, qpc)
    dc_flat = dc_rec.reshape(n, 4)                  # raster sb order
    d = d.at[:, :, 0, 0].set(dc_flat)
    res = tj.idct4x4_core(d)
    rec = pred_c8 + blocks_to_c8(res)
    return jnp.clip(rec, 0, 255)


def encode_p_frame_core(src_y, src_u, src_v, ref_y, ref_u, ref_v, qp, qpc,
                        rng=8, subpel=True, me_backend="auto",
                        aq_strength=0.0, qpc_offset=0, decimate=True,
                        trellis=False, qp_off=None, wp=None,
                        partitions=False, dct8x8=False):
    """Device P-frame encode (unjitted core). All planes int32, MB-multiple
    dims. Returns syntax tensors + recon planes (pre-deblock).

    aq_strength > 0 enables per-MB variance AQ: quant/dequant run with a
    per-MB QP map; qp_delta outputs carry the mb_qp_delta chain (§7.4.5).
    qp_off (n,) int32, optional: additive per-MB QP offsets (MB-tree);
    composes with AQ and enables the same mb_qp_delta path.
    wp, optional (w, o) traced scalars: explicit weighted prediction for
    luma (§8.4.2.3.3, denom 6) — applied to the interpolated prediction,
    matching the decoder's order (x264 --weightp surface, codec.c:889)."""
    H, W = src_y.shape
    mbh, mbw = H // 16, W // 16
    n = mbh * mbw
    src_mbs = mbize(src_y)
    aq = float(aq_strength) > 0.0
    if aq or qp_off is not None:
        qp_mb = (aq_qp_map(src_y, qp, float(aq_strength)) if aq
                 else jnp.full((n,), qp, jnp.int32))
        if qp_off is not None:
            qp_mb = jnp.clip(qp_mb + qp_off.reshape(n), 1, 51)
        qpc_mb = tj.chroma_qp(qp_mb, qpc_offset)
        qp_l = qp_mb[:, None]
        qp_c = qpc_mb[:, None]
        qp_cdc = qpc_mb
        aq = True                       # downstream: per-MB QP bookkeeping
    else:
        qp_mb = None
        qp_l, qp_c, qp_cdc = qp, qpc, qpc

    part = mv8 = None
    if ref_y.ndim == 3:
        # multi-reference DPB: (R, H, W) stacked planes, ref_idx order
        refs = tuple((ref_y[r], ref_u[r], ref_v[r])
                     for r in range(ref_y.shape[0]))
        mv_q4, ref_sel, pred_y_pl, pred_u_pl, pred_v_pl = \
            _multi_ref_search_and_mc(src_y, src_u, src_v, refs, rng,
                                     subpel=subpel, me_backend=me_backend)
    elif partitions:
        from .inter_partition import partition_search_and_mc
        part, mv8, pred_y_pl, pred_u_pl, pred_v_pl = \
            partition_search_and_mc(src_y, src_u, src_v,
                                    ref_y, ref_u, ref_v, rng, qp,
                                    subpel=subpel, me_backend=me_backend)
        # per-MB field for colocated-motion consumers (B direct): the
        # per-component max-|mv| over the quadrants — MB-level colZero
        # eligibility stays a conservative lower bound of the decoder's
        # per-block colZeroFlag derivation
        mv_q4 = jnp.abs(mv8).reshape(mbh, 2, mbw, 2, 2).max(axis=(1, 3))
        ref_sel = None
    else:
        mv_q4, pred_y_pl, pred_u_pl, pred_v_pl = _motion_search_and_mc(
            src_y, src_u, src_v, ref_y, ref_u, ref_v, rng, subpel=subpel,
            me_backend=me_backend)
        ref_sel = None
    mv_q = mv_q4.reshape(n, 2)

    if wp is not None:
        wp_w, wp_o = wp
        pred_y_pl = jnp.clip(
            ((pred_y_pl * wp_w + 32) >> 6) + wp_o, 0, 255)

    pred = mbize(pred_y_pl)
    levels, recon_res, t8_flag = _luma_residual_pipeline(
        src_mbs, pred, qp_l, intra=False, decimate=decimate,
        trellis=trellis, t8=dct8x8)

    # cbp luma per 8x8 quadrant (block coding order: blocks q*4..q*4+3)
    nz_blk = (levels != 0).any(axis=-1)             # (n, 16)
    cbp_q = nz_blk.reshape(n, 4, 4).any(axis=-1)    # (n, 4)
    cbp_luma = (cbp_q * (1 << jnp.arange(4))).sum(axis=-1).astype(jnp.int32)

    # luma recon with cbp masking (uncoded quadrants contribute no residual)
    keep = jnp.repeat(cbp_q, 4, axis=-1)            # (n,16) per block
    res_mb = blocks_to_mb(mb_to_blocks(recon_res) * keep[:, :, None, None])
    recon_y_mbs = jnp.clip(pred + res_mb, 0, 255)

    # chroma
    pred_u = mbize(pred_u_pl, 8)
    pred_v = mbize(pred_v_pl, 8)
    src_u_mbs = mbize(src_u, 8)
    src_v_mbs = mbize(src_v, 8)
    dc_u, ac_u = _chroma_residual_pipeline(src_u_mbs, pred_u, qp_c, False,
                                           qp_dc=qp_cdc)
    dc_v, ac_v = _chroma_residual_pipeline(src_v_mbs, pred_v, qp_c, False,
                                           qp_dc=qp_cdc)

    has_ac = (ac_u != 0).any(axis=(1, 2)) | (ac_v != 0).any(axis=(1, 2))
    has_dc = (dc_u != 0).any(axis=(1, 2)) | (dc_v != 0).any(axis=(1, 2))
    cbp_chroma = jnp.where(has_ac, 2, jnp.where(has_dc, 1, 0)).astype(jnp.int32)

    use_dc = cbp_chroma >= 1
    use_ac = cbp_chroma == 2
    rec_u = _chroma_recon(pred_u, dc_u, ac_u, qp_c, use_dc, use_ac,
                          qp_dc=qp_cdc)
    rec_v = _chroma_recon(pred_v, dc_v, ac_v, qp_c, use_dc, use_ac,
                          qp_dc=qp_cdc)

    out = {
        "mv": mv_q,                     # (n,2) quarter-pel
        "levels": levels,               # (n,16,16) zigzag, block order
        "cbp_luma": cbp_luma,
        "cbp_chroma": cbp_chroma,
        "dc_u": dc_u, "dc_v": dc_v,     # (n,2,2)
        "ac_u": ac_u, "ac_v": ac_v,     # (n,4,15)
        "recon_y": unmbize(recon_y_mbs, H, W),
        "recon_u": unmbize(rec_u, H // 2, W // 2, 8),
        "recon_v": unmbize(rec_v, H // 2, W // 2, 8),
    }
    if ref_sel is not None:
        out["ref_idx"] = ref_sel.reshape(n)
    if part is not None:
        out["part"] = part.reshape(n)
        out["mv8"] = mv8
    if t8_flag is not None:
        out["t8"] = t8_flag.reshape(n)
    if aq:
        coded = (cbp_luma != 0) | (cbp_chroma != 0)
        qp_real, qp_delta = realized_qp_chain(qp_mb, coded, qp)
        out["qp_real"] = qp_real
        out["qp_delta"] = qp_delta
    return out


def _direct_flip_mask(mode_map, colzero):
    """Eligibility masks for flipping explicit-mode MBs to spatial
    B_Direct_16x16/B_Skip (§8.4.1.2.2) with a decoder prediction that is
    EXACTLY known in advance, for any subset of eligible MBs flipped.

    With single-entry ref lists, derived refIdxLX = MinPositive over
    available neighbours A/B/C (C->D fallback) = 0 iff any of them uses
    list X.  Under colZeroFlag the derived MV is 0 on every used list, so
    the prediction is fully determined by the derived usage:

    * usage `both` -> bi(0,0); `none` (directZeroPredictionFlag) ->
      refIdx 0,0, mv 0,0 -> also bi(0,0).  A flipped MB of this class uses
      both lists, so usage is monotone under flips: `both` stays `both`,
      `none` can only become `both` — prediction bi(0,0) either way.
    * usage `L0-only` -> uni pred from ref0 at mv 0 — but ONLY stable if
      no flip anywhere can introduce L1 usage.  That holds when the
      phase-1 field uses no L1 at all AND no `none` MBs are flipped (a
      directZero flip would introduce L1).  Symmetric for L1-only.

    mode_map: (mbh, mbw) phase-1 modes (1=L0, 2=L1, 3=Bi).
    colzero:  (mbh, mbw) bool colZeroFlag.
    Returns (elig_bi, elig_l0, elig_l1) bool maps."""
    mbh, mbw = mode_map.shape
    useL0 = (mode_map == 1) | (mode_map == 3)
    useL1 = (mode_map == 2) | (mode_map == 3)

    def nb_any(use):
        a = jnp.pad(use[:, :-1], ((0, 0), (1, 0)))          # left
        b = jnp.pad(use[:-1, :], ((1, 0), (0, 0)))          # above
        c_raw = jnp.pad(use[:-1, 1:], ((1, 0), (0, 1)))     # above-right
        d = jnp.pad(use[:-1, :-1], ((1, 0), (1, 0)))        # above-left
        availC_raw = jnp.zeros((mbh, mbw), bool).at[1:, :-1].set(True)
        c = jnp.where(availC_raw, c_raw, d)
        return a | b | c

    dL0 = nb_any(useL0)
    dL1 = nb_any(useL1)
    both = dL0 & dL1
    none = ~dL0 & ~dL1
    elig_bi = colzero & (both | none)
    no_l1_anywhere = ~useL1.any()
    no_l0_anywhere = ~useL0.any()
    elig_l0 = colzero & dL0 & ~dL1 & no_l1_anywhere
    elig_l1 = colzero & dL1 & ~dL0 & no_l0_anywhere
    return elig_bi, elig_l0, elig_l1


def encode_b_frame_core(src_y, src_u, src_v,
                        ref0_y, ref0_u, ref0_v,
                        ref1_y, ref1_u, ref1_v,
                        mvcol, qp, qpc,
                        rng=8, subpel=True, me_backend="auto",
                        decimate=True, trellis=False, want_recon=False,
                        dct8x8=False):
    """Device B-frame encode: independent L0/L1 motion searches, per-MB
    {L0, L1, Bi} mode decision (default bi-prediction §8.4.2.3.2:
    (p0 + p1 + 1) >> 1), then a second phase flipping MBs to spatial
    B_Direct_16x16/B_Skip where the decoder's direct derivation provably
    equals bi(0,0) (see _direct_flip_mask) and it is cheaper.

    mvcol: (n, 2) colocated motion field of RefPicList1[0] (our P anchors
    are all-inter refidx-0 16x16, so colZeroFlag is uniform per MB).
    B frames are non-reference (no B-pyramid yet), so no recon is computed.
    mode: 0=direct, 1=L0, 2=L1, 3=Bi per MB.
    Replaces libx264's B-frame analyse (reference option surface
    /root/reference/codec.c:843-847)."""
    H, W = src_y.shape
    mbh, mbw = H // 16, W // 16
    n = mbh * mbw
    src_mbs = mbize(src_y)
    src16 = src_y.astype(jnp.int16)

    mv0_q4, p0y, p0u, p0v = _motion_search_and_mc(
        src_y, src_u, src_v, ref0_y, ref0_u, ref0_v, rng, subpel=subpel,
        me_backend=me_backend)
    mv1_q4, p1y, p1u, p1v = _motion_search_and_mc(
        src_y, src_u, src_v, ref1_y, ref1_u, ref1_v, rng, subpel=subpel,
        me_backend=me_backend)

    biy = (p0y + p1y + 1) >> 1
    biu = (p0u + p1u + 1) >> 1
    biv = (p0v + p1v + 1) >> 1
    # direct candidate: bi-prediction at zero MV (the only direct shape the
    # flip rule admits) — plain plane average of the two references
    diy = (ref0_y + ref1_y + 1) >> 1
    diu = (ref0_u + ref1_u + 1) >> 1
    div_ = (ref0_v + ref1_v + 1) >> 1

    def mbsad(pred_pl):
        d = jnp.abs(src16 - pred_pl.astype(jnp.int16)).astype(jnp.int32)
        return d.reshape(mbh, 16, mbw, 16).sum(axis=(1, 3)).reshape(n)

    sad0 = mbsad(p0y)
    sad1 = mbsad(p1y)
    sadbi = mbsad(biy)
    saddi = mbsad(diy)
    sadz0 = mbsad(ref0_y)          # uni-direct candidates: refX at mv 0
    sadz1 = mbsad(ref1_y)

    mv0 = mv0_q4.reshape(n, 2)
    mv1 = mv1_q4.reshape(n, 2)

    def mvbits(mv):
        # rough exp-Golomb cost of an mvd pair (pmv unknown at this stage)
        a = jnp.abs(mv).sum(axis=-1)
        return 2 * jnp.ceil(jnp.log2(a.astype(jnp.float32) + 2.0)).astype(jnp.int32) + 2

    lam = 4  # matches the integer-search lambda (sad*4 + bits)
    c0 = sad0 * 4 + lam * (3 + mvbits(mv0))
    c1 = sad1 * 4 + lam * (3 + mvbits(mv1))
    cbi = sadbi * 4 + lam * (5 + mvbits(mv0) + mvbits(mv1))
    costs = jnp.stack([c0, c1, cbi])
    mode = jnp.argmin(costs, axis=0).astype(jnp.int32) + 1  # 1=L0 2=L1 3=Bi
    cmin = jnp.min(costs, axis=0)

    # ---- phase 2: direct/skip flips (exact-by-construction) ----
    colzero = ((jnp.abs(mvcol) <= 1).all(axis=-1)).reshape(mbh, mbw)
    elig_bi, elig_l0, elig_l1 = _direct_flip_mask(mode.reshape(mbh, mbw),
                                                  colzero)
    cd_bi = saddi * 4 + lam * 1
    cd_l0 = sadz0 * 4 + lam * 1
    cd_l1 = sadz1 * 4 + lam * 1
    flip_bi = elig_bi.reshape(n) & (cd_bi <= cmin)
    flip_l0 = elig_l0.reshape(n) & (cd_l0 <= cmin)
    flip_l1 = elig_l1.reshape(n) & (cd_l1 <= cmin)
    # direct flavor per MB: 0=bi(0,0), 1=L0(0,0), 2=L1(0,0)
    flip = flip_bi | flip_l0 | flip_l1
    flavor = jnp.where(flip_l0, 1, jnp.where(flip_l1, 2, 0)).astype(jnp.int32)
    mode = jnp.where(flip, 0, mode)

    mmap = mode.reshape(mbh, mbw)
    fmap = flavor.reshape(mbh, mbw)
    dsel_y = jnp.repeat(jnp.repeat(fmap, 16, 0), 16, 1)
    dsel_c = jnp.repeat(jnp.repeat(fmap, 8, 0), 8, 1)
    dy_pl = jnp.where(dsel_y == 1, ref0_y, jnp.where(dsel_y == 2, ref1_y, diy))
    du_pl = jnp.where(dsel_c == 1, ref0_u, jnp.where(dsel_c == 2, ref1_u, diu))
    dv_pl = jnp.where(dsel_c == 1, ref0_v, jnp.where(dsel_c == 2, ref1_v, div_))
    my = jnp.repeat(jnp.repeat(mmap, 16, 0), 16, 1)
    mc_ = jnp.repeat(jnp.repeat(mmap, 8, 0), 8, 1)
    pred_y = jnp.where(my == 0, dy_pl, jnp.where(my == 1, p0y,
                       jnp.where(my == 2, p1y, biy))).astype(jnp.int32)
    pred_u = jnp.where(mc_ == 0, du_pl, jnp.where(mc_ == 1, p0u,
                       jnp.where(mc_ == 2, p1u, biu))).astype(jnp.int32)
    pred_v = jnp.where(mc_ == 0, dv_pl, jnp.where(mc_ == 1, p0v,
                       jnp.where(mc_ == 2, p1v, biv))).astype(jnp.int32)

    pred = mbize(pred_y)
    levels, recon_res, t8_flag = _luma_residual_pipeline(
        src_mbs, pred, qp, intra=False, decimate=decimate,
        trellis=trellis, t8=dct8x8)
    nz_blk = (levels != 0).any(axis=-1)
    cbp_q = nz_blk.reshape(n, 4, 4).any(axis=-1)
    cbp_luma = (cbp_q * (1 << jnp.arange(4))).sum(axis=-1).astype(jnp.int32)

    pred_u_mbs = mbize(pred_u, 8)
    pred_v_mbs = mbize(pred_v, 8)
    dc_u, ac_u = _chroma_residual_pipeline(mbize(src_u, 8), pred_u_mbs, qpc, False)
    dc_v, ac_v = _chroma_residual_pipeline(mbize(src_v, 8), pred_v_mbs, qpc, False)
    has_ac = (ac_u != 0).any(axis=(1, 2)) | (ac_v != 0).any(axis=(1, 2))
    has_dc = (dc_u != 0).any(axis=(1, 2)) | (dc_v != 0).any(axis=(1, 2))
    cbp_chroma = jnp.where(has_ac, 2, jnp.where(has_dc, 1, 0)).astype(jnp.int32)

    # FINAL per-list usage (decoder view) for MV prediction contexts:
    # explicit modes use their lists; direct MBs use the lists of their
    # flavor (bi -> both, L0-only, L1-only)
    uses0 = jnp.where(flip, flavor != 2, (mode == 1) | (mode == 3))
    uses1 = jnp.where(flip, flavor != 1, (mode == 2) | (mode == 3))

    out = {
        "mode": mode,                  # (n,) 0=direct 1=L0 2=L1 3=Bi
        "mv0": mv0, "mv1": mv1,        # (n,2) quarter-pel
        "uses0": uses0, "uses1": uses1,
        "levels": levels,
        "cbp_luma": cbp_luma,
        "cbp_chroma": cbp_chroma,
        "dc_u": dc_u, "dc_v": dc_v,
        "ac_u": ac_u, "ac_v": ac_v,
    }
    if t8_flag is not None:
        out["t8"] = t8_flag.reshape(-1)
    if want_recon:
        # decoder-exact B reconstruction (pre-deblock), same cbp masking
        # as the P path — used for PSNR/SSIM telemetry (b_psnr/b_ssim,
        # reference codec.c:1558-1559); B is still non-reference
        keep = jnp.repeat(cbp_q, 4, axis=-1)
        res_mb = blocks_to_mb(mb_to_blocks(recon_res)
                              * keep[:, :, None, None])
        use_dc = cbp_chroma >= 1
        use_ac = cbp_chroma == 2
        out["recon_y"] = unmbize(jnp.clip(pred + res_mb, 0, 255), H, W)
        out["recon_u"] = unmbize(
            _chroma_recon(pred_u_mbs, dc_u, ac_u, qpc, use_dc, use_ac),
            H // 2, W // 2, 8)
        out["recon_v"] = unmbize(
            _chroma_recon(pred_v_mbs, dc_v, ac_v, qpc, use_dc, use_ac),
            H // 2, W // 2, 8)
    return out


# --------------------------------------------------------------------------
# I-frame pipeline (row scan, V/DC modes)
# --------------------------------------------------------------------------

def encode_i_frame_core(src_y, src_u, src_v, qp, qpc, i4x4: bool = False):
    """Device I-frame encode: anti-diagonal wavefront with full per-MB
    Intra_16x16 (V/H/DC/Plane) and chroma (DC/H/V/Plane) mode decision
    under exact reconstruction feedback (see intra_wavefront module).
    i4x4=True adds the full 9-mode I_NxN candidate per MB (slope-2
    wavefront, see intra4x4 module).

    Returns syntax tensors + recon planes + per-MB 'i16_mode'/'cmode'.
    """
    from .intra_wavefront import encode_i_frame_core_wf
    return encode_i_frame_core_wf(src_y, src_u, src_v, qp, qpc, i4x4)


def _luma_residual_pipeline_i16(src_mbs, pred_mbs, qp):
    """I16x16: separate DC (Hadamard) + AC-only levels.

    Returns (levels dict, recon residual mb) where levels contains
    'dc' (n,16) zigzag of DC block and 'ac' (n,16,15)."""
    resid = src_mbs - pred_mbs
    blocks = mb_to_blocks(resid)
    coef = tj.fdct4x4(blocks)
    n = coef.shape[0]
    # DC in raster layout
    dc_r = jnp.zeros((n, 4, 4), jnp.int32)
    dc_r = dc_r.at[:, BLK_Y, BLK_X].set(coef[:, :, 0, 0])
    dc_lv = tj.luma_dc_fwd_quant(dc_r, qp)          # (n,4,4) raster
    q = tj.quant4x4(coef, qp, intra=True)
    q = q.at[:, :, 0, 0].set(0)
    ac_lv = zigzag16(q)[:, :, 1:]                   # (n,16,15)
    # recon
    dc_rec = tj.luma_dc_dequant(dc_lv, qp)          # (n,4,4) raster
    d = tj.dequant4x4(q, qp)
    d = d.at[:, :, 0, 0].set(dc_rec[:, BLK_Y, BLK_X])
    res = tj.idct4x4_core(d)
    levels = {"dc": zigzag16(dc_lv), "ac": ac_lv}
    return levels, blocks_to_mb(res)


def _finish_intra_mb(sy, pred_y, levels, res_mb, su, pu, sv, pv, qp, qpc):
    """Shared I16x16 tail: cbp, chroma, recon. All batched (n, ...)."""
    n = sy.shape[0]
    cbp_luma_nz = (levels["ac"] != 0).any(axis=(1, 2))
    # I16x16 luma AC is all-or-nothing; recon keeps AC only when coded
    keep = cbp_luma_nz[:, None, None]
    # recompute recon residual with AC masked off when cbp==0:
    # res_mb already includes AC; rebuild DC-only residual for masked case
    dc_only = _dc_only_residual(levels["dc"], qp, n)
    res_final = jnp.where(keep, res_mb, dc_only)
    recon_y = jnp.clip(pred_y + res_final, 0, 255)

    dc_u, ac_u = _chroma_residual_pipeline(su, pu, qpc, True)
    dc_v, ac_v = _chroma_residual_pipeline(sv, pv, qpc, True)
    has_ac = (ac_u != 0).any(axis=(1, 2)) | (ac_v != 0).any(axis=(1, 2))
    has_dc = (dc_u != 0).any(axis=(1, 2)) | (dc_v != 0).any(axis=(1, 2))
    cbp_chroma = jnp.where(has_ac, 2, jnp.where(has_dc, 1, 0)).astype(jnp.int32)
    rec_u = _chroma_recon(pu, dc_u, ac_u, qpc, cbp_chroma >= 1, cbp_chroma == 2)
    rec_v = _chroma_recon(pv, dc_v, ac_v, qpc, cbp_chroma >= 1, cbp_chroma == 2)
    return {
        "dc": levels["dc"], "ac": levels["ac"],
        "cbp_luma_nz": cbp_luma_nz, "cbp_chroma": cbp_chroma,
        "dc_u": dc_u, "dc_v": dc_v, "ac_u": ac_u, "ac_v": ac_v,
        "recon_y": recon_y, "recon_u": rec_u, "recon_v": rec_v,
    }


def _dc_only_residual(dc_zz, qp, n):
    """Residual contribution of the DC block alone (AC zeroed)."""
    dc_r = tj.zigzag_unscan(dc_zz)                  # (n,4,4) raster
    dc_rec = tj.luma_dc_dequant(dc_r, qp)
    d = jnp.zeros((n, 16, 4, 4), jnp.int32)
    d = d.at[:, :, 0, 0].set(dc_rec[:, BLK_Y, BLK_X])
    res = tj.idct4x4_core(d)
    return blocks_to_mb(res)


def apply_loop_filter(out, qp, mbh, mbw, intra: bool,
                      offA: int = 0, offB: int = 0, qpc_offset: int = 0,
                      interpret: bool | None = None):
    """In-loop deblock of the recon planes in `out` (device, exact §8.7).

    Derives the bs metadata from the encoder's own syntax tensors: per-4x4
    total_coeff (cbp-masked levels), per-MB mv broadcast to 4x4 blocks,
    all-intra / all-inter frame maps, constant QP.  offA/offB are the full
    (2 * div2) slice offsets.  Returns filtered (y, u, v)."""
    from ..ops.deblock import build_maps, deblock_apply_wavefront
    n = mbh * mbw
    if intra:
        tc4 = jnp.zeros((4 * mbh, 4 * mbw), jnp.int32)
        mv4 = jnp.zeros((4 * mbh, 4 * mbw, 2), jnp.int32)
        intra_map = jnp.ones((mbh, mbw), bool)
    else:
        quad = ((out["cbp_luma"][:, None] >> (jnp.arange(16) // 4)) & 1).astype(bool)
        lv = jnp.where(quad[:, :, None], out["levels"], 0)
        tc_blk = (lv != 0).sum(-1)                       # (n, 16) block order
        if "t8" in out:
            # 8x8-transformed MBs: bS sees the 8x8 block's coded status on
            # every covered 4x4 (the interleaved sub-split is not the
            # decoder's block structure)
            qtc = tc_blk.reshape(n, 4, 4).sum(-1)        # per-quadrant
            tc8 = jnp.repeat(qtc[:, :, None], 4, axis=2).reshape(n, 16)
            tc_blk = jnp.where(out["t8"][:, None].astype(bool), tc8, tc_blk)
        inv16 = jnp.zeros(16, jnp.int32).at[BLK_Y * 4 + BLK_X].set(
            jnp.arange(16, dtype=jnp.int32))
        raster = jnp.take(tc_blk, inv16, axis=1)
        tc4 = (raster.reshape(mbh, mbw, 4, 4).transpose(0, 2, 1, 3)
               .reshape(4 * mbh, 4 * mbw))
        if "mv8" in out:
            mv4 = jnp.repeat(jnp.repeat(out["mv8"], 2, 0), 2, 1)
        else:
            mv = out["mv"].reshape(mbh, mbw, 2)
            mv4 = jnp.repeat(jnp.repeat(mv, 4, 0), 4, 1)
        intra_map = jnp.zeros((mbh, mbw), bool)
    if not intra and "ref_idx" in out:
        rr = out["ref_idx"].reshape(mbh, mbw)
        ref4 = jnp.repeat(jnp.repeat(rr, 4, 0), 4, 1)
    else:
        ref4 = jnp.zeros((4 * mbh, 4 * mbw), jnp.int32)
    qp_map = (out["qp_real"].reshape(mbh, mbw) if "qp_real" in out
              else jnp.full((mbh, mbw), qp, jnp.int32))
    t8_4 = None
    if not intra and "t8" in out:
        t8mb = out["t8"].reshape(mbh, mbw).astype(bool)
        t8_4 = jnp.repeat(jnp.repeat(t8mb, 4, 0), 4, 1)
    maps = build_maps(intra_map, tc4, mv4, ref4, qp_map, offA, offB,
                      qpc_offset, t8_4=t8_4)
    # slope-2 wavefront application (XLA): ~2*mbh + mbw vectorized scan
    # steps; replaced the sequential rolling-window Pallas kernel, which
    # cost 55 ms/frame at 1080p (8160 serial MB steps).  `interpret` is
    # retained for API compatibility (the wavefront has no kernel mode).
    del interpret
    return deblock_apply_wavefront(out["recon_y"], out["recon_u"],
                                   out["recon_v"], *maps)


encode_p_frame = partial(jax.jit, static_argnames=(
    "rng", "subpel", "me_backend", "aq_strength", "qpc_offset",
    "decimate", "trellis", "partitions", "dct8x8"))(encode_p_frame_core)
encode_b_frame = partial(jax.jit, static_argnames=(
    "rng", "subpel", "me_backend", "decimate", "trellis",
    "want_recon", "dct8x8"))(encode_b_frame_core)
encode_i_frame = partial(jax.jit, static_argnames=("i4x4",))(
    encode_i_frame_core)
