"""CAVLC residual coding on device (JAX) — mirror of cavlc_vec.py.

Entropy coding is usually called 'inherently serial'; CAVLC's table lookups
and per-coefficient codes are in fact data-parallel per block — only the
suffix-length adaptation is a short (<=16 step) chain, which we run as 16
vectorized steps over all blocks of a frame at once.  Together with
device_pack.py this keeps the whole entropy stage on the TPU; only packed
bitstream bytes cross to the host.

TPU-shaped implementation notes: random gathers are poison on the VPU, so
the "sort nonzeros to the front" step and every positional lookup are
expressed as one-hot select-sums over the tiny (<=16) coefficient axis —
pure elementwise math that XLA fuses into a handful of kernels.

Codes are capped at 31 significant bits per slot (longer codes carry
implicit leading zeros — device_pack convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import cavlc_tables as T

SLOTS = 34

# numpy constants: embedded into the XLA program at trace time
CT_VAL = T.COEFF_TOKEN_VAL.astype(np.uint32)      # (5,17,4)
CT_LEN = T.COEFF_TOKEN_LEN.astype(np.int32)
TZ_VAL = T.TOTAL_ZEROS_VAL.astype(np.uint32)      # (16,16)
TZ_LEN = T.TOTAL_ZEROS_LEN.astype(np.int32)
TZC_VAL = T.TOTAL_ZEROS_CDC_VAL.astype(np.uint32)  # (4,4)
TZC_LEN = T.TOTAL_ZEROS_CDC_LEN.astype(np.int32)
RB_VAL = T.RUN_BEFORE_VAL.astype(np.uint32)       # (8,15)
RB_LEN = T.RUN_BEFORE_LEN.astype(np.int32)


def _ctx_from_nc(nC):
    ctx = jnp.full(nC.shape, 4, jnp.int32)
    ctx = jnp.where(nC < 8, 2, ctx)
    ctx = jnp.where(nC < 4, 1, ctx)
    ctx = jnp.where(nC < 2, 0, ctx)
    ctx = jnp.where(nC < 0, 3, ctx)
    return ctx


def _lut2(val_tab: np.ndarray, len_tab: np.ndarray, i, j):
    """Gather-free 2D table lookup via one-hot on the flattened table."""
    R, C = val_tab.shape
    flat_idx = i * C + j
    oh = flat_idx[:, None] == jnp.arange(R * C)[None, :]
    v = (jnp.asarray(val_tab.reshape(-1).astype(np.int64)).astype(jnp.int32)
         [None, :] * oh).sum(-1)
    ln = (jnp.asarray(len_tab.reshape(-1))[None, :] * oh).sum(-1)
    return v.astype(jnp.uint32), ln


def encode_blocks(levels: jnp.ndarray, nC: jnp.ndarray, max_coeffs: int):
    """(N, L) zigzag levels + (N,) nC -> (vals uint32, lens int32) (N, SLOTS).

    Position-indexed slot layout: the level code of the coefficient at
    zigzag position j lives in slot 2 + (L-1-j) and its run_before in slot
    19 + (L-1-j) — descending-position order IS the CAVLC coding order, and
    zero-length slots vanish in the packer, so the packed bitstream is
    identical to a rank-compacted layout while skipping the O(N*L^2)
    rank-gather machinery entirely (every step below is O(N*L) elementwise
    plus an O(L) sequential suffix-length chain of O(N) steps).
    """
    levels = levels.astype(jnp.int32)
    N, L = levels.shape
    assert L == max_coeffs
    nC = nC.astype(jnp.int32)
    idx = jnp.arange(L, dtype=jnp.int32)

    nz = levels != 0
    nzi = nz.astype(jnp.int32)
    cum = jnp.cumsum(nzi, axis=-1)                # nonzeros at pos <= j
    tc = cum[:, -1]
    snz = tc[:, None] - cum                       # nonzeros at pos > j

    # ---- trailing ones: the run of +-1 nonzeros at the end, capped at 3 ----
    m = nz & (jnp.abs(levels) == 1)
    ok = ((~nz) | m).astype(jnp.int32)
    # AND over strictly-higher positions
    rev_and = jnp.flip(jnp.cumprod(jnp.flip(ok, -1), -1), -1)
    rev_and_excl = jnp.concatenate(
        [rev_and[:, 1:], jnp.ones((N, 1), jnp.int32)], -1).astype(bool)
    is_t1 = nz & m & rev_and_excl & (snz < 3)
    t1 = is_t1.sum(-1).astype(jnp.int32)

    vals = jnp.zeros((N, SLOTS), jnp.uint32)
    lens = jnp.zeros((N, SLOTS), jnp.int32)

    # ---- coeff_token: one-hot over the (5*17*4 = 340) flat table ----
    ctx = _ctx_from_nc(nC)
    flat = ctx * (17 * 4) + tc * 4 + t1
    ohc = flat[:, None] == jnp.arange(5 * 17 * 4)[None, :]
    ctv = (jnp.asarray(CT_VAL.reshape(-1).astype(np.int64)).astype(jnp.int32)
           [None, :] * ohc).sum(-1)
    ctl = (jnp.asarray(CT_LEN.reshape(-1))[None, :] * ohc).sum(-1)
    vals = vals.at[:, 0].set(ctv.astype(jnp.uint32))
    lens = lens.at[:, 0].set(ctl)

    # ---- trailing one signs (slot 1): i-th-from-end sign at bit t1-1-i ----
    neg = ((levels < 0) & is_t1).astype(jnp.uint32)
    shift = jnp.clip(t1[:, None] - 1 - snz, 0, 31).astype(jnp.uint32)
    sign_val = (neg << shift).sum(-1, dtype=jnp.uint32)
    vals = vals.at[:, 1].set(sign_val)
    lens = lens.at[:, 1].set(t1)

    # ---- levels: descending-position chain (suffix length is sequential) --
    active = nz & (snz >= t1[:, None])            # coded as a level code
    lc_all = jnp.where(levels > 0, 2 * levels - 2, -2 * levels - 1)
    lc_all = lc_all - 2 * ((snz == t1[:, None]) & (t1[:, None] < 3)
                           & active)
    sl = jnp.where((tc > 10) & (t1 < 3), 1, 0).astype(jnp.int32)
    lv_cols = [None] * L
    ll_cols = [None] * L
    for j in range(L - 1, -1, -1):
        a = active[:, j]
        lc = lc_all[:, j]
        sl1 = jnp.maximum(sl, 1)
        p = jnp.zeros(N, jnp.int32)
        suffix = jnp.zeros(N, jnp.int32)
        ssz = jnp.zeros(N, jnp.int32)
        a1 = (sl == 0) & (lc < 14)
        p = jnp.where(a1, lc, p)
        a2 = (sl == 0) & (lc >= 14) & (lc < 30)
        p = jnp.where(a2, 14, p)
        suffix = jnp.where(a2, lc - 14, suffix)
        ssz = jnp.where(a2, 4, ssz)
        b1 = (sl > 0) & (lc < (15 << sl1))
        p = jnp.where(b1, lc >> sl1, p)
        suffix = jnp.where(b1, lc & ((1 << sl1) - 1), suffix)
        ssz = jnp.where(b1, sl, ssz)
        esc = ((sl == 0) & (lc >= 30)) | ((sl > 0) & (lc >= (15 << sl1)))
        base = jnp.where(sl == 0, 30, 15 << sl1)
        rem = jnp.maximum(lc - base, 0)
        kk = (jnp.frexp((rem.astype(jnp.float32) / 4096.0) + 1.0)[1] - 1)
        kk = kk.astype(jnp.int32)
        off = (jnp.int32(4096) << kk) - 4096
        p = jnp.where(esc, 15 + kk, p)
        suffix = jnp.where(esc, rem - off, suffix)
        ssz = jnp.where(esc, 12 + kk, ssz)
        code_val = (jnp.uint32(1) << ssz.astype(jnp.uint32)) | suffix.astype(jnp.uint32)
        code_len = p + 1 + ssz
        lv_cols[j] = jnp.where(a, code_val, 0)
        ll_cols[j] = jnp.where(a, code_len, 0)
        new_sl = jnp.maximum(sl, 1)
        new_sl = new_sl + ((jnp.abs(levels[:, j]) > (3 << jnp.maximum(new_sl - 1, 0)))
                           & (new_sl < 6))
        sl = jnp.where(a, new_sl, sl)
    # slot 2 + (L-1-j): descending position -> ascending slot
    vals = vals.at[:, 2:2 + L].set(jnp.stack(lv_cols[::-1], axis=1))
    lens = lens.at[:, 2:2 + L].set(jnp.stack(ll_cols[::-1], axis=1))

    # ---- total_zeros (slot 18) ----
    last_pos = jnp.max(jnp.where(nz, idx[None, :], -1), axis=-1)
    tz = jnp.where(tc > 0, last_pos + 1 - tc, 0)
    need = (tc > 0) & (tc < max_coeffs)
    if max_coeffs == 4:
        tzv, tzl = _lut2(TZC_VAL, TZC_LEN, jnp.clip(tc, 0, 3), jnp.clip(tz, 0, 3))
    else:
        tzv, tzl = _lut2(TZ_VAL, TZ_LEN, jnp.clip(tc, 0, 15), jnp.clip(tz, 0, 15))
    vals = vals.at[:, 18].set(jnp.where(need, tzv, 0))
    lens = lens.at[:, 18].set(jnp.where(need, tzl, 0))

    # ---- run_before: coefficient at j (not the lowest nonzero), slot
    # 19 + (L-1-j); zerosLeft at j = zeros at positions < j ----
    prev_incl = jax.lax.cummax(jnp.where(nz, idx[None, :], -1), axis=1)
    prev_below = jnp.concatenate(
        [jnp.full((N, 1), -1, jnp.int32), prev_incl[:, :-1]], -1)
    run = jnp.clip(idx[None, :] - prev_below - 1, 0, 14)
    zl = idx[None, :] - cum + 1
    run_active = nz & (prev_below >= 0) & (zl > 0)
    zli = jnp.clip(zl, 1, 7)
    rv, rl = _lut2(RB_VAL, RB_LEN, zli.reshape(-1), run.reshape(-1))
    rv = rv.reshape(N, L)
    rl = rl.reshape(N, L)
    nrun = L - 1  # position 0 never carries a run
    vals = vals.at[:, 19:19 + nrun].set(
        jnp.where(run_active, rv, 0)[:, :0:-1])
    lens = lens.at[:, 19:19 + nrun].set(
        jnp.where(run_active, rl, 0)[:, :0:-1])
    return vals, lens


def ue_codes_j(v: jnp.ndarray):
    """Vectorized unsigned exp-Golomb on device: (vals uint32, lens int32)."""
    x = v.astype(jnp.int32) + 1
    nb = jnp.frexp(x.astype(jnp.float32))[1]  # bit_length, exact < 2^24
    return x.astype(jnp.uint32), (2 * nb - 1).astype(jnp.int32)


def se_codes_j(v: jnp.ndarray):
    code = jnp.where(v > 0, 2 * v - 1, -2 * v)
    return ue_codes_j(code)
