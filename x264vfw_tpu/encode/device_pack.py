"""Bitstream packing on device (JAX) — slots -> packed bytes, no host loop.

Packs a sequence of (value, bitlength) codeword slots into an MSB-first
byte stream entirely on the TPU:

  1. cumsum of lengths -> absolute end-bit of each slot (2D inputs use a
     cheap two-level cumsum: lane-dim row scans + a tiny row-offset scan)
  2. each slot contributes to exactly two consecutive 32-bit words
     (values carry <=31 significant bits; longer codes are leading zeros)
  3. per-word totals via a *wrapping* uint32 cumsum + a searchsorted of the
     word boundaries — bit-disjointness makes SUM == OR, and wrapping
     differences recover exact word values.

Scatter is NOT an option here: XLA:TPU lowers scatter with runtime indices
to a serial loop (~6 ms fixed + ~9 ns/update — measured), which is slower
than everything else in the encoder combined.  searchsorted costs
cap_words x log(N) gathers (~10 ms at a 16k-word bucket) — still the pack
bottleneck; the planned fix is a Pallas kernel (in-VMEM combine tree +
sequential dynamic stores).  Output: (bytes uint8 (cap,), total_bits).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cumsum_2level(a2d: jnp.ndarray):
    """Row-major global cumsum of a 2D array via lane-dim row cumsums plus an
    exclusive scan of row totals.  One O(R*L) lane scan + one O(R) scan
    instead of a single O(R*L) flat scan — at the slot counts of a 1080p
    frame (~7M) the flat scan costs several ms."""
    rows = jnp.cumsum(a2d, axis=-1, dtype=a2d.dtype)
    tot = rows[:, -1]
    off = jnp.concatenate([jnp.zeros((1,), a2d.dtype),
                           jnp.cumsum(tot, dtype=a2d.dtype)[:-1]])
    return (rows + off[:, None]).reshape(-1)


_WR = 64        # fast-path bound: words spanned by one row (2048 bits)


def _boundary_pos(rows_ends, row_bits, rstart, w_hi, cap_words: int):
    """pos[q] = #slots with w_hi <= q for q in [0, cap], hierarchically.

    The flat searchsorted over the ~7M-slot w_hi array costs ~5 ms/frame at
    1080p (23 gather rounds over a 28 MB array); this computes the same
    boundaries from the ROW structure: a dense per-row count of slot
    end-bits per word (rows span <= _WR words) + a small searchsorted over
    the R row ends.  Rows are fixed-width (L slots), so the global slot
    position is r*L + local count.  Slots that differ from the flat answer
    (zero-length slots exactly on a row/word boundary) contribute 0 to the
    packed words, so the csum differences are unchanged.

    Falls back to the flat searchsorted when any row exceeds the _WR-word
    span (pathological MBs; lax.cond keeps it off the hot path).
    """
    R, L = rows_ends.shape
    # phase-shifted local end-bits: row r's slot j ends at local bit
    # rows_ends[r, j] measured from the row's containing word boundary
    eshift = rows_ends + (rstart & 31)[:, None]
    thr = 32 * (jnp.arange(_WR, dtype=jnp.int32) + 1)
    pos_local = (eshift[:, None, :] <= thr[None, :, None]).sum(
        axis=-1, dtype=jnp.int32)                        # (R, _WR)
    rend = rstart + row_bits
    q = jnp.arange(cap_words + 1, dtype=jnp.int32)
    bq = 32 * (q + 1)
    r_q = jnp.clip(jnp.searchsorted(rend, bq, side="left"), 0, R - 1)
    wl = jnp.clip(q - (jnp.take(rstart, r_q) >> 5), 0, _WR - 1)
    return r_q * L + pos_local[r_q, wl]


def pack_slots(vals: jnp.ndarray, lens: jnp.ndarray, cap_words: int):
    """vals: (N,) or (R, L) uint32 (<=31 significant bits); lens matching
    int32 (0..46).  2D inputs pack rows in row-major stream order.

    Returns (packed bytes uint8 (cap_words*4,), total_bits int32).
    Slots beyond cap_words*32 bits are silently dropped (caller sizes cap).
    """
    vals = jnp.where(lens > 0, vals.astype(jnp.uint32), 0)
    lens = lens.astype(jnp.int32)

    shape2d = vals.shape if vals.ndim == 2 else None
    if shape2d is not None:
        rows_ends = jnp.cumsum(lens, axis=-1, dtype=jnp.int32)
        row_bits = rows_ends[:, -1]
        rstart = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                  jnp.cumsum(row_bits, dtype=jnp.int32)[:-1]])
        ends = (rows_ends + rstart[:, None]).reshape(-1)
        vals = vals.reshape(-1)
    else:
        ends = jnp.cumsum(lens)                    # inclusive end-bit
    n = vals.shape[0]
    total_bits = ends[-1] if n else jnp.int32(0)
    e = ends
    # word carrying the final bit of each slot
    w_hi = jnp.clip((e - 1) >> 5, 0, cap_words - 1)
    r = jnp.where(e > 0, (w_hi + 1) * 32 - e, 0)   # bits after code end in w_hi
    # contribution to w_hi: (v << r) mod 2^32
    va = (vals << r.astype(jnp.uint32))
    # contribution to w_hi - 1: v >> (32 - r); slots contained in one word
    # shift out entirely (r < len only when the slot spans the boundary)
    vb = (vals >> (31 - r).astype(jnp.uint32)) >> 1

    # word w's value = csum[last slot with w_hi <= w]; the boundary array
    # pos serves both the w_hi sum and the (w_hi - 1) spill sum (the
    # spill's boundary at word w is the w_hi boundary at w + 1)
    if shape2d is not None:
        csum_a = _cumsum_2level(va.reshape(shape2d))
        csum_b = _cumsum_2level(vb.reshape(shape2d))
        pos = jax.lax.cond(
            row_bits.max() <= 32 * (_WR - 2),
            lambda: _boundary_pos(rows_ends, row_bits, rstart, w_hi,
                                  cap_words),
            lambda: jnp.searchsorted(
                w_hi, jnp.arange(cap_words + 1, dtype=w_hi.dtype),
                side="right").astype(jnp.int32))
    else:
        csum_a = jnp.cumsum(va, dtype=jnp.uint32)
        csum_b = jnp.cumsum(vb, dtype=jnp.uint32)
        pos = jnp.searchsorted(w_hi,
                               jnp.arange(cap_words + 1, dtype=w_hi.dtype),
                               side="right")

    def at(csum, p):
        S = jnp.where(p > 0, csum[jnp.maximum(p - 1, 0)], 0).astype(jnp.uint32)
        prev = jnp.concatenate([jnp.zeros((1,), jnp.uint32), S[:-1]])
        return S - prev

    words = at(csum_a, pos[:cap_words]) + at(csum_b, pos[1:])
    # to MSB-first bytes
    b0 = (words >> 24).astype(jnp.uint8)
    b1 = ((words >> 16) & 0xFF).astype(jnp.uint8)
    b2 = ((words >> 8) & 0xFF).astype(jnp.uint8)
    b3 = (words & 0xFF).astype(jnp.uint8)
    out = jnp.stack([b0, b1, b2, b3], axis=-1).reshape(-1)
    return out, total_bits.astype(jnp.int32)
