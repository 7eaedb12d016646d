"""Bitstream packing on device (JAX) — slots -> packed bytes, no host loop.

Packs a flat sequence of (value, bitlength) codeword slots into an MSB-first
byte stream entirely on the TPU:

  1. exclusive cumsum of lengths -> absolute end-bit of each slot (sorted!)
  2. each slot contributes to exactly two consecutive 32-bit words
     (values carry <=31 significant bits; longer codes are leading zeros)
  3. per-word totals via a *wrapping* uint32 cumsum + last-of-word boundary
     scatter (unique indices) + cummax fill-forward — bit-disjointness makes
     SUM == OR, and wrapping differences recover exact word values.

No lax.sort, no conflicting scatters: everything is cumsum/where/gather,
which XLA lowers well on TPU.  Output: (bytes uint8 (cap,), total_bits).
"""

from __future__ import annotations

import jax.numpy as jnp


def pack_slots(vals: jnp.ndarray, lens: jnp.ndarray, cap_words: int):
    """vals: (N,) uint32 (<=31 significant bits), lens: (N,) int32 (0..46).

    Returns (packed bytes uint8 (cap_words*4,), total_bits int32).
    Slots beyond cap_words*32 bits are silently dropped (caller sizes cap).
    """
    vals = jnp.where(lens > 0, vals.astype(jnp.uint32), 0)
    lens = lens.astype(jnp.int32)
    n = vals.shape[0]

    ends = jnp.cumsum(lens)                        # inclusive end-bit
    total_bits = ends[-1] if n else jnp.int32(0)
    e = ends
    # word carrying the final bit of each slot
    w_hi = jnp.clip((e - 1) >> 5, 0, cap_words - 1)
    r = jnp.where(e > 0, (w_hi + 1) * 32 - e, 0)   # bits after code end in w_hi
    # contribution to w_hi: (v << r) mod 2^32
    va = (vals << r.astype(jnp.uint32))
    # contribution to w_hi - 1: v >> (32 - r) with r==0 -> 0
    vb = (vals >> (31 - r).astype(jnp.uint32)) >> 1
    ib = jnp.maximum(w_hi - 1, 0)

    # Sorted-index segment sums into cap_words words (uint32 wrap): word w's
    # value = csum[last slot with idx <= w]; bit-disjointness makes
    # wrapping-sum == OR.  One searchsorted serves BOTH the w_hi sum and the
    # (w_hi - 1) spill sum: the spill's boundary at word w is the w_hi
    # boundary at w + 1, so evaluate pos over [0, cap] once and slice.
    csum_a = jnp.cumsum(va, dtype=jnp.uint32)
    csum_b = jnp.cumsum(vb, dtype=jnp.uint32)
    pos = jnp.searchsorted(w_hi, jnp.arange(cap_words + 1, dtype=w_hi.dtype),
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

