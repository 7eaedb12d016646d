"""Prototype: hierarchical boundary lookup replacing pack's searchsorted.

pos[q] = #slots with w_hi <= q (q = word index) is computed as
  r_q  = row containing bit 32(q+1)        (searchsorted over R row ends)
  pos  = r_q * L + pos_local[r_q, q - rstart_word(r_q)]
with pos_local[r, wl] = #slots of row r whose phase-shifted local end-bit
<= 32*(wl+1) — a dense compare over the row's L slots, WR thresholds.

Zero-contribution slots may land on either side of a row boundary vs the
flat searchsorted; csum differences are unchanged (their va/vb are 0).

Run: python tools/proto_pack2.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WR = 64


def main():
    import jax
    import jax.numpy as jnp
    from x264vfw_tpu.encode.device_pack import _cumsum_2level
    from x264vfw_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    R, L = 8162, 874
    CAP = 1 << 13
    rng = np.random.default_rng(0)
    lens_np = np.where(rng.random((R, L)) < 0.25,
                       rng.integers(1, 12, (R, L)), 0).astype(np.int32)
    vals_np = rng.integers(0, 1 << 10, (R, L)).astype(np.uint32)
    vals = jnp.asarray(vals_np)
    lens = jnp.asarray(lens_np)

    def pos_fast(lens2):
        ends_l = jnp.cumsum(lens2, axis=-1, dtype=jnp.int32)   # local ends
        row_bits = ends_l[:, -1]
        rend = jnp.cumsum(row_bits, dtype=jnp.int32)
        rstart = rend - row_bits
        p = rstart & 31
        eshift = ends_l + p[:, None]                           # (R, L)
        thr = 32 * (jnp.arange(WR, dtype=jnp.int32) + 1)
        pos_local = (eshift[:, None, :] <= thr[None, :, None]).sum(
            axis=-1, dtype=jnp.int32)                          # (R, WR)
        q = jnp.arange(CAP + 1, dtype=jnp.int32)
        bq = 32 * (q + 1)
        r_q = jnp.clip(jnp.searchsorted(rend, bq, side="left"), 0, R - 1)
        wl = jnp.clip(q - (jnp.take(rstart, r_q) >> 5), 0, WR - 1)
        pos = r_q * L + pos_local[r_q, wl]
        return pos

    def pos_ref(lens2):
        ends = _cumsum_2level(lens2)
        w_hi = jnp.clip((ends - 1) >> 5, 0, CAP - 1)
        return jnp.searchsorted(w_hi, jnp.arange(CAP + 1, dtype=w_hi.dtype),
                                side="right")

    # correctness: compare word values (csum difference), not raw pos
    ends = _cumsum_2level(lens)
    v = jnp.where(lens.reshape(-1) > 0, vals.reshape(-1), 0)
    e = ends
    w_hi = jnp.clip((e - 1) >> 5, 0, CAP - 1)
    r = jnp.where(e > 0, (w_hi + 1) * 32 - e, 0)
    va = (v << r.astype(jnp.uint32))
    csum_a = _cumsum_2level(va.reshape(R, L))

    def words_from(pos):
        S = jnp.where(pos > 0, csum_a[jnp.maximum(pos - 1, 0)], 0) \
            .astype(jnp.uint32)
        prev = jnp.concatenate([jnp.zeros((1,), jnp.uint32), S[:-1]])
        return S - prev

    wf = np.asarray(words_from(pos_fast(lens)[:CAP]))
    wr_ = np.asarray(words_from(pos_ref(lens)[:CAP]))
    nw = int(np.asarray(ends)[-1]) // 32
    assert (wf[:nw] == wr_[:nw]).all(), \
        f"mismatch {np.nonzero(wf[:nw] != wr_[:nw])[0][:10]}"
    print(f"correct over {nw} words", flush=True)

    def timed(label, step, n=16):
        c = step(jnp.int32(0))
        np.asarray(c)
        t0 = time.perf_counter()
        for _ in range(n):
            c = step(c)
        np.asarray(c)
        ms = (time.perf_counter() - t0) / n * 1000.0
        print(f"{label:28s}: {ms:8.3f} ms", flush=True)

    timed("pos_fast", jax.jit(lambda c: pos_fast(lens + c * 0).sum()
                              .astype(jnp.int32)))
    timed("pos_ref ", jax.jit(lambda c: pos_ref(lens + c * 0).sum()
                              .astype(jnp.int32)))


if __name__ == "__main__":
    main()
