"""Device bit packing + device CAVLC must match the host reference."""

import numpy as np
import jax.numpy as jnp

from x264vfw_tpu.encode.device_pack import pack_slots
from x264vfw_tpu.utils.bitstream import pack_codes
from x264vfw_tpu.bitstream import cavlc_vec
from x264vfw_tpu.bitstream import cavlc_jax


def test_pack_slots_random():
    rng = np.random.default_rng(0)
    for trial in range(12):
        n = int(rng.integers(1, 3000))
        lens = rng.integers(0, 32, size=n)
        lens[rng.uniform(size=n) < 0.5] = 0
        vals = np.array([rng.integers(0, 1 << max(int(l), 1)) for l in lens],
                        dtype=np.uint64)
        want_bytes, want_bits = pack_codes(vals, lens.astype(np.int64))
        cap_words = (int(lens.sum()) + 127) // 32 + 4
        got, bits = pack_slots(jnp.asarray(vals.astype(np.uint32)),
                               jnp.asarray(lens.astype(np.int32)), cap_words)
        got = np.asarray(got)
        assert int(bits) == want_bits
        nb = (want_bits + 7) // 8
        np.testing.assert_array_equal(got[:nb], want_bytes[:nb], err_msg=str(trial))


def test_pack_slots_long_codes():
    """Codes longer than 32 bits (leading zeros) and word-straddling."""
    cases = [
        ([(1, 1)] * 40, None),
        ([(0b101, 3), (0xFFFF, 46), (1, 33), (0x7FFFFFFF, 31)], None),
        ([(0, 0), (1, 17), (0, 0), (0x1234, 13), (1, 46)], None),
    ]
    for slots, _ in cases:
        vals = np.array([v for v, _ in slots], dtype=np.uint64)
        lens = np.array([l for _, l in slots], dtype=np.int64)
        want_bytes, want_bits = pack_codes(vals, lens)
        got, bits = pack_slots(jnp.asarray(vals.astype(np.uint32)),
                               jnp.asarray(lens.astype(np.int32)), 16)
        got = np.asarray(got)
        assert int(bits) == want_bits
        nb = (want_bits + 7) // 8
        np.testing.assert_array_equal(got[:nb], want_bytes[:nb])


def test_cavlc_jax_matches_vec():
    rng = np.random.default_rng(3)
    for maxc, ncs in ((16, [0, 2, 5, 9, -1 + 1]), (15, [0, 3, 6]), (4, [-1])):
        for nc in ncs:
            batch = []
            for _ in range(200):
                lv = rng.integers(-9, 10, size=maxc) * (rng.uniform(size=maxc) < rng.uniform())
                batch.append(lv)
            batch = np.asarray(batch, np.int32)
            nC = np.full(batch.shape[0], nc, np.int64)
            wv, wl = cavlc_vec.encode_blocks(batch, nC, maxc)
            gv, gl = cavlc_jax.encode_blocks(jnp.asarray(batch), jnp.asarray(nC), maxc)
            _assert_same_bits(np.asarray(gv), np.asarray(gl), wv, wl)


def test_cavlc_jax_extreme_levels():
    cases = np.zeros((8, 16), np.int32)
    cases[0, 0] = 2047
    cases[1, 0] = -4000
    cases[2, :4] = [2000, 1000, 500, 250]
    cases[3, 0] = 16
    cases[4, :2] = [30, -31]
    cases[5, :16] = np.arange(1, 17)
    cases[6, 15] = -7
    cases[7, :3] = [1, -1, 1]
    nC = np.array([0, 1, 4, 8, 2, 3, 0, 20], np.int64)
    wv, wl = cavlc_vec.encode_blocks(cases, nC, 16)
    gv, gl = cavlc_jax.encode_blocks(jnp.asarray(cases), jnp.asarray(nC), 16)
    _assert_same_bits(np.asarray(gv), np.asarray(gl), wv, wl)

def _assert_same_bits(gv, gl, wv, wl):
    """Slot layouts may differ (position- vs rank-indexed); the invariant is
    the packed per-block bitstream."""
    assert gv.shape[0] == wv.shape[0]
    for r in range(gv.shape[0]):
        gb, gn = pack_codes(gv[r].astype(np.uint64), gl[r].astype(np.int64))
        wb, wn = pack_codes(wv[r].astype(np.uint64), wl[r].astype(np.int64))
        assert gn == wn, (r, gn, wn)
        nb = (gn + 7) // 8
        np.testing.assert_array_equal(gb[:nb], wb[:nb])
