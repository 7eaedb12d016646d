"""Vectorized CAVLC must emit bit-identical codes to the scalar reference."""

import numpy as np
import pytest

from x264vfw_tpu.bitstream.cavlc import encode_residual_block
from x264vfw_tpu.bitstream.cavlc_vec import encode_blocks
from x264vfw_tpu.utils.bitstream import BitWriter, pack_codes


def scalar_bits(levels, nC, maxc):
    w = BitWriter()
    encode_residual_block(w, levels, nC, maxc)
    data = w.to_rbsp()
    return data.tobytes(), w.bit_position


def vec_bits(levels_batch, nC_batch, maxc):
    vals, lens = encode_blocks(levels_batch, nC_batch, maxc)
    out = []
    for i in range(levels_batch.shape[0]):
        data, total = pack_codes(vals[i].astype(np.uint64), lens[i].astype(np.int64))
        out.append((data.tobytes(), total))
    return out


@pytest.mark.parametrize("maxc,ncs", [
    (16, [0, 1, 2, 3, 4, 7, 8, 20]),
    (15, [0, 2, 5, 9]),
    (4, [-1]),
])
def test_vec_matches_scalar_random(maxc, ncs):
    rng = np.random.default_rng(maxc)
    for nc in ncs:
        batch = []
        for _ in range(400):
            density = rng.uniform()
            lv = rng.integers(-9, 10, size=maxc) * (rng.uniform(size=maxc) < density)
            batch.append(lv)
        batch = np.asarray(batch, dtype=np.int32)
        nC = np.full(batch.shape[0], nc, dtype=np.int64)
        got = vec_bits(batch, nC, maxc)
        for i in range(batch.shape[0]):
            want = scalar_bits(batch[i], nc, maxc)
            assert got[i] == want, (nc, batch[i].tolist())


def test_vec_matches_scalar_extreme_levels():
    cases = [
        [7, 0] + [0] * 14, [16, 0] + [0] * 14, [30, 0] + [0] * 14,
        [100, -200] + [0] * 14, [2047, 0] + [0] * 14, [4000, 0] + [0] * 14,
        [9000, -9000] + [0] * 14, [32000, 1, -1, 1] + [0] * 12,
        [3, 7, 15, 31, 63, 127] + [0] * 10,
        list(range(1, 17)), [-x for x in range(1, 17)],
    ]
    batch = np.asarray(cases, dtype=np.int32)
    nC = np.zeros(batch.shape[0], dtype=np.int64)
    got = vec_bits(batch, nC, 16)
    for i in range(batch.shape[0]):
        want = scalar_bits(batch[i], 0, 16)
        assert got[i] == want, cases[i]


def test_vec_empty_and_full():
    batch = np.zeros((3, 16), np.int32)
    batch[1] = 1
    batch[2, 15] = -5
    nC = np.array([0, 4, 8])
    got = vec_bits(batch, nC, 16)
    for i in range(3):
        assert got[i] == scalar_bits(batch[i], int(nC[i]), 16)
