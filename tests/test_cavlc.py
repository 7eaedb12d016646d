"""CAVLC: VLC table structural checks + encode/decode roundtrip."""

import numpy as np
import pytest

from x264vfw_tpu.utils.bitstream import BitReader, BitWriter
from x264vfw_tpu.bitstream import cavlc_tables as T
from x264vfw_tpu.bitstream.cavlc import (
    decode_level,
    decode_residual_block,
    encode_level,
    encode_residual_block,
    level_code,
    level_from_code,
)


def assert_prefix_free(codes, complete=None):
    """codes: list of (value, length). Checks prefix-freedom and Kraft <= 1."""
    seen = [(v, ln) for v, ln in codes]
    for i, (v1, l1) in enumerate(seen):
        for j, (v2, l2) in enumerate(seen):
            if i == j:
                continue
            if l1 <= l2 and (v2 >> (l2 - l1)) == v1:
                raise AssertionError(f"prefix clash: ({v1:0{l1}b}) prefixes ({v2:0{l2}b})")
    kraft = sum(2.0 ** -ln for _, ln in seen)
    assert kraft <= 1.0 + 1e-12, kraft
    if complete:
        assert abs(kraft - 1.0) < 1e-12, f"expected complete code, kraft={kraft}"


def test_coeff_token_tables_structure():
    for ctx, tbl in enumerate(T.COEFF_TOKEN):
        assert_prefix_free(tbl.values())
        # correct key coverage
        maxn = 4 if ctx == 3 else 16
        keys = set(tbl.keys())
        want = {(t1, n) for n in range(maxn + 1) for t1 in range(min(n, 3) + 1)}
        assert keys == want, ctx


def test_total_zeros_tables_structure():
    for n, codes in T.TOTAL_ZEROS.items():
        assert len(codes) == 16 - n + 1
        # N=1 row is legitimately incomplete in the spec (all-zeros unused)
        assert_prefix_free(codes, complete=(n != 1))
    for n, codes in T.TOTAL_ZEROS_CHROMA_DC.items():
        assert len(codes) == 4 - n + 1
        assert_prefix_free(codes, complete=True)


def test_run_before_tables_structure():
    for zl, codes in T.RUN_BEFORE.items():
        if zl < 7:
            assert len(codes) == zl + 1
            assert_prefix_free(codes, complete=True)
        else:
            assert len(codes) == 15
            assert_prefix_free(codes)


def test_level_roundtrip():
    for sl in range(0, 7):
        for lv in list(range(-70, 71)) + [-3000, 3000, -2**14, 2**14, -2**16, 2**16]:
            if lv == 0:
                continue
            for first in (False, True):
                for t1 in (0, 3):
                    w = BitWriter()
                    lc = level_code(lv, first, t1)
                    if lc < 0:
                        continue  # (first && t1<3) cannot encode |level|=1 sign + --> skip invalid combos
                    encode_level(w, lc, sl)
                    w.rbsp_trailing_bits()
                    r = BitReader(w.to_rbsp())
                    lc2 = decode_level(r, sl)
                    assert lc2 == lc, (lv, sl, first, t1)
                    assert level_from_code(lc2, first, t1) == lv


def _roundtrip(levels, nC, max_coeffs):
    w = BitWriter()
    encode_residual_block(w, np.asarray(levels, dtype=np.int32), nC, max_coeffs)
    w.rbsp_trailing_bits()
    r = BitReader(w.to_rbsp())
    out = decode_residual_block(r, nC, max_coeffs)
    np.testing.assert_array_equal(out, np.asarray(levels, dtype=np.int32))


@pytest.mark.parametrize("nC", [-1, 0, 1, 2, 3, 4, 7, 8, 20])
def test_residual_roundtrip_random(nC):
    rng = np.random.default_rng(42 + nC)
    max_coeffs = 4 if nC == -1 else 16
    for trial in range(300):
        density = rng.uniform(0, 1)
        levels = rng.integers(-8, 9, size=max_coeffs)
        mask = rng.uniform(size=max_coeffs) < density
        levels = np.where(mask, levels, 0)
        _roundtrip(levels, nC, max_coeffs)


def test_residual_roundtrip_ac15():
    rng = np.random.default_rng(7)
    for trial in range(300):
        levels = rng.integers(-4, 5, size=15) * (rng.uniform(size=15) < 0.4)
        for nC in (0, 2, 5, 9):
            _roundtrip(levels, nC, 15)


def test_residual_edge_cases():
    # empty block
    _roundtrip(np.zeros(16, np.int32), 0, 16)
    _roundtrip(np.zeros(4, np.int32), -1, 4)
    # full block, all ones
    _roundtrip(np.ones(16, np.int32), 0, 16)
    # single large coefficient at end
    lv = np.zeros(16, np.int32); lv[15] = 3000
    _roundtrip(lv, 0, 16)
    lv[15] = -30000
    _roundtrip(lv, 4, 16)
    # exactly 3 trailing ones then big levels
    lv = np.array([9, -12, 100, 0, 1, -1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0], np.int32)
    _roundtrip(lv, 1, 16)
    # >10 coeffs with <3 trailing ones (suffixLength init 1)
    lv = np.array([5, 4, 3, 2, 2, 2, 2, 3, 4, 5, 6, 0, 0, 0, 0, 0], np.int32)
    _roundtrip(lv, 0, 16)
    # chroma DC all four
    _roundtrip(np.array([3, -3, 7, 1], np.int32), -1, 4)
