"""Deblock edge-parameter maps (ops/deblock.py) vs the spec-order golden
model (ops/deblock_np.py).

build_maps computes bs/alpha/beta/tc0 purely from coding metadata (the
data-parallel half of the loop filter); apply_maps_np applies them in exact
spec MB order.  The chain maps+apply must reproduce deblock_frame bit-exactly
on random frames and random syntax, which validates both the map math and
the map-driven edge ordering that the Pallas kernel mirrors.
"""

import numpy as np
import pytest

from x264vfw_tpu.ops import deblock as dbj
from x264vfw_tpu.ops.deblock_np import deblock_frame


class _PPS:
    chroma_qp_index_offset = 0


class _H:
    slice_alpha_c0_offset_div2 = 0
    slice_beta_offset_div2 = 0


class _SD:
    pass


def make_case(mbh, mbw, seed, all_intra=False, offA=0, offB=0, qpoff=0):
    r = np.random.default_rng(seed)
    sd = _SD()
    sd.mbh, sd.mbw = mbh, mbw
    H, W = mbh * 16, mbw * 16
    sd.y = r.integers(0, 256, (H, W)).astype(np.int32)
    sd.u = r.integers(0, 256, (H // 2, W // 2)).astype(np.int32)
    sd.v = r.integers(0, 256, (H // 2, W // 2)).astype(np.int32)
    if all_intra:
        sd.mb_type = np.zeros((mbh, mbw), np.int32)      # intra (<100)
    else:
        sd.mb_type = np.where(r.random((mbh, mbw)) < 0.2, 1, 100 + 0)
        sd.mb_type = sd.mb_type.astype(np.int32)
    sd.tc_luma = r.integers(0, 3, (4 * mbh, 4 * mbw)).astype(np.int32)
    sd.mv = r.integers(-9, 10, (4 * mbh, 4 * mbw, 2)).astype(np.int32)
    sd.ref = r.integers(0, 2, (4 * mbh, 4 * mbw)).astype(np.int32)
    sd.qp_map = r.integers(18, 42, (mbh, mbw)).astype(np.int32)
    h = _H()
    h.slice_alpha_c0_offset_div2 = offA
    h.slice_beta_offset_div2 = offB
    sd.h = h
    pps = _PPS()
    pps.chroma_qp_index_offset = qpoff
    sd.pps = pps
    return sd


@pytest.mark.parametrize("mbh,mbw,seed,kw", [
    (4, 5, 0, {}),
    (3, 3, 1, {"all_intra": True}),
    (4, 4, 2, {"offA": -2, "offB": 1}),
    (2, 6, 3, {"qpoff": 3}),
])
def test_maps_match_spec_order_golden(mbh, mbw, seed, kw):
    sd = make_case(mbh, mbw, seed, **kw)
    y2, u2, v2 = sd.y.copy(), sd.u.copy(), sd.v.copy()

    intra = (sd.mb_type >= 0) & (sd.mb_type < 100)
    maps = dbj.build_maps(
        intra, sd.tc_luma, sd.mv, sd.ref, sd.qp_map,
        sd.h.slice_alpha_c0_offset_div2 * 2,
        sd.h.slice_beta_offset_div2 * 2,
        sd.pps.chroma_qp_index_offset)
    maps = [np.asarray(m) for m in maps]
    dbj.apply_maps_np(y2, u2, v2, *maps)

    deblock_frame(sd)
    np.testing.assert_array_equal(y2, sd.y)
    np.testing.assert_array_equal(u2, sd.u)
    np.testing.assert_array_equal(v2, sd.v)
