"""CAVLC table calibration against stock FFmpeg via crafted bitstreams.

Each test crafts a minimal conformant stream exercising specific VLC table
entries, then requires our native decoder and FFmpeg to produce identical
pixels.  This validates every coeff_token context, total_zeros row,
run_before row, and the level escape paths in BOTH code directions
(we write the codes, FFmpeg reads them; our decoder reads them back).
"""

import numpy as np
import pytest

import oracle
from x264vfw_tpu.bitstream.cavlc import encode_residual_block
from x264vfw_tpu.bitstream.mb_syntax import SLICE_I, i16x16_mb_type
from x264vfw_tpu.bitstream.nal import NAL_PPS, NAL_SLICE_IDR, NAL_SPS, wrap_nal
from x264vfw_tpu.bitstream.params import PPS, SPS, PROFILE_BASELINE
from x264vfw_tpu.bitstream.slice import SliceHeader
from x264vfw_tpu.decode.decoder import H264Decoder
from x264vfw_tpu.utils.bitstream import BitWriter


def _headers(qp):
    sps = SPS(profile_idc=PROFILE_BASELINE, constraint_set0=1, constraint_set1=1,
              level_idc=30, log2_max_frame_num_minus4=4, pic_order_cnt_type=2,
              max_num_ref_frames=1, pic_width_in_mbs_minus1=0,
              pic_height_in_map_units_minus1=0)
    pps = PPS(pic_init_qp_minus26=qp - 26)
    return sps, pps


def craft_mb(qp=30, luma_dc=None, chroma_dc=None, chroma_ac=None):
    """One-MB I16x16 stream with direct control of residual level arrays.

    luma_dc: 16 zigzag levels | chroma_dc: 2x(4 levels) | chroma_ac: 2x4x(15)
    """
    sps, pps = _headers(qp)
    w = BitWriter()
    h = SliceHeader(slice_type=SLICE_I + 5, disable_deblocking_filter_idc=1)
    h.write(w, sps, pps, NAL_SLICE_IDR, 3)
    if chroma_ac is not None:
        cbp_chroma = 2
    elif chroma_dc is not None:
        cbp_chroma = 1
    else:
        cbp_chroma = 0
    w.ue(i16x16_mb_type(2, cbp_chroma, False))
    w.ue(0)  # chroma DC pred mode
    w.se(0)  # qp delta
    if luma_dc is None:
        luma_dc = np.zeros(16, np.int32)
    encode_residual_block(w, np.asarray(luma_dc, np.int32), 0, 16)
    if cbp_chroma:
        if chroma_dc is None:
            chroma_dc = [np.zeros(4, np.int32)] * 2
        for c in range(2):
            encode_residual_block(w, np.asarray(chroma_dc[c], np.int32), -1, 4)
    if cbp_chroma == 2:
        tc = np.zeros((2, 2, 2), np.int32)  # per (c, sby, sbx)
        for c in range(2):
            for sb in range(4):
                sbx, sby = sb & 1, sb >> 1
                # nC context from already-coded blocks of this MB
                nA = tc[c, sby, sbx - 1] if sbx > 0 else None
                nB = tc[c, sby - 1, sbx] if sby > 0 else None
                if nA is not None and nB is not None:
                    nc = (int(nA) + int(nB) + 1) >> 1
                elif nA is not None:
                    nc = int(nA)
                elif nB is not None:
                    nc = int(nB)
                else:
                    nc = 0
                lv = np.asarray(chroma_ac[c][sb], np.int32)
                encode_residual_block(w, lv, nc, 15)
                tc[c, sby, sbx] = int(np.count_nonzero(lv))
    w.rbsp_trailing_bits()
    return (wrap_nal(3, NAL_SPS, sps.to_rbsp()) + wrap_nal(3, NAL_PPS, pps.to_rbsp())
            + wrap_nal(3, NAL_SLICE_IDR, w.to_rbsp()))


def assert_conformant(bs, label=""):
    dec = H264Decoder()
    f = dec.decode(bs)[0]
    ref = oracle.decode_h264_planes(bs)
    assert ref is not None, f"FFmpeg failed to decode: {label}"
    fy, fu, fv = ref
    np.testing.assert_array_equal(fy[0], f.y.astype(np.uint8), err_msg=f"{label} y")
    np.testing.assert_array_equal(fu[0], f.u.astype(np.uint8), err_msg=f"{label} u")
    np.testing.assert_array_equal(fv[0], f.v.astype(np.uint8), err_msg=f"{label} v")


def make_pattern(tc, t1, tz, n=16, mag=2):
    """Zigzag level array with tc coeffs, t1 trailing ones, tz total_zeros."""
    assert tc + tz <= n
    lv = np.zeros(n, np.int32)
    seq = [(-1) ** i * (mag + (i % 3)) for i in range(tc - t1)] + \
          [(-1) ** i for i in range(t1)]
    if tz == 0:
        pos = list(range(tc))
    else:
        pos = list(range(tc - 1)) + [tc - 1 + tz]
        if tc == 1:
            pos = [tz]
    for p, v in zip(pos, seq):
        lv[p] = v
    return lv


def test_ctx0_all_coeff_tokens():
    """coeff_token ctx 0 (nC<2) + total_zeros rows via the luma DC block."""
    bad = []
    for tc in range(0, 17):
        for t1 in range(0, min(3, tc) + 1):
            for tz in {0, min(2, 16 - tc), 16 - tc}:
                lv = make_pattern(tc, t1, tz)
                try:
                    assert_conformant(craft_mb(luma_dc=lv), f"ctx0 tc={tc} t1={t1} tz={tz}")
                except AssertionError as e:
                    bad.append((tc, t1, tz))
    assert not bad, bad


@pytest.mark.parametrize("nc_left", [2, 3, 4, 5, 6, 7, 8, 10, 15])
def test_ctx123_coeff_tokens_via_chroma_nc(nc_left):
    """coeff_token ctx 1/2/FLC: chroma AC sb1 sees nC = tc(sb0)."""
    bad = []
    for tc in range(0, 16):
        for t1 in range(0, min(3, tc) + 1):
            sb0 = make_pattern(nc_left, min(3, nc_left), 0, n=15)
            sb1 = make_pattern(tc, t1, min(2, 15 - tc), n=15)
            ac = [[sb0, sb1, np.zeros(15, np.int32), np.zeros(15, np.int32)],
                  [np.zeros(15, np.int32)] * 4]
            try:
                assert_conformant(craft_mb(chroma_ac=ac),
                                  f"nc={nc_left} tc={tc} t1={t1}")
            except AssertionError:
                bad.append((nc_left, tc, t1))
    assert not bad, bad


def test_chroma_dc_ctx_and_total_zeros():
    bad = []
    for tc in range(0, 5):
        for t1 in range(0, min(3, tc) + 1):
            for tz in range(0, 4 - tc + 1):
                lv = make_pattern(tc, t1, tz, n=4)
                cdc = [lv, make_pattern(min(tc + 1, 4), 0, 0, n=4)]
                try:
                    assert_conformant(craft_mb(chroma_dc=cdc),
                                      f"cdc tc={tc} t1={t1} tz={tz}")
                except AssertionError:
                    bad.append((tc, t1, tz))
    assert not bad, bad


def test_total_zeros_all_values():
    """every (tc, total_zeros) pair for the 16-coeff table."""
    bad = []
    for tc in range(1, 16):
        for tz in range(0, 16 - tc + 1):
            lv = make_pattern(tc, min(3, tc), tz)
            try:
                assert_conformant(craft_mb(luma_dc=lv), f"tz tc={tc} tz={tz}")
            except AssertionError:
                bad.append((tc, tz))
    assert not bad, bad


def test_run_before_patterns():
    """exercise run_before rows incl. zeros_left > 6 and long runs."""
    rng = np.random.default_rng(5)
    bad = []
    for trial in range(120):
        tc = int(rng.integers(2, 9))
        lv = np.zeros(16, np.int32)
        pos = sorted(rng.choice(16, size=tc, replace=False).tolist())
        for i, p in enumerate(pos):
            lv[p] = int(rng.choice([-3, -2, -1, 1, 2, 3]))
        try:
            assert_conformant(craft_mb(luma_dc=lv), f"run {trial}")
        except AssertionError:
            bad.append(lv.tolist())
    assert not bad, bad


def test_level_magnitudes_and_escapes():
    """suffixLength adaptation + level_prefix escape paths (prefix 14/15/16)."""
    bad = []
    cases = [
        [7, 0, 0, 0], [15, 0, 0, 0], [16, 0, 0, 0], [30, 0, 0, 0],
        [31, 0, 0, 0], [100, 0, 0, 0], [500, 0, 0, 0], [2047, 0, 0, 0],
        [2064, 0, 0, 0], [4000, 0, 0, 0],
        [-7, 0, 0, 0], [-16, 0, 0, 0], [-2048, 0, 0, 0],
        [3, 7, 15, 31], [50, 40, 30, 20], [2000, 1000, 500, 250],
        [1, 2, 4, 8], [8, 4, 2, 1], [-1, 2, -4, 8],
    ]
    for c in cases:
        lv = np.zeros(16, np.int32)
        lv[:len(c)] = c
        try:
            assert_conformant(craft_mb(luma_dc=lv), f"level {c}")
        except AssertionError:
            bad.append(c)
    assert not bad, bad


def test_suffix_length_init_tc_gt_10():
    """tc > 10 with t1 < 3 initializes suffixLength = 1."""
    for t1 in (0, 1, 2):
        lv = make_pattern(12, t1, 2)
        assert_conformant(craft_mb(luma_dc=lv), f"sl-init t1={t1}")
