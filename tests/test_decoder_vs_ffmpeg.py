"""Conformance: native decoder must match stock FFmpeg bit-exactly on real
x264-produced streams. This validates the CAVLC tables, intra prediction,
MC, and deblocking end to end against independent implementations."""

import numpy as np
import pytest

import oracle
from x264vfw_tpu.decode.decoder import H264Decoder


def x264_stream(w, h, n, qp, x264opts, preset="ultrafast", seed=0):
    clip = oracle.make_test_clip(w, h, n, seed=seed)
    bs = oracle.encode_x264(clip, n, w, h, qp=qp, preset=preset,
                            x264opts=x264opts + ":log-level=none" if x264opts else "log-level=none")
    return clip, bs


def check_match(bs, label=""):
    ref = oracle.decode_h264_planes(bs)
    assert ref is not None, f"oracle failed to decode {label}"
    ry, ru, rv = ref
    dec = H264Decoder()
    frames = dec.decode(bs)
    assert len(frames) == ry.shape[0], (label, len(frames), ry.shape[0])
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(
            np.asarray(f.y, dtype=np.uint8), ry[i], err_msg=f"{label} frame {i} luma")
        np.testing.assert_array_equal(
            np.asarray(f.u, dtype=np.uint8), ru[i], err_msg=f"{label} frame {i} cb")
        np.testing.assert_array_equal(
            np.asarray(f.v, dtype=np.uint8), rv[i], err_msg=f"{label} frame {i} cr")


BASE = "partitions=none:no-deblock=1:keyint=1:min-keyint=1:ref=1:bframes=0:weightp=0:8x8dct=0:no-mbtree=1:rc-lookahead=0:scenecut=0"


@pytest.mark.parametrize("qp", [10, 26, 40, 51])
def test_i16x16_only_nodeblock(qp):
    _, bs = x264_stream(64, 64, 2, qp, BASE)
    check_match(bs, f"i16x16 qp{qp}")


def test_i16x16_larger_frame():
    _, bs = x264_stream(128, 96, 2, 26, BASE, seed=3)
    check_match(bs, "i16 128x96")


@pytest.mark.parametrize("qp", [10, 26, 40])
def test_i4x4_nodeblock(qp):
    opts = BASE.replace("partitions=none", "partitions=i4x4")
    _, bs = x264_stream(64, 64, 2, qp, opts, seed=1)
    check_match(bs, f"i4x4 qp{qp}")


@pytest.mark.parametrize("qp", [18, 30])
def test_intra_with_deblock(qp):
    opts = BASE.replace(":no-deblock=1", "")
    opts = opts.replace("partitions=none", "partitions=i4x4")
    _, bs = x264_stream(64, 64, 2, qp, opts, seed=2)
    check_match(bs, f"intra deblock qp{qp}")


@pytest.mark.parametrize("qp", [16, 26, 38])
def test_p_frames_nodeblock(qp):
    opts = "partitions=none:no-deblock=1:keyint=30:ref=1:bframes=0:weightp=0:8x8dct=0:no-mbtree=1:rc-lookahead=0:scenecut=0:subme=1:me=dia"
    _, bs = x264_stream(64, 64, 5, qp, opts, seed=4)
    check_match(bs, f"P qp{qp}")


def test_p_frames_with_partitions_and_deblock():
    opts = "partitions=p8x8,i4x4:keyint=30:ref=1:bframes=0:weightp=0:8x8dct=0:no-mbtree=1:rc-lookahead=0:scenecut=0:subme=3:me=hex"
    _, bs = x264_stream(96, 80, 6, 26, opts, seed=5)
    check_match(bs, "P partitions deblock")


def test_p_frames_multiref():
    opts = "partitions=none:no-deblock=1:keyint=30:ref=3:bframes=0:weightp=0:8x8dct=0:no-mbtree=1:rc-lookahead=0:scenecut=0:subme=2"
    _, bs = x264_stream(64, 64, 6, 26, opts, seed=6)
    check_match(bs, "P multiref")


def test_medium_preset_cavlc_no_b():
    opts = "no-cabac=1:bframes=0:weightp=0:8x8dct=0:keyint=30:no-mbtree=1:rc-lookahead=0:scenecut=0"
    _, bs = x264_stream(96, 96, 6, 28, opts, preset="medium", seed=7)
    check_match(bs, "medium cavlc")


def check_match_display(bs, label=""):
    """Like check_match but in display order (B-frame reordering)."""
    ref = oracle.decode_h264_planes(bs)
    assert ref is not None, f"oracle failed to decode {label}"
    ry, ru, rv = ref
    dec = H264Decoder()
    dec.decode(bs)
    frames = dec.display_order()
    assert len(frames) == ry.shape[0], (label, len(frames), ry.shape[0])
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(
            np.asarray(f.y, dtype=np.uint8), ry[i], err_msg=f"{label} frame {i} luma")
        np.testing.assert_array_equal(
            np.asarray(f.u, dtype=np.uint8), ru[i], err_msg=f"{label} frame {i} cb")
        np.testing.assert_array_equal(
            np.asarray(f.v, dtype=np.uint8), rv[i], err_msg=f"{label} frame {i} cr")


B_BASE = ("bframes=2:b-adapt=0:b-pyramid=none:cabac=0:ref=1:weightp=0:"
          "weightb=0:8x8dct=0:partitions=none:keyint=30:scenecut=0:"
          "threads=1:direct=spatial:no-mbtree=1:rc-lookahead=0")


@pytest.mark.parametrize("qp", [22, 30])
def test_b_frames_spatial_direct(qp):
    """Real x264 B stream: direct/skip/L0/L1/Bi 16x16 + I4x4-in-P,
    deblocking ON (per-list bs rules)."""
    _, bs = x264_stream(96, 80, 10, qp, B_BASE + ":subme=1", preset="medium")
    check_match_display(bs, f"bframes qp{qp}")


def test_b_frames_16x8_partitions():
    """B_L0_L0_16x8-family two-partition types + subpel."""
    _, bs = x264_stream(96, 80, 10, 26,
                        B_BASE.replace("partitions=none", "partitions=p8x8")
                        + ":subme=4", preset="medium", seed=5)
    check_match_display(bs, "bframes 16x8")


def test_b_frames_bframes1_nodeblock():
    _, bs = x264_stream(64, 64, 8, 28, B_BASE + ":no-deblock=1:subme=0")
    check_match_display(bs, "bframes=1 nodeblock")


@pytest.mark.parametrize("qp", [22, 30])
def test_cabac_b_frames_spatial_direct(qp):
    """Real x264 CABAC B stream (16x16 modes, direct/skip, deblock on)."""
    _, bs = x264_stream(96, 80, 10, qp,
                        B_BASE.replace("cabac=0", "cabac=1") + ":subme=1",
                        preset="medium")
    check_match_display(bs, f"cabac bframes qp{qp}")
