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


# ------------------------- round-4 conformance breadth -------------------
# weighted prediction, ref list modification, multi-slice, temporal direct,
# B_8x8 sub-partitions, implicit weighted bipred, I_PCM (decoder.py scope
# fences removed; reference capability = FFmpeg's decoder, codec.c:2000)

def make_fade_clip(w, h, n, seed=0):
    """Fading clip (triggers x264 weightp=2 explicit weights + the
    duplicate-reference list modification it emits)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 96 + 64 * np.sin(xx / 13.0) + 32 * np.cos(yy / 9.0)
    tex = rng.integers(-8, 9, size=(h, w))
    frames = []
    for f in range(n):
        g = 1.0 - 0.09 * f
        y = np.clip((base + np.roll(tex, f, axis=1)) * g, 0, 255)
        u = np.clip(128 + 24 * np.sin(xx[::2, ::2] / 17.0) * g, 0, 255)
        v = np.clip(128 + 24 * np.cos(yy[::2, ::2] / 19.0) * g, 0, 255)
        frames.append(np.concatenate(
            [y.ravel(), u.ravel(), v.ravel()]).astype(np.uint8))
    return np.stack(frames)


def test_weightp_explicit_fade():
    """x264 weightp=2 on a fade: explicit luma+chroma L0 weights and the
    reference duplication via ref_pic_list_modification."""
    clip = make_fade_clip(96, 80, 8)
    bs = oracle.encode_x264(clip, 8, 96, 80, qp=26, preset="medium",
                            x264opts="no-cabac=1:bframes=0:8x8dct=0:"
                            "weightp=2:ref=2:keyint=30:scenecut=0:"
                            "no-mbtree=1:rc-lookahead=0:log-level=none")
    check_match(bs, "weightp fade")


def test_weightp_explicit_fade_cabac():
    clip = make_fade_clip(96, 80, 8, seed=2)
    bs = oracle.encode_x264(clip, 8, 96, 80, qp=26, preset="medium",
                            x264opts="bframes=0:8x8dct=0:partitions=none:"
                            "weightp=2:ref=2:keyint=30:scenecut=0:"
                            "no-mbtree=1:rc-lookahead=0:log-level=none")
    check_match(bs, "weightp fade cabac")


@pytest.mark.parametrize("nslices", [2, 4])
def test_multi_slice_cavlc(nslices):
    opts = (f"slices={nslices}:no-cabac=1:bframes=0:8x8dct=0:"
            "partitions=p8x8,i4x4:keyint=30:scenecut=0:no-mbtree=1:"
            "rc-lookahead=0:subme=3")
    _, bs = x264_stream(96, 96, 5, 26, opts, preset="medium", seed=11)
    check_match(bs, f"slices={nslices}")


def test_multi_slice_cabac():
    opts = ("slices=3:bframes=0:8x8dct=0:partitions=none:keyint=30:"
            "scenecut=0:no-mbtree=1:rc-lookahead=0:subme=2")
    _, bs = x264_stream(96, 96, 5, 26, opts, preset="medium", seed=12)
    check_match(bs, "slices cabac")


def test_b_temporal_direct():
    """direct=temporal: POC-scaled colocated motion (§8.4.1.2.3)."""
    _, bs = x264_stream(96, 80, 10, 26,
                        B_BASE.replace("direct=spatial", "direct=temporal")
                        + ":subme=2", preset="medium", seed=13)
    check_match_display(bs, "temporal direct")


def test_b_temporal_direct_cabac():
    _, bs = x264_stream(96, 80, 10, 28,
                        B_BASE.replace("direct=spatial", "direct=temporal")
                        .replace("cabac=0", "cabac=1") + ":subme=2",
                        preset="medium", seed=14)
    check_match_display(bs, "temporal direct cabac")


def test_b8x8_subpartitions():
    """B_8x8 with direct/L0/L1/Bi 8x8 subs (Table 7-18)."""
    _, bs = x264_stream(96, 80, 10, 26,
                        B_BASE.replace("partitions=none", "partitions=b8x8")
                        + ":subme=4", preset="medium", seed=15)
    check_match_display(bs, "B_8x8")


def test_weightb_implicit():
    """weightb: implicit bi-prediction weights from POC distances
    (§8.4.2.3.1, weighted_bipred_idc == 2)."""
    _, bs = x264_stream(96, 80, 10, 26,
                        B_BASE.replace("weightb=0", "weightb=1") + ":subme=2",
                        preset="medium", seed=16)
    check_match_display(bs, "implicit weightb")


def test_i_pcm():
    """qp 0 noise content forces I_PCM macroblocks."""
    rng = np.random.default_rng(17)
    n, w, h = 2, 64, 64
    clip = rng.integers(0, 256, size=(n, w * h * 3 // 2)).astype(np.uint8)
    bs = oracle.encode_x264(clip, n, w, h, qp=0, preset="medium",
                            x264opts="no-cabac=1:bframes=0:8x8dct=0:"
                            "partitions=i4x4:keyint=1:no-mbtree=1:"
                            "rc-lookahead=0:log-level=none")
    check_match(bs, "I_PCM")


def test_medium_cavlc_full_features():
    """x264 medium minus CABAC/8x8dct: B-adapt, weightp/weightb, b8x8,
    mbtree — the broad-composition stream."""
    _, bs = x264_stream(112, 96, 16, 28, "no-cabac=1:8x8dct=0",
                        preset="medium", seed=18)
    check_match_display(bs, "medium cavlc full")


def test_cabac_b_16x8_partitions():
    _, bs = x264_stream(96, 80, 10, 26,
                        B_BASE.replace("cabac=0", "cabac=1")
                        .replace("partitions=none", "partitions=p8x8")
                        + ":subme=4", preset="medium", seed=19)
    check_match_display(bs, "cabac 16x8")


def test_cabac_b8x8_subpartitions():
    _, bs = x264_stream(96, 80, 10, 26,
                        B_BASE.replace("cabac=0", "cabac=1")
                        .replace("partitions=none", "partitions=b8x8")
                        + ":subme=4", preset="medium", seed=20)
    check_match_display(bs, "cabac B_8x8")


def test_cabac_b_multiref():
    _, bs = x264_stream(96, 80, 10, 26,
                        B_BASE.replace("cabac=0", "cabac=1")
                        .replace("ref=1", "ref=3") + ":subme=3",
                        preset="medium", seed=21)
    check_match_display(bs, "cabac B multiref")


def test_medium_cabac_full_features():
    """x264 medium minus 8x8dct: CABAC + B-adapt + weightp/weightb + b8x8
    + ref 3 + mbtree — the broad CABAC composition stream."""
    _, bs = x264_stream(112, 96, 16, 28, "8x8dct=0", preset="medium",
                        seed=22)
    check_match_display(bs, "medium cabac full")


# ----------------------- High profile: 8x8 transform ---------------------
# decoder-side §8.3.2 (Intra_8x8 + reference filtering), §8.5.12.3/8.5.13
# (8x8 IDCT + dequant), CAVLC interleaved 8x8 residual (§7.4.5.3.3) and
# CABAC cat-5 residual with Table 9-43 maps

def test_high_i8x8_cavlc():
    opts = ("no-cabac=1:bframes=0:weightp=0:8x8dct=1:partitions=i8x8,i4x4:"
            "keyint=1:no-mbtree=1:rc-lookahead=0")
    for qp in (14, 26, 40):
        _, bs = x264_stream(96, 96, 2, qp, opts, seed=31)
        check_match(bs, f"high i8x8 cavlc qp{qp}")


def test_high_p_8x8dct_cavlc():
    opts = ("no-cabac=1:bframes=0:weightp=0:8x8dct=1:"
            "partitions=p8x8,i8x8,i4x4:ref=2:keyint=30:scenecut=0:"
            "no-mbtree=1:rc-lookahead=0:subme=3")
    _, bs = x264_stream(96, 96, 6, 26, opts, seed=31)
    check_match(bs, "high P 8x8dct cavlc")


def test_high_i8x8_cabac():
    opts = ("bframes=0:weightp=0:8x8dct=1:partitions=i8x8,i4x4:keyint=1:"
            "no-mbtree=1:rc-lookahead=0")
    for qp in (14, 30, 44):
        _, bs = x264_stream(96, 96, 2, qp, opts, seed=31)
        check_match(bs, f"high i8x8 cabac qp{qp}")


def test_high_p_sub8x8_cabac():
    """CABAC P sub-partitions below 8x8 (p4x4): 4x4-granular mvd ctx."""
    opts = ("bframes=0:weightp=0:8x8dct=0:partitions=p8x8,p4x4,i4x4:"
            "keyint=30:scenecut=0:no-mbtree=1:rc-lookahead=0:subme=4")
    _, bs = x264_stream(96, 96, 6, 30, opts, seed=33)
    check_match(bs, "cabac p4x4 subs")


def test_stock_medium():
    """THE capability bar (round-3 verdict item 5): a stock
    `x264 --preset medium` stream with NO option restrictions decodes
    bit-exactly vs FFmpeg (High profile: CABAC + 8x8dct + B-adapt +
    weightp/weightb + ref 3 + mbtree + deblock)."""
    _, bs = x264_stream(112, 96, 16, 28, "", preset="medium", seed=22)
    check_match_display(bs, "stock medium")


def test_stock_medium_crf_odd_geometry():
    """Stock medium at an odd (cropped) geometry, second content seed."""
    clip = oracle.make_test_clip(148, 84, 10, seed=9)
    bs = oracle.encode_x264(clip, 10, 148, 84, qp=-1, crf=26.0,
                            preset="medium", x264opts="log-level=none")
    check_match_display(bs, "stock medium crf 148x84")


def test_stock_fast_preset():
    _, bs = x264_stream(96, 96, 10, 26, "", preset="fast", seed=13)
    check_match_display(bs, "stock fast")
