"""Device decode fast path (decode/device_decode.py): native C entropy
parse + one-dispatch TPU reconstruction must be bit-exact vs the host
decoder (itself pinned to stock FFmpeg in test_decoder_vs_ffmpeg.py).

Covers the decode-hot-path role of the reference (codec.c:2154-2296,
delegated there to FFmpeg) over both our encoder's streams and real
libx264 streams, plus the per-slice fallback on unsupported syntax.
"""

import numpy as np
import pytest

import oracle
from x264vfw_tpu.decode.decoder import H264Decoder
from x264vfw_tpu.encode.ref_encoder import EncoderConfig
from x264vfw_tpu.encode.tpu_encoder import TpuEncoder


def _clip(w, h, n, seed=7):
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (60 + 80 * np.sin((xx + 2 * yy) / 23.0)
            + 50 * ((xx // 20 + yy // 14) % 2)
            + r.integers(-14, 15, (h, w)))
    fs = []
    for i in range(n):
        y = np.clip(np.roll(base, (i, -2 * i), (0, 1)), 0, 255).astype(np.uint8)
        u = np.clip(120 + 30 * np.sin(xx[::2, ::2] / 31.0 + i),
                    0, 255).astype(np.uint8)
        v = np.clip(128 + 24 * np.cos(yy[::2, ::2] / 27.0 - i),
                    0, 255).astype(np.uint8)
        fs.append((y, u, v))
    return fs


def _encode(w, h, n, **kw):
    enc = TpuEncoder(EncoderConfig(width=w, height=h, **kw))
    bs = enc.headers()
    for (y, u, v) in _clip(w, h, n):
        bs += enc.encode_frame(y, u, v)
    bs += b"".join(enc.flush())
    return bs


def _assert_match(bs, label, expect_fast=True):
    gold = H264Decoder().decode(bs)
    dec = H264Decoder(use_device=True)
    fast = dec.decode(bs)
    assert len(gold) == len(fast), label
    for i, (g, f) in enumerate(zip(gold, fast)):
        for pl in "yuv":
            np.testing.assert_array_equal(
                getattr(g, pl), getattr(f, pl),
                err_msg=f"{label} frame {i} plane {pl}")


def test_full_feature_stream():
    """I4x4 + partitions + multi-ref + AQ + deblock, several GOPs."""
    bs = _encode(96, 64, 6, qp=28, keyint=3, i4x4=True, partitions=True,
                 aq_strength=1.0, deblock=True, num_ref_frames=2)
    _assert_match(bs, "full-feature")


def test_i16_only_high_qp():
    bs = _encode(64, 64, 2, qp=40, keyint=1)
    _assert_match(bs, "i16 qp40")


def test_no_deblock_skip_runs():
    """Low-motion clip at high QP: long P_Skip runs, deblock off."""
    enc = TpuEncoder(EncoderConfig(width=80, height=48, qp=44, keyint=50))
    fs = _clip(80, 48, 4, seed=3)
    bs = enc.headers()
    for (y, u, v) in fs:
        bs += enc.encode_frame(y, u, v)
    _assert_match(bs, "skip runs")


def test_x264_cavlc_stream():
    """Real libx264 CAVLC stream (all P partition shapes + sub-8x8)."""
    clip = oracle.make_test_clip(96, 64, 5, seed=4)
    bs = oracle.encode_x264(
        clip, 5, 96, 64, qp=30, preset="medium",
        x264opts="no-cabac=1:bframes=0:weightp=0:8x8dct=0:threads=1:"
                 "slices=1:interlaced=0:log-level=none")
    ref = oracle.decode_h264_planes(bs)
    assert ref is not None
    ry, ru, rv = ref
    dec = H264Decoder(use_device=True)
    frames = dec.decode(bs)
    assert len(frames) == ry.shape[0]
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(
            np.asarray(f.y, np.uint8), ry[i], err_msg=f"x264 frame {i} y")
        np.testing.assert_array_equal(
            np.asarray(f.u, np.uint8), ru[i], err_msg=f"x264 frame {i} u")
        np.testing.assert_array_equal(
            np.asarray(f.v, np.uint8), rv[i], err_msg=f"x264 frame {i} v")


def test_x264_multiref_stream():
    clip = oracle.make_test_clip(64, 64, 5, seed=5)
    bs = oracle.encode_x264(
        clip, 5, 64, 64, qp=26, preset="medium",
        x264opts="no-cabac=1:bframes=0:ref=3:weightp=0:8x8dct=0:threads=1:"
                 "log-level=none")
    ref = oracle.decode_h264_planes(bs)
    ry, ru, rv = ref
    frames = H264Decoder(use_device=True).decode(bs)
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(np.asarray(f.y, np.uint8), ry[i])
        np.testing.assert_array_equal(np.asarray(f.u, np.uint8), ru[i])
        np.testing.assert_array_equal(np.asarray(f.v, np.uint8), rv[i])


def test_fallback_on_cabac():
    """CABAC streams bypass the fast path but still decode correctly."""
    bs = _encode(64, 64, 3, qp=30, keyint=2, cabac=True, deblock=True)
    _assert_match(bs, "cabac fallback", expect_fast=False)


def test_fallback_on_bframes():
    """B slices fall back per-slice; P/I around them may use the device."""
    bs = _encode(64, 64, 5, qp=30, keyint=10, bframes=1)
    _assert_match(bs, "bframe fallback")


def test_device_frames_feed_b_direct():
    """Fast-decoded P frames must carry the colocated motion a later
    B_Direct host decode reads (Frame.mvs/refs/mb_types)."""
    bs = _encode(64, 64, 6, qp=32, keyint=20, bframes=2, deblock=True)
    _assert_match(bs, "b-direct colocated")
