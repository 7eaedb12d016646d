"""DecompressSession output conversion + input framing.

The reference's decompress side converts decoded frames to the app's
requested format via swscale (codec.c:2075-2152) and accepts avcC
extradata with length-prefixed sample data (codec.c:2032-2044,
2190-2221).  These tests pin the session-layer equivalents: every output
format must match the direct ops/csp conversion of the I420 decode, and
the avcC/length-prefixed framing must reproduce the Annex-B decode
bit-exactly.
"""

from __future__ import annotations

import numpy as np
import pytest

from x264vfw_tpu.api import DecompressSession
from x264vfw_tpu.bitstream.avcc import build_avcc, parse_avcc
from x264vfw_tpu.bitstream.nal import iter_annexb_raw
from x264vfw_tpu.encode.ref_encoder import EncoderConfig
from x264vfw_tpu.encode.tpu_encoder import TpuEncoder

W, H, N = 96, 64, 3


def _clip():
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:H, 0:W]
    base = 64 + 64 * np.sin(xx / 9.0) + 48 * np.cos(yy / 7.0)
    tex = rng.integers(-18, 19, (H, W))
    out = []
    for k in range(N):
        y = np.clip(base + np.roll(tex, 2 * k, axis=1), 0, 255).astype(np.uint8)
        u = np.clip(128 + 20 * np.sin((xx[::2, ::2] + k) / 5.0), 0,
                    255).astype(np.uint8)
        v = np.clip(128 + 20 * np.cos((yy[::2, ::2] - k) / 6.0), 0,
                    255).astype(np.uint8)
        out.append((y, u, v))
    return out


@pytest.fixture(scope="module")
def stream():
    cfg = EncoderConfig(width=W, height=H, qp=24, keyint=12, search_range=4)
    enc = TpuEncoder(cfg)
    aus = [enc.encode_frame(*f) for f in _clip()]
    sps = b"\x67" + _ebsp(enc.sps.to_rbsp())
    pps = b"\x68" + _ebsp(enc.pps.to_rbsp())
    return sps, pps, aus


def _ebsp(rbsp):
    from x264vfw_tpu.utils.bitstream import escape_ebsp
    return escape_ebsp(rbsp)


def _decode_all(sess, headers, aus):
    frames = []
    for k, au in enumerate(aus):
        data = (headers + au) if k == 0 else au
        f = sess.decompress(data)
        if f is not None:
            frames.append(f)
    while True:
        f = sess.decompress(b"")
        if f is None or len(frames) >= len(aus):
            break
        frames.append(f)
    return frames


def test_avcc_roundtrip(stream):
    sps, pps, _ = stream
    rec = build_avcc(sps, pps)
    sps_l, pps_l, nls = parse_avcc(rec)
    assert sps_l == [sps] and pps_l == [pps] and nls == 4


def test_length_prefixed_matches_annexb(stream):
    sps, pps, aus = stream
    s1 = DecompressSession(use_device=False)
    s1.begin(W, H)
    ref = _decode_all(s1, b"\x00\x00\x00\x01" + sps
                      + b"\x00\x00\x00\x01" + pps,
                      [b"\x00\x00\x00\x01" + _strip(a) for a in aus])
    s2 = DecompressSession(use_device=False)
    s2.begin(W, H, extradata=build_avcc(sps, pps))
    pref = []
    for a in aus:
        raw = _strip(a)
        pref.append(len(raw).to_bytes(4, "big") + raw)
    got = _decode_all(s2, b"", pref)
    assert len(ref) == len(got) == len(aus)
    for (ry, ru, rv), (gy, gu, gv) in zip(ref, got):
        assert np.array_equal(ry, gy)
        assert np.array_equal(ru, gu)
        assert np.array_equal(rv, gv)


def _strip(au: bytes) -> bytes:
    """First VCL NAL of an Annex-B AU (these tests emit single-slice AUs)."""
    for nal in iter_annexb_raw(au):
        if (nal[0] & 0x1F) in (1, 5):
            return nal
    raise AssertionError("no VCL NAL")


@pytest.mark.parametrize("fmt", ["yv12", "nv12", "nv21", "rgb24", "bgr24"])
def test_output_formats_match_csp(stream, fmt):
    sps, pps, aus = stream
    hdr = (b"\x00\x00\x00\x01" + sps + b"\x00\x00\x00\x01" + pps)
    base = DecompressSession(use_device=False)
    base.begin(W, H)
    ref = _decode_all(base, hdr, aus)

    sess = DecompressSession(use_device=False)
    sess.begin(W, H, fmt=fmt)
    got = _decode_all(sess, hdr, aus)
    assert len(got) == len(ref)

    from x264vfw_tpu.ops import csp
    for (y, u, v), g in zip(ref, got):
        if fmt == "yv12":
            assert np.array_equal(g[0], y)
            assert np.array_equal(g[1], v)
            assert np.array_equal(g[2], u)
        elif fmt in ("nv12", "nv21"):
            a, b = (u, v) if fmt == "nv12" else (v, u)
            yy, uv = csp.i420_to_nv12(y, a, b)
            assert np.array_equal(g[0], np.asarray(yy, np.uint8))
            assert np.array_equal(g[1], np.asarray(uv, np.uint8))
        else:
            rgb = np.asarray(csp.i420_to_rgb(y, u, v, matrix="bt601"),
                             np.uint8)
            if fmt == "bgr24":
                rgb = rgb[..., ::-1]
            assert np.array_equal(g, rgb)


def test_output_scaling(stream):
    sps, pps, aus = stream
    hdr = (b"\x00\x00\x00\x01" + sps + b"\x00\x00\x00\x01" + pps)
    sess = DecompressSession(use_device=False)
    sess.begin(W, H, out_width=W // 2, out_height=H // 2)
    got = _decode_all(sess, hdr, aus)
    assert got[0][0].shape == (H // 2, W // 2)
    assert got[0][1].shape == (H // 4, W // 4)
