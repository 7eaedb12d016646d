"""Metrics + SEI tests."""

import numpy as np

import oracle
from x264vfw_tpu.utils.metrics import psnr, ssim, frame_psnr_yuv
from x264vfw_tpu.bitstream.sei import version_sei, parse_sei_messages, UUID
from x264vfw_tpu.bitstream.nal import split_annexb, NAL_SEI


def test_psnr_ssim_basics():
    a = np.random.default_rng(0).integers(0, 256, (64, 64)).astype(np.uint8)
    assert psnr(a, a) == 99.0
    assert abs(ssim(a, a) - 1.0) < 1e-9
    b = np.clip(a.astype(int) + 5, 0, 255).astype(np.uint8)
    p = psnr(a, b)
    assert 33 < p < 36  # ~20*log10(255/5)
    assert ssim(a, b) < 1.0
    r = frame_psnr_yuv((a, a[:32, :32], a[:32, :32]),
                       (b, a[:32, :32], a[:32, :32]))
    assert r["u"] == 99.0 and r["y"] < 40 and "global" in r


def test_sei_roundtrip_and_decodability():
    sei = version_sei("qp=26")
    units = split_annexb(sei)
    assert len(units) == 1 and units[0].nal_unit_type == NAL_SEI
    msgs = parse_sei_messages(units[0].rbsp)
    assert len(msgs) == 1
    ptype, payload = msgs[0]
    assert ptype == 5 and payload.startswith(UUID)
    assert b"x264vfw_tpu" in payload

    # a stream with SEI must still decode in FFmpeg and our decoder
    from x264vfw_tpu.encode.ref_encoder import EncoderConfig
    from x264vfw_tpu.encode.tpu_encoder import TpuEncoder
    from x264vfw_tpu.decode.decoder import H264Decoder
    clip = oracle.make_test_clip(64, 48, 2, seed=1)
    enc = TpuEncoder(EncoderConfig(width=64, height=48, qp=26, search_range=4))
    bs = b""
    for i in range(2):
        y = clip[i, :64 * 48].reshape(48, 64)
        u = clip[i, 64 * 48:64 * 48 + 16 * 48].reshape(24, 32)
        v = clip[i, 64 * 48 + 16 * 48:].reshape(24, 32)
        bs += enc.encode_frame(y, u, v)
    assert any(u.nal_unit_type == NAL_SEI for u in split_annexb(bs))
    ff = oracle.decode_h264_planes(bs)
    assert ff is not None and ff[0].shape[0] == 2
    own = H264Decoder().decode(bs)
    assert len(own) == 2
    np.testing.assert_array_equal(ff[0][0], own[0].y.astype(np.uint8))
