"""High-profile 8x8 transform, encode side (x264 --8x8dct, codec.c:904).

The per-MB 4x4-vs-8x8 decision runs in the device P pipeline; levels are
emitted in the CAVLC interleaved-4x4 layout (§8.5.6) so the slot machinery
is shared.  Conformance oracle: our recon must equal stock FFmpeg's decode
bit-exactly, and the High signaling (SPS ext fields, PPS
transform_8x8_mode_flag) must round-trip.
"""

from __future__ import annotations

import numpy as np
import pytest

import oracle
from x264vfw_tpu.encode.ref_encoder import EncoderConfig
from x264vfw_tpu.encode.tpu_encoder import TpuEncoder

W, H, N = 128, 96, 5


@pytest.fixture(scope="module")
def clip():
    return oracle.make_test_clip(W, H, N, seed=13)


def _encode(clip, dct8x8, parts, qp=26, deblock=True):
    cfg = EncoderConfig(width=W, height=H, qp=qp, keyint=100,
                        search_range=4, deblock=deblock, dct8x8=dct8x8,
                        partitions=parts, aq_strength=1.0, trellis=True)
    enc = TpuEncoder(cfg)
    fsz, csz = W * H, W * H // 4
    bs = enc.headers()
    for i in range(N):
        bs += enc.encode_frame(clip[i, :fsz].reshape(H, W),
                               clip[i, fsz:fsz + csz].reshape(H // 2, W // 2),
                               clip[i, fsz + csz:].reshape(H // 2, W // 2))
    return bs, enc


def test_dct8x8_cabac_transcode_bitexact(clip):
    """CABAC path: the CAVLC->CABAC transcode carries the 8x8 residual
    (cat-5 blocks, transform_size_8x8_flag bins)."""
    cfg = EncoderConfig(width=W, height=H, qp=26, keyint=100,
                        search_range=4, deblock=True, dct8x8=True,
                        partitions=True, aq_strength=1.0, trellis=True,
                        cabac=True)
    enc = TpuEncoder(cfg)
    fsz, csz = W * H, W * H // 4
    bs = enc.headers()
    for i in range(N):
        bs += enc.encode_frame(clip[i, :fsz].reshape(H, W),
                               clip[i, fsz:fsz + csz].reshape(H // 2, W // 2),
                               clip[i, fsz + csz:].reshape(H // 2, W // 2))
    fr = oracle.decode_h264(bs)
    assert fr.shape[0] == N
    rec = enc.last_recon
    assert np.array_equal(fr[-1][:fsz].reshape(H, W), rec[0][:H, :W])


def test_default_session_high_8x8(clip):
    """The DEFAULT config is High profile with the 8x8 transform on
    (CABAC + B + mbtree); the whole session stream must decode in stock
    FFmpeg."""
    from x264vfw_tpu.api import CompressSession
    from x264vfw_tpu.config.params import EncoderParams
    fsz, csz = W * H, W * H // 4
    s = CompressSession(EncoderParams(), extra_cmdline="--qp 26 --keyint 50")
    s.begin(W, H)
    assert s.encoder.sps.profile_idc == 100
    assert s.encoder.pps.transform_8x8_mode_flag == 1
    out = b""
    for i in range(N):
        out += s.compress((clip[i, :fsz].reshape(H, W),
                           clip[i, fsz:fsz + csz].reshape(H // 2, W // 2),
                           clip[i, fsz + csz:].reshape(H // 2, W // 2)),
                          "i420")
    out += s.end()["tail"]
    assert oracle.decode_h264(out).shape[0] == N


@pytest.mark.parametrize("parts", [False, True])
def test_dct8x8_bitexact_vs_ffmpeg(clip, parts):
    bs, enc = _encode(clip, True, parts)
    fr = oracle.decode_h264(bs)
    assert fr.shape[0] == N
    fsz, csz = W * H, W * H // 4
    rec = enc.last_recon
    assert np.array_equal(fr[-1][:fsz].reshape(H, W), rec[0][:H, :W])
    assert np.array_equal(fr[-1][fsz:fsz + csz].reshape(H // 2, W // 2),
                          rec[1][:H // 2, :W // 2])


def test_dct8x8_signaling(clip):
    bs, enc = _encode(clip, True, False)
    assert enc.sps.profile_idc == 100
    assert enc.pps.transform_8x8_mode_flag == 1
    from x264vfw_tpu.bitstream.params import PPS, SPS
    sps2 = SPS.from_rbsp(enc.sps.to_rbsp())
    assert sps2.profile_idc == 100
    pps2 = PPS.from_rbsp(enc.pps.to_rbsp())
    assert pps2.transform_8x8_mode_flag == 1


def test_dct8x8_helps_rate(clip):
    """The 8x8 transform should not cost bits on structured content (it
    wins where 4x4 loses coherence); allow a tiny tolerance."""
    b8, _ = _encode(clip, True, False)
    b4, _ = _encode(clip, False, False)
    assert len(b8) <= len(b4) * 1.02, (len(b8), len(b4))


def test_dct8x8_own_decoder_roundtrip(clip):
    """Our own decoder must agree with the encoder recon too (it already
    decodes stock High 8x8 streams)."""
    from x264vfw_tpu.decode.decoder import H264Decoder
    bs, enc = _encode(clip, True, True)
    frames = H264Decoder(use_device=False).decode(bs)
    assert len(frames) == N
    rec = enc.last_recon
    assert np.array_equal(np.asarray(frames[-1].y, np.uint8)[:H, :W],
                          rec[0][:H, :W].astype(np.uint8))
