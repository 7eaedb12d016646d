"""Transcode pipeline (decode->scale->re-encode) + GOP sharding on the
virtual 8-device CPU mesh."""

import numpy as np
import jax

import oracle
from x264vfw_tpu.config.params import EncoderParams
from x264vfw_tpu.parallel.transcode import transcode
from x264vfw_tpu.parallel.gop import encode_clip_gop_parallel
from x264vfw_tpu.ops.scale import scale_i420


def test_scaler_identity_and_downscale():
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    u = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    v = rng.integers(0, 256, (16, 24)).astype(np.uint8)
    sy, su, sv = scale_i420(y, u, v, 48, 32)
    np.testing.assert_array_equal(np.asarray(sy), y)
    dy, du, dv = scale_i420(y, u, v, 24, 16)
    assert np.asarray(dy).shape == (16, 24)
    # downscale of a flat image stays flat
    flat = np.full((32, 48), 77, np.uint8)
    fy, _, _ = scale_i420(flat, u, v, 24, 16)
    assert np.all(np.abs(np.asarray(fy).astype(int) - 77) <= 1)


def test_transcode_pipeline():
    w, h, n = 96, 80, 4
    clip = oracle.make_test_clip(w, h, n, seed=8)
    # source stream from our own encoder
    from x264vfw_tpu.api import CompressSession
    sess = CompressSession(EncoderParams(rc_mode="cqp", qp=22, merange=4,
                                         log_level=-1))
    sess.begin(w, h)
    fsz, csz = w * h, w * h // 4
    src_bs = b""
    for i in range(n):
        src_bs += sess.compress((clip[i, :fsz].reshape(h, w),
                                 clip[i, fsz:fsz + csz].reshape(h // 2, w // 2),
                                 clip[i, fsz + csz:].reshape(h // 2, w // 2)))
    src_bs += sess.end()["tail"]
    out = transcode(src_bs, 48, 40,
                    EncoderParams(rc_mode="cqp", qp=24, merange=4, log_level=-1))
    dec = oracle.decode_h264_planes(out)
    assert dec is not None
    assert dec[0].shape == (n, 40, 48)


def test_gop_sharding_on_mesh():
    """Sharded GOP encode emits real bitstreams: byte-identical to the
    single-chip encoder at keyint == gop_len, and decodable by the stock
    FFmpeg oracle at sane PSNR."""
    assert jax.device_count() == 8
    from x264vfw_tpu.encode.ref_encoder import EncoderConfig
    from x264vfw_tpu.encode.tpu_encoder import TpuEncoder
    H = W = 48
    G = 3
    n_gops = 4        # fewer GOPs than devices is fine (partial mesh use)
    n = n_gops * G
    clip = oracle.make_test_clip(W, H, n, seed=3)
    fsz, csz = W * H, W * H // 4
    frames = [(clip[i, :fsz].reshape(H, W),
               clip[i, fsz:fsz + csz].reshape(H // 2, W // 2),
               clip[i, fsz + csz:].reshape(H // 2, W // 2))
              for i in range(n)]
    cfg = EncoderConfig(width=W, height=H, qp=26, keyint=G, search_range=4,
                        deblock=True)
    stream = encode_clip_gop_parallel(frames, cfg)

    enc = TpuEncoder(cfg)
    single = b"".join(enc.encode_frame(*f) for f in frames)
    assert stream == single, "sharded stream != single-chip stream"

    dec = oracle.decode_h264_planes(stream)
    assert dec is not None and dec[0].shape[0] == n
    ps = oracle.psnr(dec[0][0].astype(float),
                     frames[0][0].astype(float))
    assert ps > 28, f"IDR PSNR {ps}"
