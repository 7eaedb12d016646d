"""P-frame inter partitions (16x8/8x16/8x8): conformance + quality.

The reference forwards this capability as x264 --partitions
(/root/reference/codec.c:887); decode checks use stock FFmpeg (oracle) and
the native decoder, which supports all P partition types.
"""

import numpy as np
import jax.numpy as jnp

import oracle
from x264vfw_tpu.encode.ref_encoder import EncoderConfig
from x264vfw_tpu.encode.tpu_encoder import TpuEncoder


def _mixed_motion_clip(w, h, n, seed=3):
    r = np.random.default_rng(seed)
    base = r.integers(0, 256, (h, w)).astype(np.uint8)
    frames = []
    for f in range(n):
        y = np.roll(base, (f, 2 * f), axis=(0, 1)).copy()
        y[:, (w // 2 - 8):] = np.roll(base, (-f, -f), axis=(0, 1))[:, (w // 2 - 8):]
        u = np.clip(128 + r.integers(-9, 10, (h // 2, w // 2)), 0, 255).astype(np.uint8)
        v = np.clip(128 + r.integers(-9, 10, (h // 2, w // 2)), 0, 255).astype(np.uint8)
        frames.append((y, u, v))
    return frames


def test_partition_stream_conformance():
    from x264vfw_tpu.decode.decoder import H264Decoder
    w, h, n = 96, 64, 5
    frames = _mixed_motion_clip(w, h, n)
    enc = TpuEncoder(EncoderConfig(width=w, height=h, qp=26, keyint=50,
                                   search_range=8, me_backend="xla",
                                   partitions=True, deblock=True))
    bs = b"".join(enc.encode_frame(*f) for f in frames)
    dec = oracle.decode_h264(bs)
    assert dec is not None and dec.shape[0] == n
    nd = H264Decoder()
    nd.decode(bs)
    for i in range(n):
        fy = dec[i][:w * h].reshape(h, w)
        assert np.array_equal(fy, nd.frames[i].y[:h, :w]), i
        assert oracle.psnr(frames[i][0].astype(np.float64),
                           fy.astype(np.float64)) > 30
    # closed loop: encoder recon == decoder output
    assert np.array_equal(np.asarray(enc.last_recon[0])[:h, :w],
                          dec[n - 1][:w * h].reshape(h, w))


def test_partition_decision_diversity():
    """Mid-MB motion splits must actually select split partitions."""
    from x264vfw_tpu.encode.inter_partition import partition_search_and_mc
    W, H, rng = 96, 64, 4
    r = np.random.default_rng(1)
    ref = r.integers(0, 256, (H, W)).astype(np.int32)
    cu = np.full((H // 2, W // 2), 128, np.int32)
    src = np.roll(ref, 2, axis=1)
    src[:, 40:] = np.roll(ref, -2, axis=1)[:, 40:]
    part, mv8, py, pu, pv = partition_search_and_mc(
        jnp.asarray(src), jnp.asarray(cu), jnp.asarray(cu),
        jnp.asarray(ref), jnp.asarray(cu), jnp.asarray(cu), rng, 26,
        subpel=False, me_backend="xla")
    assert (np.asarray(part)[:, 2] == 2).all()      # 8x16 on the split col


def test_partition_bit_savings():
    """At fixed QP, partitions must not lose quality and should cut bits
    on mixed-motion content."""
    w, h, n = 160, 96, 5
    r = np.random.default_rng(9)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.clip(120 + 70 * np.sin(xx / 6.0) + 60 * np.cos(yy / 8.0)
                   + r.integers(-15, 16, (h, w)), 0, 255).astype(np.uint8)
    frames = []
    for f in range(n):
        y = np.roll(base, (f, 2 * f), axis=(0, 1)).copy()
        y[h // 3:2 * h // 3, :] = np.roll(base, (-2 * f, f), axis=(0, 1))[h // 3:2 * h // 3, :]
        frames.append((y, np.full((h // 2, w // 2), 128, np.uint8),
                       np.full((h // 2, w // 2), 128, np.uint8)))
    res = {}
    for parts in (False, True):
        enc = TpuEncoder(EncoderConfig(width=w, height=h, qp=28, keyint=50,
                                       search_range=8, me_backend="xla",
                                       partitions=parts))
        bs = b"".join(enc.encode_frame(*f) for f in frames)
        dec = oracle.decode_h264(bs)
        ps = np.mean([oracle.psnr(frames[i][0].astype(np.float64),
                                  dec[i][:w * h].reshape(h, w).astype(np.float64))
                      for i in range(n)])
        res[parts] = (len(bs), ps)
    assert res[True][1] >= res[False][1] - 0.1
    assert res[True][0] < res[False][0]


def test_partition_batch_matches_per_frame():
    """encode_gop_batch must emit byte-identical AUs to encode_frame."""
    w, h, n = 96, 64, 4
    frames = _mixed_motion_clip(w, h, n, seed=7)
    cfg = dict(width=w, height=h, qp=27, keyint=50, search_range=8,
               me_backend="xla", partitions=True, deblock=True)
    e1 = TpuEncoder(EncoderConfig(**cfg))
    aus1 = [e1.encode_frame(*f) for f in frames]
    e2 = TpuEncoder(EncoderConfig(**cfg))
    aus2 = e2.encode_gop_batch(frames)
    assert len(aus1) == len(aus2)
    for a, b in zip(aus1, aus2):
        assert a == b


def test_partition_cabac_conformance():
    """Partitions under CABAC: mb_type/sub_mb_type bins + per-partition
    mvds with 8x8-granular contexts must decode in stock FFmpeg."""
    w, h, n = 96, 64, 5
    frames = _mixed_motion_clip(w, h, n)
    enc = TpuEncoder(EncoderConfig(width=w, height=h, qp=26, keyint=50,
                                   search_range=8, me_backend="xla",
                                   cabac=True, partitions=True, deblock=True))
    bs = b"".join(enc.encode_frame(*f) for f in frames)
    dec = oracle.decode_h264(bs)
    assert dec is not None and dec.shape[0] == n
    assert np.array_equal(np.asarray(enc.last_recon[0])[:h, :w],
                          dec[n - 1][:w * h].reshape(h, w))


def test_multiref_cabac_conformance():
    """--ref 3 under CABAC emits ref_idx bins; streams must decode in
    stock FFmpeg with a closed loop."""
    w, h, n = 96, 64, 6
    frames = _mixed_motion_clip(w, h, n, seed=11)
    enc = TpuEncoder(EncoderConfig(width=w, height=h, qp=26, keyint=50,
                                   search_range=8, me_backend="xla",
                                   cabac=True, num_ref_frames=3))
    bs = b"".join(enc.encode_frame(*f) for f in frames)
    dec = oracle.decode_h264(bs)
    assert dec is not None and dec.shape[0] == n
    assert np.array_equal(np.asarray(enc.last_recon[0])[:h, :w],
                          dec[n - 1][:w * h].reshape(h, w))
