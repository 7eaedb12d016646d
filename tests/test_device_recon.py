"""Device decode recon (config 4): TPU reconstruction of parsed P frames
must match the host decoder bit-exactly."""

import numpy as np
import jax.numpy as jnp

import oracle
from x264vfw_tpu.decode.decoder import H264Decoder
from x264vfw_tpu.decode.device_recon import recon_p16_frame
from x264vfw_tpu.encode.ref_encoder import EncoderConfig
from x264vfw_tpu.encode.tpu_encoder import TpuEncoder
from x264vfw_tpu.ops import transform_np as tnp


def test_device_recon_matches_host():
    w, h, n = 64, 48, 4
    clip = oracle.make_test_clip(w, h, n, seed=9)
    enc = TpuEncoder(EncoderConfig(width=w, height=h, qp=24, keyint=100,
                                   search_range=4))
    fsz, csz = w * h, w * h // 4
    bs = b""
    for i in range(n):
        bs += enc.encode_frame(clip[i, :fsz].reshape(h, w),
                               clip[i, fsz:fsz + csz].reshape(h // 2, w // 2),
                               clip[i, fsz + csz:].reshape(h // 2, w // 2))
    dec = H264Decoder()
    frames = dec.decode(bs)
    assert len(frames) == n
    prev = None
    checked = 0
    for i, f in enumerate(frames):
        if i == 0 or getattr(f, "syntax", None) is None:
            prev = f
            continue
        syn = f.syntax
        qp = int(f.qps[0, 0])
        qpc = int(tnp.chroma_qp(qp, 0))
        mv_q = np.stack([f.mvs[::4, ::4, 0], f.mvs[::4, ::4, 1]], -1)
        # full (uncropped) reference planes come from the previous frame's
        # decoder output padded back to MB multiples
        W16 = (w + 15) // 16 * 16
        H16 = (h + 15) // 16 * 16
        def padp(p, hh, ww):
            return np.pad(np.asarray(p), ((0, hh - p.shape[0]), (0, ww - p.shape[1])), mode="edge")
        ry = padp(prev.y, H16, W16)
        ru = padp(prev.u, H16 // 2, W16 // 2)
        rv = padp(prev.v, H16 // 2, W16 // 2)
        y, u, v = recon_p16_frame(
            jnp.asarray(syn["levels"]), jnp.asarray(syn["dc_u"]),
            jnp.asarray(syn["dc_v"]), jnp.asarray(syn["ac_u"]),
            jnp.asarray(syn["ac_v"]), jnp.asarray(syn["cbp_luma"]),
            jnp.asarray(syn["cbp_chroma"]), jnp.asarray(mv_q),
            jnp.asarray(ry, jnp.int32), jnp.asarray(ru, jnp.int32),
            jnp.asarray(rv, jnp.int32), qp, qpc, rng=8)
        np.testing.assert_array_equal(np.asarray(y)[:h, :w], f.y, err_msg=f"f{i} y")
        np.testing.assert_array_equal(np.asarray(u)[:h // 2, :w // 2], f.u, err_msg=f"f{i} u")
        np.testing.assert_array_equal(np.asarray(v)[:h // 2, :w // 2], f.v, err_msg=f"f{i} v")
        prev = f
        checked += 1
    assert checked >= 2
