"""Device deblocking: Pallas kernel vs spec golden + encoder conformance.

The kernel (ops/pallas/deblock.py) must be bit-exact against the spec-order
golden model (ops/deblock_np.py) through the edge-parameter maps, and an
encoder running with deblock enabled must produce streams that BOTH our
native decoder (independent spec implementation with its own loop filter)
and stock FFmpeg reconstruct bit-exactly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from x264vfw_tpu.ops import deblock as dbj
from x264vfw_tpu.ops.deblock_np import deblock_frame
from x264vfw_tpu.ops.pallas.deblock import deblock_apply

from test_deblock_maps import make_case


@pytest.mark.parametrize("mbh,mbw,seed,kw", [
    (4, 5, 0, {}),
    (3, 3, 1, {"all_intra": True}),
    (2, 8, 2, {"offA": -2, "offB": 1}),
    (5, 2, 4, {"qpoff": -4}),
])
def test_kernel_matches_spec_golden(mbh, mbw, seed, kw):
    sd = make_case(mbh, mbw, seed, **kw)
    y0, u0, v0 = sd.y.copy(), sd.u.copy(), sd.v.copy()
    intra = (sd.mb_type >= 0) & (sd.mb_type < 100)
    maps = dbj.build_maps(intra, sd.tc_luma, sd.mv, sd.ref, sd.qp_map,
                          sd.h.slice_alpha_c0_offset_div2 * 2,
                          sd.h.slice_beta_offset_div2 * 2,
                          sd.pps.chroma_qp_index_offset)
    yk, uk, vk = deblock_apply(jnp.asarray(y0), jnp.asarray(u0),
                               jnp.asarray(v0), *maps, interpret=True)
    deblock_frame(sd)
    np.testing.assert_array_equal(np.asarray(yk), sd.y)
    np.testing.assert_array_equal(np.asarray(uk), sd.u)
    np.testing.assert_array_equal(np.asarray(vk), sd.v)


def test_encoder_deblock_conformance():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    import oracle
    from x264vfw_tpu.encode.ref_encoder import EncoderConfig
    from x264vfw_tpu.encode.tpu_encoder import TpuEncoder
    from x264vfw_tpu.decode.decoder import H264Decoder

    W, H, N = 96, 64, 5
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (H, W))
    fr = [(np.clip(np.roll(base, 2 * t, 1) + rng.integers(-4, 5, (H, W)),
                   0, 255).astype(np.uint8),
           rng.integers(0, 256, (H // 2, W // 2), dtype=np.uint8),
           rng.integers(0, 256, (H // 2, W // 2), dtype=np.uint8))
          for t in range(N)]
    for a_, b_ in ((0, 0), (-2, 1)):
        enc = TpuEncoder(EncoderConfig(width=W, height=H, qp=28, keyint=25,
                                       search_range=8, deblock=True,
                                       deblock_alpha=a_, deblock_beta=b_))
        aus = [enc.encode_frame(*f) for f in fr]
        bs = enc.headers() + b"".join(aus)
        frames = H264Decoder().decode(bs)
        er = enc.last_recon
        assert np.array_equal(er[0], frames[-1].y)
        assert np.array_equal(er[1], frames[-1].u)
        assert np.array_equal(er[2], frames[-1].v)
        ff = oracle.decode_h264(bs)
        assert ff is not None and ff.shape[0] == N
        assert np.array_equal(ff[-1], np.concatenate([p.ravel() for p in er]))
