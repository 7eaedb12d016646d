"""Intra_4x4 encode: prediction tables vs golden, conformance vs FFmpeg.

The reference forwards I4x4 through libx264's analysis surface
(/root/reference/codec.c:887 `--partitions i4x4`); these tests pin our
device I_NxN encode (encode/intra4x4.py + slope-2 wavefront) to the stock
FFmpeg oracle in both entropy modes.
"""
import numpy as np
import pytest

import oracle
from x264vfw_tpu.encode.ref_encoder import EncoderConfig
from x264vfw_tpu.encode.tpu_encoder import TpuEncoder


def test_pred_tables_match_golden():
    """Table-driven (w[i1]+2w[i2]+w[i3]+2)>>2 formulation == spec-scalar
    golden (ops/intra_np.pred4x4) for all 8 directional modes."""
    from x264vfw_tpu.encode.intra4x4 import _IDX, _DIR_MODES
    from x264vfw_tpu.ops import intra_np as ip
    rng = np.random.default_rng(0)
    for _ in range(100):
        w = rng.integers(0, 256, 13).astype(np.int64)
        tl, t8, l4 = int(w[0]), w[1:9], w[9:13]
        g = w[_IDX]
        pred = ((g[..., 0] + 2 * g[..., 1] + g[..., 2] + 2) >> 2
                ).reshape(8, 4, 4)
        for mi, m in enumerate(_DIR_MODES):
            gold = ip.pred4x4(m, t8[:4], t8[4:], l4, tl)
            assert np.array_equal(pred[mi], gold), m


def _clip(w, h, n, seed=7):
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (60 + 80 * np.sin((xx + 2 * yy) / 23.0)
            + 50 * ((xx // 20 + yy // 14) % 2) + r.integers(-14, 15, (h, w)))
    fs = []
    for i in range(n):
        y = np.clip(np.roll(base, (i, -2 * i), (0, 1)), 0, 255).astype(np.uint8)
        u = np.clip(120 + 30 * np.sin(xx[::2, ::2] / 31.0 + i), 0, 255).astype(np.uint8)
        v = np.clip(128 + 24 * np.cos(yy[::2, ::2] / 27.0 - i), 0, 255).astype(np.uint8)
        fs.append((y, u, v))
    return fs


def _roundtrip(w, h, qp, cabac, n=4, deblock=False):
    fs = _clip(w, h, n)
    cfg = EncoderConfig(width=w, height=h, qp=qp, keyint=3, i4x4=True,
                        cabac=cabac, deblock=deblock)
    enc = TpuEncoder(cfg)
    bs = enc.headers()
    for (y, u, v) in fs:
        bs += enc.encode_frame(y, u, v)
    dec = oracle.decode_h264_planes(bs)
    assert dec is not None
    ys, us, vs = dec
    assert ys.shape[0] == n
    rec = enc.last_recon
    assert np.array_equal(ys[-1], np.asarray(rec[0])[:h, :w])
    assert np.array_equal(us[-1], np.asarray(rec[1])[:h // 2, :w // 2])
    assert np.array_equal(vs[-1], np.asarray(rec[2])[:h // 2, :w // 2])
    return enc


@pytest.mark.parametrize("qp", [12, 28, 40])
def test_i4x4_cavlc_conformance(qp):
    """Mixed I16/I_NxN CAVLC streams decode bit-exactly in stock FFmpeg
    across the QP range (I + P GOPs, recon feedback through keyint=3)."""
    _roundtrip(80, 48, qp, cabac=False)


def test_i4x4_cavlc_deblock_odd_geometry():
    _roundtrip(78, 46, 26, cabac=False, deblock=True)


def test_i4x4_cabac_conformance():
    """I_NxN CABAC write path (mb_type bin 0, pred-mode bins ctx 68/69,
    intra CBP, LumaLevel4x4 residual) vs stock FFmpeg."""
    _roundtrip(80, 48, 28, cabac=True)


def test_i4x4_actually_used():
    """The mode decision must pick I_NxN on detailed content (a 2-mode or
    I16-only encoder would leave use_i4 empty)."""
    import jax.numpy as jnp
    from x264vfw_tpu.encode.device import encode_i_frame
    r = np.random.default_rng(5)
    yy, xx = np.mgrid[0:96, 0:128]
    y = np.clip(60 + 80 * np.sin((xx + 2 * yy) / 23.0)
                + 60 * ((xx // 24 + yy // 16) % 2)
                + r.integers(-12, 13, (96, 128)), 0, 255).astype(np.int32)
    u = np.full((48, 64), 118, np.int32)
    v = np.full((48, 64), 130, np.int32)
    out = encode_i_frame(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                         28, 28, i4x4=True)
    used = int(np.asarray(out["use_i4"]).sum())
    assert 0 < used, "I4x4 never selected on detailed content"
    assert used < 48, "I16 never selected (decision degenerate)"
