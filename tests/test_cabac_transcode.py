"""CAVLC->CABAC entropy transcode (bitstream/cabac_transcode.py).

The CABAC hot path re-codes the device CAVLC slice through two native C
passes.  Gate: transcoded streams must be byte-identical to the round-3
syntax-tensor CABAC path (same syntax in, same arithmetic coder) and
decode bit-exactly in stock FFmpeg.
"""

import numpy as np
import pytest

import oracle
from x264vfw_tpu.bitstream import cabac_transcode
from x264vfw_tpu.decode.decoder import H264Decoder
from x264vfw_tpu.encode.ref_encoder import EncoderConfig
from x264vfw_tpu.encode.tpu_encoder import TpuEncoder

pytestmark = pytest.mark.skipif(not cabac_transcode.available(),
                                reason="native helpers unavailable")


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
    enc = TpuEncoder(EncoderConfig(width=w, height=h, cabac=True, **kw))
    bs = enc.headers()
    for f in _clip(w, h, n):
        for (au, d, k) in enc.push_frame(*f):
            bs += au
    for (au, d, k) in enc.flush():
        bs += au
    return bs


def _encode_oldpath(w, h, n, **kw):
    enc = TpuEncoder(EncoderConfig(width=w, height=h, cabac=True, **kw))
    enc._transcode_ok = lambda: False          # force the round-3 path
    bs = enc.headers()
    for f in _clip(w, h, n):
        for (au, d, k) in enc.push_frame(*f):
            bs += au
    for (au, d, k) in enc.flush():
        bs += au
    return bs


@pytest.mark.parametrize("kw", [
    dict(qp=28, keyint=4, deblock=True),
    dict(qp=30, keyint=8, deblock=True, aq_strength=1.0, trellis=True,
         i4x4=True, partitions=True),
    dict(qp=30, keyint=8, deblock=True, num_ref_frames=3),
    dict(qp=30, keyint=8, deblock=True, bframes=2),
], ids=["basic", "full-feature", "multiref", "bframes"])
def test_transcode_matches_old_path_and_ffmpeg(kw):
    bs = _encode(64, 64, 6, **kw)
    bs_old = _encode_oldpath(64, 64, 6, **kw)
    assert bs == bs_old, "transcode and syntax-tensor CABAC paths diverge"
    ref = oracle.decode_h264_planes(bs)
    assert ref is not None, "FFmpeg rejected the transcoded stream"
    ry, ru, rv = ref
    assert ry.shape[0] == 6
    dec = H264Decoder()
    dec.decode(bs)
    order = dec.display_order()
    for i, f in enumerate(order):
        np.testing.assert_array_equal(np.asarray(f.y, np.uint8), ry[i])
        np.testing.assert_array_equal(np.asarray(f.u, np.uint8), ru[i])
        np.testing.assert_array_equal(np.asarray(f.v, np.uint8), rv[i])
