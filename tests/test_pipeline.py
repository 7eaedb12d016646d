"""Batched session pipeline (encode/pipeline.py) — the one hot path.

CompressSession routes every feature through the windowed batch pipeline;
these tests pin its streams to the per-frame scheduler path (forced via
--threads 1) and to stock FFmpeg.
"""

import numpy as np
import pytest

import oracle
from x264vfw_tpu.api import CompressSession
from x264vfw_tpu.config.params import EncoderParams


def _clip(w, h, n, seed=3):
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


def _run(n, w, h, **kw):
    s = CompressSession(EncoderParams(**kw))
    s.begin(w, h)
    bs = s.encoder.headers()
    for f in _clip(w, h, n):
        bs += s.compress(f)
    st = s.end()
    return bs + st["tail"], s


@pytest.mark.parametrize("kw,exp_pipe", [
    (dict(rc_mode="cqp", qp=30, cabac=False, bframes=0, keyint=8,
          mbtree=False, weightp=0), True),
    (dict(rc_mode="cqp", qp=30, cabac=True, bframes=2, keyint=10,
          mbtree=False, weightp=0), True),
    (dict(rc_mode="crf", crf=26, keyint=12, rc_lookahead=8), True),
    (dict(rc_mode="cqp", qp=30, cabac=False, bframes=0, ref=3, keyint=9,
          mbtree=False, weightp=0), True),
], ids=["cavlc-p", "cabac-b", "defaults-crf", "multiref"])
def test_pipeline_streams_decode_in_ffmpeg(kw, exp_pipe):
    n = 20
    bs, s = _run(n, 64, 64, **kw)
    assert (s._pipe is not None) == exp_pipe
    ref = oracle.decode_h264_planes(bs)
    assert ref is not None, "FFmpeg rejected the pipeline stream"
    assert ref[0].shape[0] == n


def test_pipeline_matches_perframe_path_cavlc():
    """Batched and per-frame paths produce the same reconstruction
    quality; with a fixed QP and no RC drift, CAVLC P-runs are
    byte-identical."""
    n = 14
    kw = dict(rc_mode="cqp", qp=32, cabac=False, bframes=0, keyint=50,
              mbtree=False, weightp=0, scenecut=0)
    bs_b, s_b = _run(n, 64, 48, **kw)
    assert s_b._pipe is not None
    bs_f, s_f = _run(n, 64, 48, threads=1, **kw)
    assert s_f._pipe is None
    assert bs_b == bs_f


def test_pipeline_keyint_and_scenecut_idrs():
    n = 20
    kw = dict(rc_mode="cqp", qp=30, cabac=False, bframes=0, keyint=6,
              mbtree=False, weightp=0)
    bs, s = _run(n, 64, 64, **kw)
    idrs = bs.count(b"\x00\x00\x00\x01\x65")
    assert idrs == (n + 5) // 6, f"expected IDR every 6 frames, got {idrs}"
