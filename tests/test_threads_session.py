"""--threads N > 1 through the product session (sharded GOP parallelism).

The reference exposes threading as a session knob (codec.c:933-943); here
`--threads 8` routes CompressSession through GOP sharding over the device
mesh (8 virtual CPU devices in tests).  At the sharded feature set (CQP,
bframes=0, ref=1, no lookahead) the sharded session must emit the SAME
bytes as the single-chip session.
"""

from __future__ import annotations

import numpy as np
import pytest

from x264vfw_tpu.api import CompressSession
from x264vfw_tpu.config.params import EncoderParams

W, H, N = 96, 64, 8
GOP = 4


def _clip():
    rng = np.random.default_rng(21)
    yy, xx = np.mgrid[0:H, 0:W]
    base = 64 + 64 * np.sin(xx / 9.0) + 48 * np.cos(yy / 7.0)
    tex = rng.integers(-18, 19, (H, W))
    out = []
    for k in range(N):
        y = np.clip(base + np.roll(tex, 2 * k, axis=1), 0, 255).astype(np.uint8)
        u = np.full((H // 2, W // 2), 120, np.uint8)
        v = np.full((H // 2, W // 2), 136, np.uint8)
        out.append((y, u, v))
    return out


def _encode(cmod: str) -> bytes:
    sess = CompressSession(
        EncoderParams(),
        extra_cmdline=f"--qp 26 --bframes 0 --ref 1 --no-mbtree "
                      f"--weightp 0 --scenecut 0 --keyint {GOP} "
                      f"--merange 4 {cmod}")
    sess.begin(W, H)
    out = b""
    for f in _clip():
        out += sess.compress(f, "i420")
    stats = sess.end()
    return out + stats["tail"]


@pytest.mark.parametrize("cabac", ["--no-cabac", "--cabac"])
def test_threads8_bit_identical_to_single_chip(cabac):
    single = _encode(f"--threads 1 {cabac}")
    sharded = _encode(f"--threads 8 {cabac}")
    assert sharded == single


def test_threads8_decodes_in_oracle():
    import sys
    sys.path.insert(0, "tests")
    import oracle
    bs = _encode("--threads 8 --no-cabac")
    fr = oracle.decode_h264(bs)
    assert fr.shape[0] == N


def test_threads8_downgrade_warns():
    sess = CompressSession(
        EncoderParams(), extra_cmdline="--threads 8 --bframes 3 --qp 26")
    msgs = []
    sess.log.sink = lambda lvl, m: msgs.append(m)
    sess.begin(W, H)
    assert any("sharded GOP mode" in m for m in msgs)
    out = b""
    for f in _clip():
        out += sess.compress(f, "i420")
    out += sess.end()["tail"]
    import sys
    sys.path.insert(0, "tests")
    import oracle
    assert oracle.decode_h264(out).shape[0] == N
