"""Frame scaling — the libswscale-equivalent for the transcode pipeline
(reference decode path uses sws_scale, /root/reference/codec.c:2292;
BASELINE config 5 requires decode->scale->re-encode).

Separable bilinear and Lanczos-free bicubic (Catmull-Rom) resamplers in
JAX, expressed as two dense matmuls per plane so the MXU does the work
(resampling IS a matmul: out = Sv @ img @ Sh^T with sparse-banded S, which
XLA handles fine at video sizes).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _bilinear_matrix(dst: int, src: int) -> np.ndarray:
    """(dst, src) row-resampling matrix, center-aligned like swscale."""
    m = np.zeros((dst, src), dtype=np.float32)
    scale = src / dst
    for i in range(dst):
        x = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        f = x - x0
        a = min(max(x0, 0), src - 1)
        b = min(max(x0 + 1, 0), src - 1)
        m[i, a] += 1.0 - f
        m[i, b] += f
    return m


def _cubic_w(t: float) -> float:
    # Catmull-Rom (a = -0.5)
    a = -0.5
    t = abs(t)
    if t < 1:
        return (a + 2) * t ** 3 - (a + 3) * t ** 2 + 1
    if t < 2:
        return a * t ** 3 - 5 * a * t ** 2 + 8 * a * t - 4 * a
    return 0.0


@lru_cache(maxsize=64)
def _bicubic_matrix(dst: int, src: int) -> np.ndarray:
    m = np.zeros((dst, src), dtype=np.float32)
    scale = src / dst
    for i in range(dst):
        x = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        total = 0.0
        for k in range(-1, 3):
            w = _cubic_w(x - (x0 + k))
            j = min(max(x0 + k, 0), src - 1)
            m[i, j] += w
            total += w
        m[i] /= max(total, 1e-6)
    return m


def scale_plane(plane: jnp.ndarray, dst_h: int, dst_w: int,
                method: str = "bicubic") -> jnp.ndarray:
    """(H, W) -> (dst_h, dst_w), uint8-range int32 output."""
    src_h, src_w = plane.shape
    if (src_h, src_w) == (dst_h, dst_w):
        return plane.astype(jnp.int32)
    mk = _bicubic_matrix if method == "bicubic" else _bilinear_matrix
    Sv = jnp.asarray(mk(dst_h, src_h))
    Sh = jnp.asarray(mk(dst_w, src_w))
    x = plane.astype(jnp.float32)
    out = Sv @ x @ Sh.T
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.int32)


def scale_i420(y, u, v, dst_w: int, dst_h: int, method: str = "bicubic"):
    assert dst_w % 2 == 0 and dst_h % 2 == 0
    return (scale_plane(jnp.asarray(y), dst_h, dst_w, method),
            scale_plane(jnp.asarray(u), dst_h // 2, dst_w // 2, method),
            scale_plane(jnp.asarray(v), dst_h // 2, dst_w // 2, method))
