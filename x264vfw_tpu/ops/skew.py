"""Wavefront skew transforms (pure layout ops — pad+reshape+transpose).

Anti-diagonal wavefronts (intra prediction, deblocking) process MB (y, x)
at step d = slope*y + x with a fixed slot per MB row.  Mapping between the
(y, x) raster and the (step, slot) grid is a shear, implementable without
gathers: for row-major storage,

    flat[y*(steps + slope) + x]  ==  flat'[y*steps + (x + slope*y)]

so both directions are a pad + reshape + transpose that XLA lowers at
memory speed (gathers and scatters are pathological on TPU).
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(b: jnp.ndarray, steps: int, slope: int = 1):
    """(rows, cols, ...) -> (steps, rows, ...) with out[d, y] = b[y, d - slope*y]
    (junk in out-of-range slots)."""
    rows, cols = b.shape[:2]
    trail = b.shape[2:]
    pad = [(0, 0), (0, steps + slope - cols)] + [(0, 0)] * len(trail)
    g = jnp.pad(b, pad).reshape((rows * (steps + slope),) + trail)
    f = g[: rows * steps].reshape((rows, steps) + trail)
    return jnp.swapaxes(f, 0, 1)


def unskew(a: jnp.ndarray, cols: int, slope: int = 1, col_offset: int = 0):
    """(steps, rows, ...) -> (rows, cols, ...) with
    out[y, x] = a[slope*y + x + col_offset, y]."""
    steps, rows = a.shape[:2]
    trail = a.shape[2:]
    f = jnp.swapaxes(a, 0, 1).reshape((rows * steps,) + trail)
    pad = [(0, rows * slope)] + [(0, 0)] * len(trail)
    g = jnp.pad(f, pad).reshape((rows, steps + slope) + trail)
    return g[:, col_offset:col_offset + cols]
