"""Reliable TPU timing over the axon tunnel.

block_until_ready() returns early over the tunnel, so timings must end in a
host pull (np.asarray) of a TINY array. To time a device function, we chain
n iterations through a scalar carry (each iteration depends on the last, so
the device can't overlap them away) and pull one scalar at the end.
"""

from __future__ import annotations

import time

import numpy as np


def timeit(make_step, n=10, warmup=2):
    """make_step: () -> (step_fn, init_carry) where step_fn(carry) -> carry
    is jitted and carry is a small device value. Returns ms per step."""
    import jax
    step, carry = make_step()
    for _ in range(warmup):
        carry = step(carry)
    np.asarray(jax.tree.leaves(carry)[0])
    t0 = time.perf_counter()
    c = carry
    for _ in range(n):
        c = step(c)
    np.asarray(jax.tree.leaves(c)[0])
    return (time.perf_counter() - t0) / n * 1000.0


def time_fn(fn, *args, n=10, reduce_out=None):
    """Time fn(*args) by chaining a scalar perturbation of the first arg.

    reduce_out: optional fn(output)->scalar; default sums the first leaf.
    The perturbation (adding carry*0) keeps results identical while forcing
    sequential execution."""
    import jax
    import jax.numpy as jnp

    def red(out):
        if reduce_out is not None:
            return reduce_out(out)
        leaf = jax.tree.leaves(out)[0]
        return leaf.astype(jnp.int32).sum() if leaf.dtype != jnp.float32 \
            else leaf.sum().astype(jnp.int32)

    a0 = args[0]

    @jax.jit
    def step(carry):
        a = a0 + (carry * 0).astype(a0.dtype)
        out = fn(a, *args[1:])
        return red(out)

    return timeit(lambda: (step, jnp.int32(0)), n=n)
