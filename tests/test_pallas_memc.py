"""Fused refine+MC Pallas kernel (ops/pallas/memc.py) vs the XLA golden
model (encode/inter_partition._refine_and_mc_xla): bit-exact mv8 and
prediction, across geometries, search ranges, and partition layouts."""

import jax.numpy as jnp
import numpy as np
import pytest

from x264vfw_tpu.encode.inter_partition import (_minima_from_q, _quad_sads,
                                                _refine_and_mc_xla,
                                                partition_decide_from_minima,
                                                partition_search_and_mc)
from x264vfw_tpu.ops.pallas.memc import partition_refine_mc


def _mk(H, W, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    base = 64 + 64 * np.sin(xx / 13.0) + 48 * np.cos(yy / 11.0)
    src = np.clip(base + rng.integers(-30, 31, (H, W)), 0, 255)
    ref = np.clip(np.roll(base, (2, -3), (0, 1))
                  + rng.integers(-20, 21, (H, W)), 0, 255)
    return src.astype(np.int16), ref.astype(np.int16)


@pytest.mark.parametrize("H,W,R", [(48, 80, 4), (64, 128, 8), (48, 320, 8)])
def test_refine_mc_matches_xla(H, W, R):
    src, ref = _mk(H, W, seed=R)
    PAD = R + 8
    src16 = jnp.asarray(src)
    ref_pad = jnp.pad(jnp.asarray(ref), PAD, mode="edge")
    mins = _minima_from_q(_quad_sads(src16, ref_pad, R, "xla"), R)
    part, mv8i = partition_decide_from_minima(mins, R, qp=26)

    mv_want, pred_want = _refine_and_mc_xla(src16, ref_pad, mv8i, part, R)
    mv_got, pred_got = partition_refine_mc(src16, ref_pad, mv8i, part, R,
                                           interpret=True)
    np.testing.assert_array_equal(np.asarray(mv_got), np.asarray(mv_want))
    np.testing.assert_array_equal(np.asarray(pred_got),
                                  np.asarray(pred_want))


def test_forced_partition_layouts():
    """Every partition code routes through its own refine grouping."""
    H, W, R = 48, 80, 4
    src, ref = _mk(H, W, seed=7)
    PAD = R + 8
    src16 = jnp.asarray(src)
    ref_pad = jnp.pad(jnp.asarray(ref), PAD, mode="edge")
    mins = _minima_from_q(_quad_sads(src16, ref_pad, R, "xla"), R)
    _, mv8i = partition_decide_from_minima(mins, R, qp=26)
    for code in range(4):
        part = jnp.full((H // 16, W // 16), code, jnp.int32)
        mv_want, pred_want = _refine_and_mc_xla(src16, ref_pad, mv8i, part, R)
        mv_got, pred_got = partition_refine_mc(src16, ref_pad, mv8i, part, R,
                                               interpret=True)
        np.testing.assert_array_equal(np.asarray(mv_got),
                                      np.asarray(mv_want), err_msg=str(code))
        np.testing.assert_array_equal(np.asarray(pred_got),
                                      np.asarray(pred_want),
                                      err_msg=str(code))


def test_partition_search_backends_agree():
    """Full partition search: pallas_interpret (minima kernel + fused
    refine/MC kernel) == xla end to end."""
    H, W, R = 48, 128, 4
    src, ref = _mk(H, W, seed=3)
    refc = np.full((H // 2, W // 2), 128, np.int16)
    outs = {}
    for be in ("xla", "pallas_interpret"):
        outs[be] = partition_search_and_mc(
            jnp.asarray(src, jnp.int32), jnp.asarray(refc, jnp.int32),
            jnp.asarray(refc, jnp.int32), jnp.asarray(ref, jnp.int32),
            jnp.asarray(refc, jnp.int32), jnp.asarray(refc, jnp.int32),
            R, qp=26, me_backend=be)
    for a, b in zip(outs["xla"], outs["pallas_interpret"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
