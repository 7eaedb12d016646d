"""Transform/quant: JAX device impl bit-exact vs numpy spec golden model,
plus end-to-end quant->dequant->idct reconstruction sanity."""

import numpy as np
import jax.numpy as jnp

from x264vfw_tpu.ops import transform as tj
from x264vfw_tpu.ops import transform_np as tnp


def rand_resid(shape, lo=-255, hi=255, seed=0):
    return np.random.default_rng(seed).integers(lo, hi + 1, size=shape).astype(np.int32)


def test_fdct_matches_matrix_form():
    x = rand_resid((64, 4, 4))
    got = np.asarray(tj.fdct4x4(jnp.asarray(x)))
    want = tnp.fdct4x4(x)
    np.testing.assert_array_equal(got, want)


def test_hadamard_matches():
    x = rand_resid((32, 4, 4), -4080, 4080)
    np.testing.assert_array_equal(np.asarray(tj.hadamard4x4(jnp.asarray(x))),
                                  tnp.hadamard4x4(x))
    y = rand_resid((32, 2, 2), -4080, 4080, seed=1)
    np.testing.assert_array_equal(np.asarray(tj.hadamard2x2(jnp.asarray(y))),
                                  tnp.hadamard2x2(y))


def test_quant_dequant_match_all_qp():
    x = rand_resid((16, 4, 4))
    w = tnp.fdct4x4(x)
    for qp in range(0, 52):
        for intra in (True, False):
            q_np = tnp.quant4x4(w, qp, intra=intra)
            q_j = np.asarray(tj.quant4x4(jnp.asarray(w), qp, intra=intra))
            np.testing.assert_array_equal(q_j, q_np, err_msg=f"qp={qp}")
            d_np = tnp.dequant4x4(q_np, qp)
            d_j = np.asarray(tj.dequant4x4(jnp.asarray(q_np), qp))
            np.testing.assert_array_equal(d_j, d_np, err_msg=f"qp={qp}")


def test_quant_per_block_qp_array():
    w = tnp.fdct4x4(rand_resid((8, 4, 4)))
    qps = np.array([0, 10, 20, 26, 30, 40, 50, 51], dtype=np.int32)
    q_np = tnp.quant4x4(w, qps, intra=True)
    q_j = np.asarray(tj.quant4x4(jnp.asarray(w), jnp.asarray(qps), intra=True))
    np.testing.assert_array_equal(q_j, q_np)
    for i, qp in enumerate(qps):
        np.testing.assert_array_equal(q_np[i], tnp.quant4x4(w[i], int(qp), intra=True))


def test_dc_paths_match():
    dc = rand_resid((16, 4, 4), -4080, 4080)
    dc2 = rand_resid((16, 2, 2), -2040, 2040, seed=2)
    for qp in (0, 11, 23, 29, 35, 36, 40, 51):
        np.testing.assert_array_equal(
            np.asarray(tj.luma_dc_fwd_quant(jnp.asarray(dc), qp)),
            tnp.luma_dc_fwd_quant(dc, qp))
        lv = tnp.luma_dc_fwd_quant(dc, qp)
        np.testing.assert_array_equal(
            np.asarray(tj.luma_dc_dequant(jnp.asarray(lv), qp)),
            tnp.luma_dc_dequant(lv, qp), err_msg=f"qp={qp}")
        for intra in (True, False):
            np.testing.assert_array_equal(
                np.asarray(tj.chroma_dc_fwd_quant(jnp.asarray(dc2), qp, intra)),
                tnp.chroma_dc_fwd_quant(dc2, qp, intra))
        lv2 = tnp.chroma_dc_fwd_quant(dc2, qp, True)
        np.testing.assert_array_equal(
            np.asarray(tj.chroma_dc_dequant(jnp.asarray(lv2), qp)),
            tnp.chroma_dc_dequant(lv2, qp))


def test_idct_matches():
    x = rand_resid((64, 4, 4))
    d = tnp.dequant4x4(tnp.quant4x4(tnp.fdct4x4(x), 26, True), 26)
    np.testing.assert_array_equal(np.asarray(tj.idct4x4_core(jnp.asarray(d))),
                                  tnp.idct4x4_core(d))


def test_roundtrip_reconstruction_error_bounded():
    """quant->dequant->idct at QP q should reconstruct within ~quant step."""
    rng = np.random.default_rng(3)
    x = rng.integers(-200, 200, size=(256, 4, 4)).astype(np.int32)
    for qp, tol in ((0, 1), (10, 3), (20, 10), (26, 18), (30, 28), (40, 80)):
        w = tnp.fdct4x4(x)
        q = tnp.quant4x4(w, qp, intra=True)
        d = tnp.dequant4x4(q, qp)
        r = tnp.idct4x4_core(d)
        err = np.abs(r - x).max()
        assert err <= tol, f"qp={qp} err={err}"


def test_lossless_at_qp0_dc_flat_block():
    """Flat blocks must reconstruct near-exactly at QP 0."""
    x = np.full((4, 4, 4), 37, dtype=np.int32)
    w = tnp.fdct4x4(x)
    q = tnp.quant4x4(w, 0, True)
    r = tnp.idct4x4_core(tnp.dequant4x4(q, 0))
    assert np.abs(r - x).max() <= 1


def test_zigzag_roundtrip():
    x = rand_resid((10, 4, 4))
    s_np = tnp.zigzag_scan(x)
    s_j = np.asarray(tj.zigzag_scan(jnp.asarray(x)))
    np.testing.assert_array_equal(s_j, s_np)
    np.testing.assert_array_equal(tnp.zigzag_unscan(s_np), x)
    np.testing.assert_array_equal(np.asarray(tj.zigzag_unscan(jnp.asarray(s_np))), x)
    # spec zigzag order spot check (§8.5.6 figure)
    blk = np.arange(16).reshape(1, 4, 4)
    assert tnp.zigzag_scan(blk).ravel().tolist() == [
        0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]


def test_chroma_qp_table():
    assert tnp.chroma_qp(20) == 20
    assert tnp.chroma_qp(29) == 29
    assert tnp.chroma_qp(30) == 29
    assert tnp.chroma_qp(39) == 35
    assert tnp.chroma_qp(51) == 39
    got = np.asarray(tj.chroma_qp(jnp.arange(52)))
    want = tnp.chroma_qp(np.arange(52))
    np.testing.assert_array_equal(got, want)


def test_luma_dc_full_path_scaling():
    """DC-only MB: recon DC ~ source DC through the I16x16 DC pipeline."""
    # constant MB of value v: each 4x4 fdct DC = 16*v, AC = 0
    for v in (10, 100, 200):
        dc = np.full((1, 4, 4), 16 * v, dtype=np.int32)
        for qp in (0, 10, 26, 40, 51):
            lv = tnp.luma_dc_fwd_quant(dc, qp)
            dcrec = tnp.luma_dc_dequant(lv, qp)
            # inject as d[0,0] of each sub-block, idct with zero AC
            d = np.zeros((1, 4, 4, 4, 4), dtype=np.int32)
            d[..., 0, 0] = dcrec[:, :, :, None, None][..., 0, 0]
            # simpler: one sub-block
            blk = np.zeros((1, 4, 4), dtype=np.int32)
            blk[0, 0, 0] = dcrec[0, 0, 0]
            r = tnp.idct4x4_core(blk)
            step = 2 ** (qp / 6)
            assert np.abs(r - v).max() <= max(2, step * 0.75), (v, qp, r[0, 0, 0])
