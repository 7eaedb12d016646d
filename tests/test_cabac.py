"""CABAC entropy coding (bitstream/cabac*.py).

Validation chain:
  1. engine roundtrip fuzz (regular/bypass/terminate over random contexts)
  2. slice writer <-> reader symmetry on random P syntax
  3. GROUND TRUTH: our decoder must reproduce stock FFmpeg bit-exactly on
     REAL x264 CABAC streams (I4x4+I16 intra, P16/skip/intra-in-P inter) —
     this pins every context rule to the spec, not to our own mirror
  4. our encoder's CABAC streams decode bit-exactly in stock FFmpeg AND in
     our decoder, with and without in-loop deblocking
"""

import numpy as np
import pytest

import oracle
from x264vfw_tpu.bitstream import cabac as cb
from x264vfw_tpu.bitstream.cabac_slice import CabacSlice, CabacSliceReader
from x264vfw_tpu.decode.decoder import H264Decoder


def test_engine_roundtrip_fuzz():
    rng = np.random.default_rng(0)
    for trial in range(20):
        qp = int(rng.integers(0, 52))
        st, mps = cb.init_contexts(bool(trial % 2), qp)
        enc = cb.CabacEncoder(st.copy(), mps.copy())
        ops = []
        for _ in range(int(rng.integers(1, 300))):
            kind = rng.integers(0, 10)
            if kind < 6:
                ctx, b = int(rng.integers(0, 1024)), int(rng.integers(0, 2))
                ops.append(("d", ctx, b))
                enc.decision(ctx, b)
            elif kind < 9:
                b = int(rng.integers(0, 2))
                ops.append(("b", b))
                enc.bypass(b)
            else:
                ops.append(("t", 0))
                enc.terminate(0)
        enc.terminate(1)
        dec = cb.CabacDecoder(st.copy(), mps.copy(), enc.bytes())
        for op in ops:
            if op[0] == "d":
                assert dec.decision(op[1]) == op[2]
            elif op[0] == "b":
                assert dec.bypass() == op[1]
            else:
                assert dec.terminate() == 0
        assert dec.terminate() == 1


def test_p_slice_writer_reader_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(10):
        mbh, mbw = int(rng.integers(1, 4)), int(rng.integers(1, 5))
        qp = int(rng.integers(10, 48))
        n = mbh * mbw
        syn = []
        cs = CabacSlice(qp, False, mbh, mbw)
        z = dict(l=np.zeros((16, 16), np.int32), d=np.zeros(4, np.int32),
                 a=np.zeros((4, 15), np.int32))
        for k in range(n):
            mx, my = k % mbw, k // mbw
            if rng.random() < 0.3:
                cs.p_mb(mx, my, True, np.zeros(2, np.int32), 0, 0,
                        z["l"], z["d"], z["d"], z["a"], z["a"])
                syn.append(None)
            else:
                mvd = rng.integers(-40, 41, 2).astype(np.int32)
                cbp_l = int(rng.integers(0, 16))
                cbp_c = int(rng.integers(0, 3))
                lv = np.zeros((16, 16), np.int32)
                for blk in range(16):
                    if (cbp_l >> (blk // 4)) & 1 and rng.random() < 0.7:
                        pos = rng.choice(16, 3, replace=False)
                        lv[blk, pos] = rng.integers(-30, 31, 3)
                dcu = (rng.integers(-5, 6, 4) * (cbp_c >= 1)).astype(np.int32)
                acu = np.zeros((4, 15), np.int32)
                if cbp_c == 2:
                    acu[0, 2] = 7
                cs.p_mb(mx, my, False, mvd, cbp_l, cbp_c, lv, dcu, dcu,
                        acu, acu)
                syn.append((mvd, cbp_l, cbp_c, lv, dcu, acu))
            cs.end_mb(k == n - 1)
        rd = CabacSliceReader(qp, False, mbh, mbw, cs.payload())
        for k in range(n):
            got = rd.read_p_mb(k % mbw, k // mbw)
            if syn[k] is None:
                assert got["skip"]
            else:
                mvd, cbp_l, cbp_c, lv, dcu, acu = syn[k]
                assert not got["skip"]
                assert np.array_equal(got["mvd"], mvd)
                assert (got["cbp_l"], got["cbp_c"]) == (cbp_l, cbp_c)
                assert np.array_equal(got["levels"], lv)
                assert np.array_equal(got["dc_u"], dcu)
                assert np.array_equal(got["ac_u"], acu)
            assert rd.end_mb() == (1 if k == n - 1 else 0)


X264OPTS = ("cabac=1:ref=1:bframes=0:weightp=0:subme=1:me=dia:trellis=0:"
            "no-deblock=1:keyint=250:aq-mode=0:no-mbtree=1:no-scenecut=1:"
            "no-8x8dct=1:threads=1")


@pytest.mark.parametrize("W,H,qp,seed,opts", [
    (64, 48, 30, 0, ":partitions=none"),   # I16-heavy intra
    (64, 48, 26, 1, ""),                   # I4x4-heavy intra
])
def test_decoder_matches_ffmpeg_on_x264_cabac_intra(W, H, qp, seed, opts):
    rng = np.random.default_rng(seed)
    yuv = np.concatenate([
        rng.integers(0, 256, (H, W), dtype=np.uint8).ravel(),
        rng.integers(0, 256, (H // 2, W // 2), dtype=np.uint8).ravel(),
        rng.integers(0, 256, (H // 2, W // 2), dtype=np.uint8).ravel()])
    bs = oracle.encode_x264(yuv, 1, W, H, qp=qp, x264opts=X264OPTS + opts)
    ff = oracle.decode_h264(bs)
    ours = H264Decoder().decode(bs)
    got = np.concatenate([ours[0].y.ravel(), ours[0].u.ravel(),
                          ours[0].v.ravel()]).astype(np.uint8)
    np.testing.assert_array_equal(got, ff[0])


@pytest.mark.parametrize("W,H,qp,seed", [
    (48, 48, 28, 0), (64, 64, 34, 2),
])
def test_decoder_matches_ffmpeg_on_x264_cabac_inter(W, H, qp, seed):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (H, W))
    frames = []
    for t in range(4):
        y = np.clip(np.roll(base, 2 * t, 1) + rng.integers(-5, 6, (H, W)),
                    0, 255).astype(np.uint8)
        u = rng.integers(0, 256, (H // 2, W // 2), dtype=np.uint8)
        v = rng.integers(0, 256, (H // 2, W // 2), dtype=np.uint8)
        frames.append(np.concatenate([y.ravel(), u.ravel(), v.ravel()]))
    bs = oracle.encode_x264(np.concatenate(frames), 4, W, H, qp=qp,
                            x264opts=X264OPTS + ":partitions=none")
    ff = oracle.decode_h264(bs)
    ours = H264Decoder().decode(bs)
    assert len(ours) == ff.shape[0]
    for t, f in enumerate(ours):
        got = np.concatenate([f.y.ravel(), f.u.ravel(),
                              f.v.ravel()]).astype(np.uint8)
        np.testing.assert_array_equal(got, ff[t])


@pytest.mark.parametrize("deblock", [False, True])
def test_encoder_cabac_conformance(deblock):
    from x264vfw_tpu.encode.ref_encoder import EncoderConfig
    from x264vfw_tpu.encode.tpu_encoder import TpuEncoder

    W, H, N = 96, 64, 5
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (H, W))
    fr = [(np.clip(np.roll(base, 2 * t, 1) + rng.integers(-4, 5, (H, W)),
                   0, 255).astype(np.uint8),
           rng.integers(0, 256, (H // 2, W // 2), dtype=np.uint8),
           rng.integers(0, 256, (H // 2, W // 2), dtype=np.uint8))
          for t in range(N)]
    enc = TpuEncoder(EncoderConfig(width=W, height=H, qp=28, keyint=25,
                                   search_range=8, cabac=True,
                                   deblock=deblock))
    aus = [enc.encode_frame(*f) for f in fr]
    bs = enc.headers() + b"".join(aus)
    er = tuple(np.asarray(p) for p in enc.ref)
    ff = oracle.decode_h264(bs)
    assert ff is not None and ff.shape[0] == N
    assert np.array_equal(ff[-1], np.concatenate([p.ravel() for p in er]))
    ours = H264Decoder().decode(bs)
    assert np.array_equal(er[0], ours[-1].y)
    assert np.array_equal(er[1], ours[-1].u)
    assert np.array_equal(er[2], ours[-1].v)

    # CABAC must beat CAVLC on size at the same syntax
    enc2 = TpuEncoder(EncoderConfig(width=W, height=H, qp=28, keyint=25,
                                    search_range=8, cabac=False,
                                    deblock=deblock))
    sz_cavlc = sum(len(enc2.encode_frame(*f)) for f in fr)
    assert sum(len(a) for a in aus) < sz_cavlc


def test_native_matches_python_writer():
    """tools/cabac C engine must be byte-identical to the Python golden."""
    from x264vfw_tpu.bitstream import cabac_native as cn
    if not cn.available():
        pytest.skip("gcc/native build unavailable")
    rng = np.random.default_rng(7)
    for _ in range(6):
        mbh, mbw = int(rng.integers(1, 4)), int(rng.integers(1, 5))
        qp = int(rng.integers(10, 48))
        n = mbh * mbw
        skip = (rng.random(n) < 0.3).astype(np.uint8)
        mvd = (rng.integers(-40, 41, (n, 2)) * (1 - skip)[:, None]).astype(np.int32)
        cbp_l = (rng.integers(0, 16, n) * (1 - skip)).astype(np.int32)
        cbp_c = (rng.integers(0, 3, n) * (1 - skip)).astype(np.int32)
        levels = np.zeros((n, 16, 16), np.int32)
        quadok = ((cbp_l[:, None] >> (np.arange(16) // 4)) & 1) > 0
        levels[:, :, 2] = np.where(quadok & (rng.random((n, 16)) < 0.6),
                                   rng.integers(-20, 21, (n, 16)), 0)
        dcu = np.where((cbp_c >= 1)[:, None], rng.integers(-5, 6, (n, 4)), 0).astype(np.int32)
        dcv = dcu[:, ::-1].copy()
        acu = np.where((cbp_c == 2)[:, None, None],
                       rng.integers(-3, 4, (n, 4, 15)), 0).astype(np.int32)
        acv = -acu
        cs = CabacSlice(qp, False, mbh, mbw)
        for k in range(n):
            cs.p_mb(k % mbw, k // mbw, bool(skip[k]), mvd[k], int(cbp_l[k]),
                    int(cbp_c[k]), levels[k], dcu[k], dcv[k], acu[k], acv[k])
            cs.end_mb(k == n - 1)
        assert cs.payload() == cn.encode_p_slice(
            qp, 0, mbh, mbw, skip, mvd, cbp_l, cbp_c, levels,
            dcu, dcv, acu, acv)


def test_native_b_slice_matches_python():
    """C engine B-slice output must be byte-identical to the Python golden
    model on random syntax (mode mix incl. direct/skip, both-list mvds)."""
    from x264vfw_tpu.bitstream import cabac_native as cn
    from x264vfw_tpu.bitstream.cabac_slice import CabacSlice
    if not cn.available():
        pytest.skip("native cabac unavailable")
    rng = np.random.default_rng(5)
    for trial in range(4):
        mbh, mbw = 5, 6
        n = mbh * mbw
        mode = rng.integers(0, 4, n).astype(np.int32)
        cbp_l = np.where(rng.random(n) < 0.3, 0,
                         rng.integers(0, 16, n)).astype(np.int32)
        cbp_c = rng.integers(0, 3, n).astype(np.int32)
        skip = ((mode == 0) & (cbp_l == 0) & (cbp_c == 0)).astype(np.uint8)
        mvd0 = rng.integers(-40, 40, (n, 2)).astype(np.int32)
        mvd1 = rng.integers(-40, 40, (n, 2)).astype(np.int32)
        mvd0[(mode == 0) | (mode == 2)] = 0
        mvd1[(mode == 0) | (mode == 1)] = 0
        quad = ((cbp_l[:, None] >> (np.arange(16) // 4)) & 1).astype(bool)
        levels = np.where(quad[:, :, None],
                          rng.integers(-9, 9, (n, 16, 16)), 0).astype(np.int32)
        dc_u = np.where((cbp_c >= 1)[:, None],
                        rng.integers(-5, 5, (n, 4)), 0).astype(np.int32)
        dc_v = np.where((cbp_c >= 1)[:, None],
                        rng.integers(-5, 5, (n, 4)), 0).astype(np.int32)
        ac_u = np.where((cbp_c == 2)[:, None, None],
                        rng.integers(-5, 5, (n, 4, 15)), 0).astype(np.int32)
        ac_v = np.where((cbp_c == 2)[:, None, None],
                        rng.integers(-5, 5, (n, 4, 15)), 0).astype(np.int32)
        qp = int(rng.integers(10, 45))
        native = cn.encode_b_slice(qp, 0, mbh, mbw, skip, mode, mvd0, mvd1,
                                   cbp_l, cbp_c, levels, dc_u, dc_v,
                                   ac_u, ac_v)
        cs = CabacSlice(qp, False, mbh, mbw)
        for k in range(n):
            cs.b_mb(k % mbw, k // mbw, bool(skip[k]), int(mode[k]), mvd0[k],
                    mvd1[k], int(cbp_l[k]), int(cbp_c[k]), levels[k],
                    dc_u[k], dc_v[k], ac_u[k], ac_v[k])
            cs.end_mb(k == n - 1)
        assert native == cs.payload()


def test_native_i4_slice_matches_python():
    """Mixed I16/I_NxN I-slice: the C coder must be byte-identical to the
    Python golden model (mb_type bin 0, pred-mode bins ctx 68/69, intra
    CBP me(), conditional qp_delta, LumaLevel4x4 residual)."""
    from x264vfw_tpu.bitstream import cabac_native as cn
    from x264vfw_tpu.bitstream.cabac_slice import CabacSlice
    if not cn.available():
        import pytest
        pytest.skip("native coder unavailable")
    rng = np.random.default_rng(11)
    for trial in range(4):
        mbh, mbw = int(rng.integers(2, 5)), int(rng.integers(2, 7))
        n = mbh * mbw
        use_i4 = rng.random(n) < 0.6
        i16m = rng.integers(0, 4, n).astype(np.int32)
        cmode = rng.integers(0, 4, n).astype(np.int32)
        acf = (rng.random(n) < 0.5).astype(np.uint8)
        cbc = rng.integers(0, 3, n).astype(np.int32)

        def lv(shape, density=0.3):
            a = rng.integers(-8, 9, shape).astype(np.int32)
            return np.where(rng.random(shape) < density, a, 0)

        dc = lv((n, 16))
        ac = np.where(acf[:, None, None].astype(bool), lv((n, 16, 15)), 0)
        dcu = np.where((cbc >= 1)[:, None], lv((n, 4)), 0)
        dcv = np.where((cbc >= 1)[:, None], lv((n, 4)), 0)
        acu = np.where((cbc == 2)[:, None, None], lv((n, 4, 15)), 0)
        acv = np.where((cbc == 2)[:, None, None], lv((n, 4, 15)), 0)
        cbp4 = rng.integers(0, 16, n).astype(np.int32)
        quad = ((cbp4[:, None] >> (np.arange(16) // 4)) & 1).astype(bool)
        lvl4 = np.where(quad[:, :, None], lv((n, 16, 16)), 0)
        prevs = rng.random((n, 16)) < 0.5
        rems = rng.integers(0, 8, (n, 16)).astype(np.int32)
        qp = int(rng.integers(10, 45))
        native = cn.encode_i_slice(qp, mbh, mbw, i16m, cmode, acf, cbc,
                                   dc, ac, dcu, dcv, acu, acv,
                                   use_i4=use_i4.astype(np.uint8),
                                   i4_prev=prevs.astype(np.uint8),
                                   i4_rem=rems, cbp4=cbp4, levels4=lvl4)
        cs = CabacSlice(qp, True, mbh, mbw)
        for k in range(n):
            if use_i4[k]:
                cs.i4_mb(k % mbw, k // mbw, prevs[k], rems[k],
                         int(cmode[k]), int(cbp4[k]), int(cbc[k]), lvl4[k],
                         dcu[k], dcv[k], acu[k], acv[k])
            else:
                cs.i16_mb(k % mbw, k // mbw, int(i16m[k]), int(cmode[k]),
                          bool(acf[k]), int(cbc[k]), dc[k], ac[k],
                          dcu[k], dcv[k], acu[k], acv[k])
            cs.end_mb(k == n - 1)
        assert native == cs.payload(), f"trial {trial}"
