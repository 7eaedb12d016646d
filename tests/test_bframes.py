"""B-frame encoding: structure, conformance via stock FFmpeg, muxing.

Covers the reference's --bframes capability (option forward at
/root/reference/codec.c:843-847) rebuilt as the TPU GOP scheduler:
display-order push -> decode-order AUs (IDR/P anchors + non-ref B),
POC type 0, spatial direct + B_Skip flips.
"""

import numpy as np
import pytest

import oracle
from x264vfw_tpu.api import CompressSession
from x264vfw_tpu.config.params import EncoderParams
from x264vfw_tpu.encode.ref_encoder import EncoderConfig
from x264vfw_tpu.encode.tpu_encoder import TpuEncoder


def _planes(clip, f, w, h):
    y = clip[f, :w * h].reshape(h, w)
    u = clip[f, w * h:w * h + w * h // 4].reshape(h // 2, w // 2)
    v = clip[f, w * h + w * h // 4:].reshape(h // 2, w // 2)
    return y, u, v


def _encode_clip(w, h, n, bframes, qp=28, keyint=50, motion=True):
    clip = oracle.make_test_clip(w, h, n, motion=motion)
    enc = TpuEncoder(EncoderConfig(width=w, height=h, qp=qp, keyint=keyint,
                                   bframes=bframes, search_range=8,
                                   me_backend="xla"))
    outs = []
    for f in range(n):
        outs += enc.push_frame(*_planes(clip, f, w, h))
    outs += enc.flush()
    return clip, outs


def test_bframes_conformance_and_order():
    w, h, n = 96, 80, 10
    clip, outs = _encode_clip(w, h, n, bframes=2)
    # decode order: display indices come back permuted (anchor before Bs)
    disp = [d for (_, d, _) in outs]
    assert sorted(disp) == list(range(n))
    assert disp != list(range(n))  # reordering actually happened
    bs = b"".join(a for (a, _, _) in outs)
    dec = oracle.decode_h264_planes(bs)
    assert dec is not None, "stock FFmpeg must decode the B stream"
    ys, us, vs = dec
    assert ys.shape[0] == n
    for f in range(n):
        y, u, v = _planes(clip, f, w, h)
        assert oracle.psnr(y, ys[f]) > 30.0, f"frame {f} luma"
        assert oracle.psnr(u, us[f]) > 32.0, f"frame {f} u"
        assert oracle.psnr(v, vs[f]) > 32.0, f"frame {f} v"


def test_bframes_odd_geometry():
    w, h, n = 90, 70, 6
    clip, outs = _encode_clip(w, h, n, bframes=1)
    bs = b"".join(a for (a, _, _) in outs)
    dec = oracle.decode_h264_planes(bs)
    assert dec is not None
    ys, _, _ = dec
    assert ys.shape == (n, h, w)
    for f in range(n):
        y, _, _ = _planes(clip, f, w, h)
        assert oracle.psnr(y, ys[f]) > 30.0


def test_bframes_collapse_to_skip_on_static_content():
    """Truly static content: the spatial-direct colZero flip rule must fire
    and fold B MBs into B_Skip runs (tiny AUs)."""
    w, h, n = 96, 80, 7
    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    enc = TpuEncoder(EncoderConfig(width=w, height=h, qp=28, keyint=50,
                                   bframes=2, search_range=8,
                                   me_backend="xla"))
    outs = []
    for _ in range(n):
        outs += enc.push_frame(y, u, v)
    outs += enc.flush()
    b_aus = [(d, a) for (a, d, k) in outs if (a[4] >> 5) == 0]
    assert b_aus, "no B AUs emitted"
    # all B AUs tiny; from the second mini-GOP on (identical refs ->
    # uniform usage -> the uni-direct flip rule applies) B slices collapse
    # to header + one skip run
    assert max(len(a) for (_, a) in b_aus) < 64, [(d, len(a)) for d, a in b_aus]
    late = [a for (d, a) in b_aus if d >= 4]
    assert late and max(len(a) for a in late) < 24, \
        [(d, len(a)) for d, a in b_aus]
    bs = b"".join(a for (a, _, _) in outs)
    dec = oracle.decode_h264_planes(bs)
    assert dec is not None
    ys, _, _ = dec
    for f in range(n):
        assert oracle.psnr(y, ys[f]) > 30.0


def test_bframes_header_conventions():
    """frame_num / POC / nal_ref_idc conventions match x264's
    (non-ref B: frame_num = PrevRefFrameNum + 1, POC = 2*display)."""
    from x264vfw_tpu.bitstream.nal import iter_annexb_raw
    from x264vfw_tpu.bitstream.params import SPS, PPS
    from x264vfw_tpu.bitstream.slice import SliceHeader
    from x264vfw_tpu.utils.bitstream import BitReader, unescape_ebsp

    w, h, n = 96, 80, 8
    _, outs = _encode_clip(w, h, n, bframes=2)
    bs = b"".join(a for (a, _, _) in outs)
    sps = pps = None
    got = []
    for nal in iter_annexb_raw(bs):
        t = nal[0] & 0x1F
        ri = (nal[0] >> 5) & 3
        rbsp = unescape_ebsp(np.frombuffer(nal[1:], np.uint8))
        if t == 7:
            sps = SPS.from_rbsp(rbsp)
        elif t == 8:
            pps = PPS.from_rbsp(rbsp)
        elif t in (1, 5):
            hdr = SliceHeader.parse(BitReader(rbsp), sps, pps, t, ri)
            got.append((hdr.type, ri, hdr.frame_num, hdr.pic_order_cnt_lsb))
    assert sps.pic_order_cnt_type == 0
    assert sps.max_num_ref_frames == 2
    # decode order: I0 P3 B1 B2 P6 B4 B5 P7(flush)
    #   slice types: 2=I, 0=P, 1=B
    types = [t for (t, _, _, _) in got]
    assert types == [2, 0, 1, 1, 0, 1, 1, 0]
    # non-ref B between anchors fn=k,k+1 carries k+1; refs count 0,1,2,3
    assert [fn for (_, _, fn, _) in got] == [0, 1, 2, 2, 2, 3, 3, 3]
    assert [ri for (_, ri, _, _) in got][0] == 3
    assert all(ri == 0 for (t, ri, _, _) in got if t == 1)   # B non-ref
    assert [p for (_, _, _, p) in got] == [0, 6, 2, 4, 12, 8, 10, 14]


def test_session_bframes_mkv_mp4(tmp_path):
    """Session + muxer path with B reordering: container decode must
    reproduce the elementary stream bit-exactly (dts/ctts correct)."""
    w, h, n = 96, 80, 9
    clip = oracle.make_test_clip(w, h, n)
    for ext in ("mkv", "mp4"):
        path = str(tmp_path / f"b.{ext}")
        s = CompressSession(EncoderParams(rc_mode="cqp", qp=28, keyint=50,
                                          bframes=2, merange=8))
        s.begin(w, h, output=path)
        bs = b""
        for f in range(n):
            bs += s.compress(_planes(clip, f, w, h))
        stats = s.end()
        bs += stats["tail"]
        raw = oracle.decode_h264_planes(bs)
        assert raw is not None
        got = oracle.decode_container(path)
        assert got is not None, f"{ext} demux+decode failed"
        cy, cu, cv = got[0], got[1], got[2]
        assert cy.shape[0] == n
        assert np.array_equal(cy, raw[0])
        assert np.array_equal(cu, raw[1])
        assert np.array_equal(cv, raw[2])


def test_cabac_bframes_conformance():
    """CABAC B slices (benchmark config 2 entropy): stock FFmpeg and the
    native decoder must both decode our stream, bit-identically."""
    from x264vfw_tpu.decode.decoder import H264Decoder
    w, h, n = 96, 80, 10
    clip = oracle.make_test_clip(w, h, n)
    enc = TpuEncoder(EncoderConfig(width=w, height=h, qp=28, keyint=50,
                                   bframes=2, search_range=8,
                                   me_backend="xla", cabac=True))
    outs = []
    for f in range(n):
        outs += enc.push_frame(*_planes(clip, f, w, h))
    outs += enc.flush()
    bs = b"".join(a for (a, _, _) in outs)
    dec = oracle.decode_h264_planes(bs)
    assert dec is not None
    ys, us, vs = dec
    assert ys.shape[0] == n
    nd = H264Decoder()
    nd.decode(bs)
    ours = nd.display_order()
    for i, f in enumerate(ours):
        assert np.array_equal(np.asarray(f.y), ys[i])
        assert np.array_equal(np.asarray(f.u), us[i])
        assert np.array_equal(np.asarray(f.v), vs[i])
    for f in range(n):
        y, _, _ = _planes(clip, f, w, h)
        assert oracle.psnr(y, ys[f]) > 30.0
