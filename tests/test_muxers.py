"""Muxer validation: mux our encoder's H.264 into each container, then
demux+decode with stock libavformat/FFmpeg — frames must match the raw
stream decode, and stream metadata (fps, duration) must be sane."""

import numpy as np
import pytest

import oracle
from x264vfw_tpu.bitstream.nal import split_annexb, NAL_SPS, NAL_PPS
from x264vfw_tpu.bitstream.params import SPS
from x264vfw_tpu.output.base import MuxParams, select_muxer
from x264vfw_tpu.utils.bitstream import escape_ebsp
from x264vfw_tpu.encode.ref_encoder import EncoderConfig
from x264vfw_tpu.encode.tpu_encoder import TpuEncoder


@pytest.fixture(scope="module")
def stream():
    """(annexb bytes, per-frame payloads, sps, pps, w, h, frames decoded)."""
    w, h, n = 64, 48, 6
    clip = oracle.make_test_clip(w, h, n, seed=17)
    enc = TpuEncoder(EncoderConfig(width=w, height=h, qp=26, keyint=4,
                                   search_range=4))
    fsz, csz = w * h, w * h // 4
    per_frame = []
    for i in range(n):
        y = clip[i, :fsz].reshape(h, w)
        u = clip[i, fsz:fsz + csz].reshape(h // 2, w // 2)
        v = clip[i, fsz + csz:].reshape(h // 2, w // 2)
        per_frame.append(enc.encode_frame(y, u, v))
    bs = b"".join(per_frame)
    ref = oracle.decode_h264_planes(bs)
    assert ref is not None
    # raw NAL payloads (with NAL header byte, escaped) for avcC
    sps_nal = pps_nal = None
    for nal in split_annexb(bs):
        full = bytes([(nal.nal_ref_idc << 5) | nal.nal_unit_type]) \
            + escape_ebsp(nal.rbsp)
        if nal.nal_unit_type == NAL_SPS:
            sps_nal = full
        elif nal.nal_unit_type == NAL_PPS:
            pps_nal = full
    return per_frame, sps_nal, pps_nal, w, h, ref


def _strip_headers(frame_bytes: bytes) -> tuple[bytes, bool]:
    """Remove SPS/PPS NALs from an access unit; return (slices, keyframe)."""
    from x264vfw_tpu.bitstream.nal import iter_annexb_raw, START_CODE_LONG
    out = b""
    key = False
    for nal in iter_annexb_raw(frame_bytes):
        t = nal[0] & 0x1F
        if t in (7, 8):
            continue
        if t == 5:
            key = True
        out += START_CODE_LONG + nal
    return out, key


def mux_to(tmp_path, ext, stream, fps=(25, 1)):
    per_frame, sps_nal, pps_nal, w, h, ref = stream
    path = str(tmp_path / f"out.{ext}")
    m = select_muxer(path)
    assert m.name == ext or ext in ("264",)
    m.open_file(path)
    m.set_param(MuxParams(width=w, height=h, fps_num=fps[0], fps_den=fps[1],
                          timebase_num=fps[1], timebase_den=fps[0]))
    m.write_headers(sps_nal, pps_nal)
    largest = second = 0
    for i, fb in enumerate(per_frame):
        payload, key = _strip_headers(fb)
        m.write_frame(payload, pts=i, dts=i, keyframe=key)
        if i > 0:
            second = largest
        largest = i
    m.close_file(largest, second)
    return path


@pytest.mark.parametrize("ext", ["264", "mkv", "flv", "mp4", "avi"])
def test_container_roundtrip(ext, stream, tmp_path):
    per_frame, sps_nal, pps_nal, w, h, ref = stream
    path = mux_to(tmp_path, ext, stream)
    out = oracle.decode_container(path)
    assert out is not None, f"FFmpeg could not read our .{ext}"
    y, u, v, dur, fps = out
    ry, ru, rv = ref
    assert y.shape[0] == len(per_frame), f"{ext}: frame count"
    np.testing.assert_array_equal(y, ry, err_msg=f"{ext} luma")
    np.testing.assert_array_equal(u, ru, err_msg=f"{ext} cb")
    np.testing.assert_array_equal(v, rv, err_msg=f"{ext} cr")
    if ext in ("mkv", "mp4", "flv"):
        assert 0.1 < dur < 2.0, f"{ext}: duration {dur}"
    if ext in ("mkv", "mp4", "avi"):
        assert abs(fps - 25.0) < 1.5, f"{ext}: fps {fps}"


def test_mkv_cluster_split(stream, tmp_path):
    """Force cluster split via >32s timecode delta."""
    per_frame, sps_nal, pps_nal, w, h, ref = stream
    path = str(tmp_path / "split.mkv")
    m = select_muxer(path)
    m.open_file(path)
    m.set_param(MuxParams(width=w, height=h, fps_num=1, fps_den=1,
                          timebase_num=1, timebase_den=1))
    m.write_headers(sps_nal, pps_nal)
    for i, fb in enumerate(per_frame):
        payload, key = _strip_headers(fb)
        m.write_frame(payload, pts=i * 20, dts=i * 20, keyframe=key)
    m.close_file(100, 80)
    out = oracle.decode_container(path)
    assert out is not None and out[0].shape[0] == len(per_frame)


def test_mp4_fragmented_nonseekable(stream, tmp_path):
    """Non-seekable target switches to moof/mdat fragments (the reference
    forces L-SMASH fragmented mode for non-regular files,
    mp4_lsmash.c:199,206-207,428-434) and stock FFmpeg decodes it."""
    per_frame, sps_nal, pps_nal, w, h, ref = stream
    path = str(tmp_path / "frag.mp4")

    class PipeLike:
        """File object that refuses to seek, like a pipe/socket."""
        def __init__(self, f):
            self._f = f
        def write(self, b):
            return self._f.write(b)
        def seekable(self):
            return False
        def seek(self, *a):
            raise OSError("not seekable")
        def close(self):
            self._f.close()

    from x264vfw_tpu.output.mp4 import Mp4Muxer
    m = Mp4Muxer()
    with open(path, "wb") as raw:
        m.open_file(PipeLike(raw))
        m.set_param(MuxParams(width=w, height=h, fps_num=25, fps_den=1,
                              timebase_num=1, timebase_den=25))
        m.write_headers(sps_nal, pps_nal)
        for i, fb in enumerate(per_frame):
            payload, key = _strip_headers(fb)
            m.write_frame(payload, pts=i, dts=i, keyframe=key)
        m.close_file(len(per_frame) - 1, len(per_frame) - 2)
    assert m.fragmented is True
    data = open(path, "rb").read()
    assert b"moof" in data and b"mvex" in data and b"trex" in data

    out = oracle.decode_container(path)
    assert out is not None, "FFmpeg could not read fragmented mp4"
    y, u, v, dur, fps = out
    ry, ru, rv = ref
    assert y.shape[0] == len(per_frame)
    np.testing.assert_array_equal(y, ry)
    np.testing.assert_array_equal(u, ru)
    np.testing.assert_array_equal(v, rv)

    # truncated mid-last-fragment: earlier complete fragments still decode
    cut = data.rfind(b"moof") - 4
    trunc = str(tmp_path / "trunc.mp4")
    open(trunc, "wb").write(data[:cut])
    out2 = oracle.decode_container(trunc)
    assert out2 is not None and 0 < out2[0].shape[0] < len(per_frame)
