"""Bit-plumbing unit tests: pack/exp-Golomb/escaping/NAL framing."""

import numpy as np
import pytest

from x264vfw_tpu.utils.bitstream import (
    BitReader,
    BitWriter,
    escape_ebsp,
    pack_codes,
    se_code,
    se_codes,
    ue_code,
    ue_codes,
    unescape_ebsp,
)
from x264vfw_tpu.bitstream.nal import (
    NAL_SPS,
    annexb_to_avcc,
    avcc_to_annexb,
    split_annexb,
    wrap_nal,
)


def test_pack_codes_simple():
    # 1010 | 1 | 0000001  -> 10101000 0001xxxx
    data, total = pack_codes(np.array([0b1010, 1, 1]), np.array([4, 1, 7]))
    assert total == 12
    assert data.tobytes() == bytes([0b10101000, 0b00010000])


def test_pack_codes_empty_and_zero_len():
    data, total = pack_codes(np.array([5, 0, 7]), np.array([3, 0, 3]))
    assert total == 6
    assert data.tobytes() == bytes([0b10111100])


def test_ue_codes_match_scalar():
    vs = np.arange(0, 100000, 37)
    vals, lens = ue_codes(vs)
    for i, v in enumerate(vs):
        sv, sl = ue_code(int(v))
        assert vals[i] == sv and lens[i] == sl


def test_se_codes_match_scalar():
    vs = np.arange(-5000, 5000, 13)
    vals, lens = se_codes(vs)
    for i, v in enumerate(vs):
        sv, sl = se_code(int(v))
        assert vals[i] == sv and lens[i] == sl


def test_expgolomb_roundtrip():
    w = BitWriter()
    values = [0, 1, 2, 3, 7, 255, 65535, 123456]
    for v in values:
        w.ue(v)
    svalues = [0, 1, -1, 2, -2, 100, -100, 32767, -32768]
    for v in svalues:
        w.se(v)
    w.rbsp_trailing_bits()
    r = BitReader(w.to_rbsp())
    for v in values:
        assert r.ue() == v
    for v in svalues:
        assert r.se() == v


def test_bitreader_u():
    w = BitWriter()
    w.u(3, 5)
    w.u(13, 4097)
    w.u(32, 0xDEADBEEF)
    w.u(1, 1)
    w.rbsp_trailing_bits()
    r = BitReader(w.to_rbsp())
    assert r.u(3) == 5
    assert r.u(13) == 4097
    assert r.u(32) == 0xDEADBEEF
    assert r.u(1) == 1


@pytest.mark.parametrize("raw,expected", [
    (b"\x00\x00\x00", b"\x00\x00\x03\x00"),
    (b"\x00\x00\x01", b"\x00\x00\x03\x01"),
    (b"\x00\x00\x02", b"\x00\x00\x03\x02"),
    (b"\x00\x00\x03", b"\x00\x00\x03\x03"),
    (b"\x00\x00\x04", b"\x00\x00\x04"),
    (b"\x00\x00\x00\x00\x00", b"\x00\x00\x03\x00\x00\x03\x00"),
    (b"\xff\x00\x00\x00\xff", b"\xff\x00\x00\x03\x00\xff"),
    (b"", b""),
])
def test_escape_ebsp(raw, expected):
    assert escape_ebsp(raw) == expected
    assert unescape_ebsp(expected).tobytes() == raw


def test_escape_roundtrip_random():
    rng = np.random.default_rng(0)
    for _ in range(50):
        # biased toward zeros to hit escape paths
        raw = rng.choice([0, 0, 0, 1, 2, 3, 255], size=rng.integers(0, 200)).astype(np.uint8)
        esc = escape_ebsp(raw)
        assert unescape_ebsp(esc).tobytes() == raw.tobytes()
        # escaped stream must not contain 00 00 0[0-2] (00 00 03 is the
        # emulation-prevention pattern itself and is legal)
        e = np.frombuffer(esc, dtype=np.uint8)
        if e.size >= 3:
            bad = (e[:-2] == 0) & (e[1:-1] == 0) & (e[2:] <= 2)
            assert not bad.any()


def test_nal_wrap_split():
    payload = bytes([0x42, 0x00, 0x00, 0x00, 0x01, 0x99])
    nal = wrap_nal(3, NAL_SPS, payload)
    assert nal.startswith(b"\x00\x00\x00\x01")
    units = split_annexb(nal)
    assert len(units) == 1
    assert units[0].nal_unit_type == NAL_SPS
    assert units[0].nal_ref_idc == 3
    assert units[0].rbsp.tobytes() == payload


def test_annexb_multi_nal_and_avcc():
    n1 = wrap_nal(3, 7, b"\x11\x22")
    n2 = wrap_nal(3, 8, b"\x33", long_start_code=False)
    n3 = wrap_nal(2, 1, b"\x44" * 10)
    stream = n1 + n2 + n3
    units = split_annexb(stream)
    assert [u.nal_unit_type for u in units] == [7, 8, 1]
    avcc = annexb_to_avcc(stream)
    back = avcc_to_annexb(avcc)
    assert [u.nal_unit_type for u in split_annexb(back)] == [7, 8, 1]
    assert split_annexb(back)[2].rbsp.tobytes() == b"\x44" * 10
