"""Config system: preset/tune/profile/level resolution + option parsing."""

import pytest

from x264vfw_tpu.config.options import parse_cmdline
from x264vfw_tpu.config.params import EncoderParams
from x264vfw_tpu.config.presets import resolve, auto_level
from x264vfw_tpu.config import persist


def test_preset_ladder_monotone_effort():
    subs = []
    refs = []
    for preset in ("ultrafast", "veryfast", "medium", "veryslow"):
        p, _ = resolve(preset=preset)
        subs.append(p.subme)
        refs.append(p.ref)
    assert subs == sorted(subs)
    assert refs == sorted(refs)


def test_ultrafast_matches_x264_semantics():
    p, _ = resolve(preset="ultrafast")
    assert not p.cabac and not p.deblock and p.bframes == 0
    assert p.partitions == "none" and p.me == "dia" and p.subme == 0
    assert p.ref == 1 and p.trellis == 0 and not p.mbtree


def test_tune_zerolatency():
    p, _ = resolve(preset="medium", tune="zerolatency")
    assert p.bframes == 0 and p.rc_lookahead == 0 and not p.mbtree


def test_tune_animation_multiplies_refs():
    base, _ = resolve(preset="medium")
    p, _ = resolve(preset="medium", tune="animation")
    assert p.ref == base.ref * 2
    assert p.bframes == base.bframes + 2


def test_profile_clamps():
    p, _ = resolve(preset="medium", profile="baseline")
    assert not p.cabac and p.bframes == 0 and not p.dct8x8 and p.weightp == 0
    p, _ = resolve(preset="medium", profile="main")
    assert p.cabac and not p.dct8x8


def test_level_auto_and_dpb_clamp():
    p = EncoderParams(width=1920, height=1080, fps_num=30)
    assert auto_level(p) == 40
    p, warns = resolve(preset="veryslow",
                       overrides=dict(width=1920, height=1080, fps_num=30))
    # veryslow wants ref 16; level 4.0 DPB (32768 mbs) / 8160 mbs -> 4 refs
    assert p.ref == 4
    assert any("DPB" in w for w in warns)


def test_parse_cmdline_two_phase():
    # overrides must win over preset regardless of order
    p, warns = parse_cmdline("--ref 5 --preset ultrafast --qp 30")
    assert p.ref == 5            # override survives preset (two-phase)
    assert p.subme == 0          # from ultrafast
    assert p.rc_mode == "cqp" and p.qp == 30


def test_parse_cmdline_forms():
    p, _ = parse_cmdline("--crf=19.5 --no-cabac --deblock -2:-1 --fps 30000/1001 --sar 4:3")
    assert p.rc_mode == "crf" and p.crf == 19.5
    assert not p.cabac
    assert p.deblock and (p.deblock_alpha, p.deblock_beta) == (-2, -1)
    assert (p.fps_num, p.fps_den) == (30000, 1001)
    assert (p.sar_width, p.sar_height) == (4, 3)


def test_parse_unknown_option_warns_not_raises():
    p, warns = parse_cmdline("--frobnicate 7 --qp 20")
    assert p.qp == 20
    assert any("frobnicate" in w for w in warns)


def test_parse_level_forms():
    assert parse_cmdline("--level 3.1")[0].level_idc == 31
    assert parse_cmdline("--level 31")[0].level_idc == 31
    assert parse_cmdline("--level 4")[0].level_idc == 40


def test_validation_clamps():
    p, warns = parse_cmdline("--qp 99")
    assert p.qp == 51 and any("clamp" in w for w in warns)


def test_persist_roundtrip(tmp_path):
    path = str(tmp_path / "cfg.json")
    p, _ = resolve(preset="slow", overrides=dict(crf=20.0, ref=4))
    persist.save(p, path)
    q, warns = persist.load(path)
    assert q == p and not warns


def test_persist_missing_file(tmp_path):
    q, warns = persist.load(str(tmp_path / "nope.json"))
    assert q == EncoderParams() and not warns


def test_fullhelp_covers_every_option():
    from x264vfw_tpu.config.options import OPTION_TABLE, fullhelp
    text = fullhelp()
    for name in OPTION_TABLE:
        assert f"--{name}" in text
    assert "Presets:" in text and "ultrafast" in text
