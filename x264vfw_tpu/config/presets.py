"""Preset / tune / profile / level resolution.

Reproduces the semantics of x264's param_default_preset / param_apply_profile
chain that the reference drives (/root/reference/codec.c:1419-1606): preset
and tune apply before user overrides; profile and level clamp after.
Preset deltas follow x264's documented tables.
"""

from __future__ import annotations

from .params import EncoderParams, PRESETS, PROFILES, TUNES

# (max_frame_size_mbs, max_mb_per_sec, max_bitrate_kbps_high, max_dpb_mbs)
# ITU-T H.264 Table A-1 columns needed for level selection + DPB clamping
# (the reference clamps ref frames to the level's DPB, codec.c:1592-1606).
LEVELS = {
    10: (99, 1485, 80, 396),
    11: (396, 3000, 240, 900),
    12: (396, 6000, 480, 2376),
    13: (396, 11880, 960, 2376),
    20: (396, 11880, 2500, 2376),
    21: (792, 19800, 5000, 4752),
    22: (1620, 20250, 5000, 8100),
    30: (1620, 40500, 12500, 8100),
    31: (3600, 108000, 17500, 18000),
    32: (5120, 216000, 25000, 20480),
    40: (8192, 245760, 25000, 32768),
    41: (8192, 245760, 62500, 32768),
    42: (8704, 522240, 62500, 34816),
    50: (22080, 589824, 168750, 110400),
    51: (36864, 983040, 300000, 184320),
    52: (36864, 2073600, 300000, 184320),
}

_PRESET_DELTAS: dict[str, dict] = {
    "ultrafast": dict(dct8x8=False, aq_mode=0, b_adapt=0, bframes=0,
                      cabac=False, deblock=False, me="dia", mbtree=False,
                      partitions="none", rc_lookahead=0, ref=1, scenecut=0,
                      subme=0, trellis=0, weightb=False, weightp=0,
                      mixed_refs=False),
    "superfast": dict(me="dia", mbtree=False, partitions="i8x8,i4x4",
                      rc_lookahead=0, ref=1, subme=1, trellis=0, weightp=1,
                      mixed_refs=False),
    "veryfast": dict(me="hex", rc_lookahead=10, ref=1, subme=2, trellis=0,
                     weightp=1, mixed_refs=False),
    "faster": dict(mixed_refs=False, rc_lookahead=20, ref=2, subme=4,
                   weightp=1),
    "fast": dict(rc_lookahead=30, ref=2, subme=6, weightp=1),
    "medium": dict(),
    "slow": dict(b_adapt=2, direct="auto", me="umh", rc_lookahead=50, ref=5,
                 subme=8, trellis=2),
    "slower": dict(b_adapt=2, direct="auto", me="umh", partitions="all",
                   rc_lookahead=60, ref=8, subme=9, trellis=2),
    "veryslow": dict(b_adapt=2, bframes=8, direct="auto", me="umh",
                     merange=24, partitions="all", rc_lookahead=60, ref=16,
                     subme=10, trellis=2),
    "placebo": dict(b_adapt=2, bframes=16, direct="auto", me="tesa",
                    merange=24, partitions="all", rc_lookahead=60, ref=16,
                    subme=11, trellis=2, fast_pskip=False),
}

_TUNE_DELTAS: dict[str, dict] = {
    "film": dict(deblock_alpha=-1, deblock_beta=-1, psy_trellis=0.15),
    "animation": dict(deblock_alpha=1, deblock_beta=1, psy_rd=0.4,
                      aq_strength=0.6, _ref_mult=2, _bframes_plus=2),
    "grain": dict(aq_strength=0.5, dct_decimate=False, deblock_alpha=-2,
                  deblock_beta=-2, ipratio=1.1, pbratio=1.1, psy_trellis=0.25,
                  qcomp=0.8),
    "stillimage": dict(aq_strength=1.2, deblock_alpha=-3, deblock_beta=-3,
                       psy_rd=2.0, psy_trellis=0.7),
    "psnr": dict(aq_mode=0, psy_rd=0.0, psy_trellis=0.0),
    "ssim": dict(aq_mode=2, psy_rd=0.0, psy_trellis=0.0),
    "fastdecode": dict(cabac=False, deblock=False, weightb=False, weightp=0),
    "zerolatency": dict(bframes=0, mbtree=False, sync_lookahead=0,
                        sliced_threads=True, rc_lookahead=0),
}


def apply_preset_tune(p: EncoderParams, preset: str | None,
                      tune: str | None) -> EncoderParams:
    """defaults + preset + tune (before user overrides)."""
    if preset:
        if preset not in PRESETS:
            raise ValueError(f"unknown preset '{preset}'")
        for k, v in _PRESET_DELTAS[preset].items():
            setattr(p, k, v)
    if tune:
        for t in tune.split(","):
            t = t.strip()
            if not t:
                continue
            if t not in TUNES:
                raise ValueError(f"unknown tune '{t}'")
            for k, v in _TUNE_DELTAS[t].items():
                if k == "_ref_mult":
                    p.ref = max(1, p.ref * v)
                elif k == "_bframes_plus":
                    p.bframes += v
                else:
                    setattr(p, k, v)
    return p


def apply_profile(p: EncoderParams, profile: str | None) -> EncoderParams:
    """Clamp to profile constraints (x264_param_apply_profile semantics)."""
    if not profile:
        profile = p.profile
    profile = profile.lower()
    if profile not in PROFILES:
        raise ValueError(f"unsupported profile '{profile}' (8-bit 4:2:0 only)")
    p.profile = profile
    if profile == "baseline":
        p.cabac = False
        p.bframes = 0
        p.dct8x8 = False
        p.weightp = 0
        p.interlaced = False
    elif profile == "main":
        p.dct8x8 = False
    return p


def auto_level(p: EncoderParams) -> int:
    """Pick the minimal level for the configured geometry/rate."""
    mbs = ((p.width + 15) // 16) * ((p.height + 15) // 16)
    mbps = mbs * p.fps_num / max(1, p.fps_den)
    for lv, (max_fs, max_mbps, _, _) in sorted(LEVELS.items()):
        if mbs <= max_fs and mbps <= max_mbps:
            return lv
    return 52


def apply_level(p: EncoderParams) -> tuple[EncoderParams, list[str]]:
    """Resolve level + clamp DPB refs to the level (codec.c:1592-1606)."""
    warns = []
    lv = p.level_idc or auto_level(p)
    if lv not in LEVELS:
        warns.append(f"unknown level {lv}, auto-selecting")
        lv = auto_level(p)
    p.level_idc = lv
    mbs = ((p.width + 15) // 16) * ((p.height + 15) // 16)
    if mbs:
        dpb_mbs = LEVELS[lv][3]
        max_refs = max(1, min(16, dpb_mbs // mbs))
        if p.ref > max_refs:
            warns.append(f"ref {p.ref} exceeds level {lv/10:.1f} DPB, "
                         f"clamped to {max_refs}")
            p.ref = max_refs
    return p, warns


def resolve(preset: str | None = None, tune: str | None = None,
            profile: str | None = None, overrides: dict | None = None,
            base: EncoderParams | None = None) -> tuple[EncoderParams, list[str]]:
    """Full precedence chain -> (params, warnings)."""
    p = base.copy() if base else EncoderParams()
    apply_preset_tune(p, preset, tune)
    if overrides:
        for k, v in overrides.items():
            if not hasattr(p, k):
                raise ValueError(f"unknown parameter '{k}'")
            setattr(p, k, v)
    apply_profile(p, profile)
    warns = p.validate()
    p, w2 = apply_level(p)
    return p, warns + w2
