"""Encoder parameter set — the x264_param_t / CONFIG-struct equivalent.

Mirrors the configuration surface the reference exposes through its GUI +
registry + extra command line (/root/reference/x264vfw.h:121-167 CONFIG,
codec.c:831-999 option table).  Every field is an x264-compatible knob;
fields not yet honored by the TPU pipeline are carried, validated and
resolved (so configs round-trip); the option engine warns when one of
those is used (config/options.py ACCEPTED_IGNORED).

Precedence chain (matching the reference, SURVEY.md §5 config system):
    defaults -> preset -> tune -> user fields/flags -> profile clamp ->
    level clamp.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields, replace

# rate-control modes (x264vfw's 7 GUI modes collapse onto these 5 + 2-pass
# pass selection, /root/reference/codec.c:1490-1541)
RC_CQP = "cqp"
RC_CRF = "crf"
RC_ABR = "abr"
RC_2PASS1 = "pass1"
RC_2PASS2 = "pass2"

ME_DIA = "dia"
ME_HEX = "hex"
ME_UMH = "umh"
ME_ESA = "esa"
ME_TESA = "tesa"

PROFILES = ("baseline", "main", "high")
PRESETS = ("ultrafast", "superfast", "veryfast", "faster", "fast",
           "medium", "slow", "slower", "veryslow", "placebo")
TUNES = ("film", "animation", "grain", "stillimage", "psnr", "ssim",
         "fastdecode", "zerolatency")

# (The set of honored options lives with the option engine:
# config/options.py ACCEPTED_IGNORED lists the flags that parse but are not
# yet wired into the pipeline; parse_cmdline warns when one is used, the
# way the reference warns on unsupported options, codec.c:1242-1259.)


@dataclass
class EncoderParams:
    # --- geometry / timing ---
    width: int = 0
    height: int = 0
    fps_num: int = 25
    fps_den: int = 1
    sar_width: int = 0
    sar_height: int = 0
    interlaced: bool = False  # always False (progressive only)

    # --- profile / level ---
    # high: the 8x8 transform is in (per-MB decision on every P core,
    # CAVLC + CABAC-transcode), matching x264's default (codec.c:904)
    profile: str = "high"
    level_idc: int = 0       # 0 = auto

    # --- GOP structure ---
    keyint: int = 250
    min_keyint: int = 25
    scenecut: int = 40
    intra_refresh: bool = False
    bframes: int = 3
    b_adapt: int = 1
    b_pyramid: str = "normal"
    open_gop: bool = False

    # --- references / DPB ---
    ref: int = 3
    mixed_refs: bool = True

    # --- rate control ---
    rc_mode: str = RC_CRF
    qp: int = 23
    crf: float = 23.0
    bitrate: int = 0         # kbit/s for ABR/2-pass
    vbv_maxrate: int = 0
    vbv_bufsize: int = 0
    qp_min: int = 0
    qp_max: int = 51
    qp_step: int = 4
    ipratio: float = 1.4
    pbratio: float = 1.3
    chroma_qp_offset: int = 0
    aq_mode: int = 1
    aq_strength: float = 1.0
    mbtree: bool = True
    rc_lookahead: int = 40
    qcomp: float = 0.6
    stats_file: str = "x264.stats"
    pass_num: int = 0        # 0 = single pass, 1/2/3 like reference GUI
    fast_firstpass: bool = True

    # --- analysis ---
    me: str = ME_HEX
    merange: int = 16
    subme: int = 7
    partitions: str = "p8x8,b8x8,i8x8,i4x4"
    dct8x8: bool = True      # x264 --8x8dct default (preset >= faster)
    trellis: int = 1
    psy_rd: float = 1.0
    psy_trellis: float = 0.0
    fast_pskip: bool = True
    dct_decimate: bool = True
    weightp: int = 2
    weightb: bool = True
    direct: str = "spatial"
    chroma_me: bool = True
    noise_reduction: int = 0

    # --- entropy / deblock ---
    cabac: bool = True
    deblock: bool = True
    deblock_alpha: int = 0
    deblock_beta: int = 0

    # --- parallelism (device-mesh analogues of x264's thread knobs) ---
    threads: int = 0         # 0 = auto: number of devices in the mesh
    sliced_threads: bool = False
    lookahead_threads: int = 0
    sync_lookahead: int = -1
    slices: int = 0
    deterministic: bool = True
    cpu_independent: bool = False

    # --- signaling / VUI ---
    fullrange: bool = False
    colorprim: str = "undef"
    transfer: str = "undef"
    colmatrix: str = "undef"
    nal_hrd: str = "none"
    aud: bool = False
    repeat_headers: bool = True
    annexb: bool = True

    # --- logging / debug ---
    log_level: int = 2       # none(-1)/error/warning/info/debug like x264vfw
    # off by default like the x264 CLI (measurement forces per-frame recon
    # pulls and drops the session to the per-frame path); enable with
    # --psnr/--ssim
    psnr: bool = False
    ssim: bool = False
    no_asm: bool = False     # pallas interpret-mode analogue of --no-asm

    def copy(self) -> "EncoderParams":
        return replace(self)

    def validate(self) -> list[str]:
        """Clamp out-of-range values; returns warnings (reference clamps via
        reg_int_table min/max, config.c:101-135)."""
        warns = []
        clamps = {
            "qp": (0, 51), "crf": (0.0, 51.0), "keyint": (1, 1 << 16),
            "min_keyint": (1, 1 << 16), "ref": (1, 16), "bframes": (0, 16),
            "subme": (0, 11), "merange": (4, 64), "trellis": (0, 2),
            "aq_mode": (0, 3), "qp_min": (0, 51), "qp_max": (0, 51),
            "deblock_alpha": (-6, 6), "deblock_beta": (-6, 6),
            "weightp": (0, 2), "b_adapt": (0, 2),
        }
        for name, (lo, hi) in clamps.items():
            v = getattr(self, name)
            if v < lo or v > hi:
                nv = min(max(v, lo), hi)
                warns.append(f"{name}={v} out of range, clamped to {nv}")
                setattr(self, name, nv)
        if self.me not in (ME_DIA, ME_HEX, ME_UMH, ME_ESA, ME_TESA):
            warns.append(f"unknown me '{self.me}', using hex")
            self.me = ME_HEX
        if self.rc_mode not in (RC_CQP, RC_CRF, RC_ABR, RC_2PASS1, RC_2PASS2):
            warns.append(f"unknown rc mode '{self.rc_mode}', using crf")
            self.rc_mode = RC_CRF
        return warns

    def to_dict(self) -> dict:
        return {f.name: getattr(self, f.name) for f in fields(self)}

    @classmethod
    def from_dict(cls, d: dict) -> "EncoderParams":
        valid = {f.name for f in fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in valid})
