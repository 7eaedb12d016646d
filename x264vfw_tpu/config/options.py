"""x264-compatible command-line option engine.

Reproduces the reference's escape-hatch "extra command line"
(/root/reference/codec.c:831-1378): a two-phase parse where --preset/--tune
are applied first and every other flag overrides on top, with
unsupported-option warnings instead of hard errors (codec.c:1242-1259).

Accepted syntaxes:  --name value | --name=value | --no-name | name=value
(the last form matches x264's x264-params style).
"""

from __future__ import annotations

import shlex

from .params import EncoderParams
from .presets import resolve

__all__ = ["parse_cmdline", "split_cmdline", "fullhelp", "OPTION_TABLE"]


def _int(v): return int(v, 0)
def _float(v): return float(v)
def _str(v): return v
def _bool(v): return v.lower() not in ("0", "false", "no", "off")


def _fps(v):
    if "/" in v:
        a, b = v.split("/")
        return int(a), int(b)
    f = float(v)
    if f == int(f):
        return int(f), 1
    return int(round(f * 1000)), 1000


def _deblock(v):
    parts = v.replace(":", ",").split(",")
    a = int(parts[0])
    b = int(parts[1]) if len(parts) > 1 else a
    return a, b


def _sar(v):
    a, b = v.replace("/", ":").split(":")
    return int(a), int(b)


# name -> (param_field(s), parser, negatable)
OPTION_TABLE: dict[str, tuple] = {
    # GOP / frames
    "keyint": ("keyint", lambda v: 1 << 30 if v == "infinite" else int(v), False),
    "min-keyint": ("min_keyint", _int, False),
    "scenecut": ("scenecut", _int, True),
    "intra-refresh": ("intra_refresh", _bool, True),
    "bframes": ("bframes", _int, False),
    "b-adapt": ("b_adapt", _int, False),
    "b-pyramid": ("b_pyramid", _str, False),
    "open-gop": ("open_gop", _bool, True),
    # ref / analysis
    "ref": ("ref", _int, False),
    "mixed-refs": ("mixed_refs", _bool, True),
    "me": ("me", _str, False),
    "merange": ("merange", _int, False),
    "subme": ("subme", _int, False),
    "partitions": ("partitions", _str, False),
    "8x8dct": ("dct8x8", _bool, True),
    "trellis": ("trellis", _int, False),
    "psy-rd": (("psy_rd", "psy_trellis"),
               lambda v: tuple(float(x) for x in (v.split(":") + ["0"])[:2]), False),
    "fast-pskip": ("fast_pskip", _bool, True),
    "dct-decimate": ("dct_decimate", _bool, True),
    "weightp": ("weightp", _int, False),
    "weightb": ("weightb", _bool, True),
    "direct": ("direct", _str, False),
    "chroma-me": ("chroma_me", _bool, True),
    "nr": ("noise_reduction", _int, False),
    # entropy / deblock
    "cabac": ("cabac", _bool, True),
    "deblock": (("deblock_alpha", "deblock_beta"), _deblock, True),
    # rate control
    "qp": (("rc_mode", "qp"), lambda v: ("cqp", int(v)), False),
    "crf": (("rc_mode", "crf"), lambda v: ("crf", float(v)), False),
    "bitrate": (("rc_mode", "bitrate"), lambda v: ("abr", int(v)), False),
    "vbv-maxrate": ("vbv_maxrate", _int, False),
    "vbv-bufsize": ("vbv_bufsize", _int, False),
    "qpmin": ("qp_min", _int, False),
    "qpmax": ("qp_max", _int, False),
    "qpstep": ("qp_step", _int, False),
    "ipratio": ("ipratio", _float, False),
    "pbratio": ("pbratio", _float, False),
    "chroma-qp-offset": ("chroma_qp_offset", _int, False),
    "aq-mode": ("aq_mode", _int, False),
    "aq-strength": ("aq_strength", _float, False),
    "mbtree": ("mbtree", _bool, True),
    "rc-lookahead": ("rc_lookahead", _int, False),
    "qcomp": ("qcomp", _float, False),
    "stats": ("stats_file", _str, False),
    # --pass selects the stats-file workflow like the reference's pass
    # selector (codec.c:1516-1541): 1 writes stats, 2/3 read them back
    "pass": (("pass_num", "rc_mode"),
             lambda v: (int(v), "pass1" if int(v) == 1 else "pass2"), False),
    "fast-firstpass": ("fast_firstpass", _bool, True),
    # parallelism
    "threads": ("threads", lambda v: 0 if v == "auto" else int(v), False),
    "sliced-threads": ("sliced_threads", _bool, True),
    "lookahead-threads": ("lookahead_threads", _int, False),
    "sync-lookahead": ("sync_lookahead", lambda v: -1 if v == "auto" else int(v), False),
    "slices": ("slices", _int, False),
    "deterministic": ("deterministic", _bool, True),
    "cpu-independent": ("cpu_independent", _bool, True),
    # geometry / signaling
    "fps": (("fps_num", "fps_den"), _fps, False),
    "sar": (("sar_width", "sar_height"), _sar, False),
    "level": ("level_idc", lambda v: int(float(v) * 10) if "." in v else
              (int(v) if int(v) > 9 else int(v) * 10), False),
    "fullrange": ("fullrange", lambda v: v in ("on", "1", "true"), True),
    "range": ("fullrange", lambda v: v == "pc", False),
    "colorprim": ("colorprim", _str, False),
    "transfer": ("transfer", _str, False),
    "colormatrix": ("colmatrix", _str, False),
    "nal-hrd": ("nal_hrd", _str, False),
    "aud": ("aud", _bool, True),
    "repeat-headers": ("repeat_headers", _bool, True),
    "annexb": ("annexb", _bool, True),
    # debug
    "psnr": ("psnr", _bool, True),
    "ssim": ("ssim", _bool, True),
    "asm": ("no_asm", lambda v: not _bool(v), True),
    "log-level": ("log_level", lambda v: {"none": -1, "error": 0, "warning": 1,
                                          "info": 2, "debug": 3}.get(v, int(v) if v.lstrip("-").isdigit() else 2), False),
}

# options that parse into params but are not yet wired into the TPU
# pipeline: using one produces a warning (the reference's unsupported-option
# warning behavior, codec.c:1242-1259).  Keep this list in sync with
# api.CompressSession.begin — remove a name the moment its field takes
# effect end to end.
ACCEPTED_IGNORED = {
    "b-adapt", "b-pyramid", "open-gop", "intra-refresh",
    "mixed-refs", "psy-rd",
    "weightb", "direct", "chroma-me", "nr", "fast-pskip",
    "sliced-threads", "lookahead-threads",
    "deterministic", "cpu-independent",
}

# options the reference forwards but we exclude by design (interlace etc.)
_KNOWN_UNSUPPORTED = {
    "tff", "bff", "fake-interlaced", "pic-struct", "bluray-compat",
    "opencl", "dump-yuv", "sps-id", "videoformat", "overscan",
    "non-deterministic", "cqm", "cqmfile", "cqm4", "cqm8", "zones",
    "qpfile", "crf-max", "ratetol", "cplxblur", "qblur", "b-bias",
    "slice-max-size", "slice-max-mbs", "slice-min-mbs",
    "constrained-intra", "filler", "frame-packing",
}


# one-line descriptions for fullhelp (the reference regenerates x264's
# --fullhelp into its help dialog, config.c:1401-1781)
_HELP: dict[str, str] = {
    "keyint": "Upper bound on frames between IDR pictures ('infinite' allowed)",
    "min-keyint": "Lower bound on frames between IDR pictures",
    "scenecut": "Sensitivity threshold for promoting scene changes to I-frames",
    "intra-refresh": "Spread intra rows over the GOP instead of coding IDRs",
    "bframes": "How many B-frames may sit between two anchor frames",
    "b-adapt": "B-placement decision: 0 fixed, 1 fast heuristic, 2 exhaustive",
    "b-pyramid": "Let B-frames serve as references (none/strict/normal)",
    "open-gop": "Permit the GOP to start with B-frames that cross the IDR",
    "ref": "Size of the reference-picture list for inter search",
    "mixed-refs": "Pick the reference picture per partition, not per MB",
    "me": "Integer-pel search strategy (dia/hex/umh/esa/tesa)",
    "merange": "Search window radius for motion estimation, in pels",
    "subme": "Effort level of fractional-pel refinement, 0..11",
    "partitions": "Inter/intra block shapes the analyser may choose",
    "8x8dct": "Allow the 8x8 integer transform (High profile feature)",
    "trellis": "RD-optimal coefficient rounding: 0 off, 1 final MB, 2 everywhere",
    "psy-rd": "Weighting of visual energy in RD decisions (rd:trellis pair)",
    "fast-pskip": "Cheap early-out that codes still MBs as skip",
    "dct-decimate": "Drop near-empty luma residual blocks in P macroblocks",
    "weightp": "Explicit luma weighting of P references, 0..2",
    "weightb": "Implicit weighting for B bi-prediction",
    "direct": "Derivation rule for B direct motion (none/spatial/temporal/auto)",
    "chroma-me": "Fold chroma SAD into the motion search metric",
    "nr": "Pre-quantization noise filtering amount",
    "cabac": "Arithmetic entropy coding on/off (off = CAVLC)",
    "deblock": "In-loop filter strength offsets alpha:beta",
    "qp": "Fixed quantizer for every frame (0..51)",
    "crf": "Quality-targeted mode: constant rate factor",
    "bitrate": "Target average rate in kbit/s (ABR)",
    "vbv-maxrate": "Peak rate the hypothetical decoder buffer drains at",
    "vbv-bufsize": "Capacity of the hypothetical decoder buffer (kbit)",
    "qpmin": "Floor on the per-frame quantizer",
    "qpmax": "Ceiling on the per-frame quantizer",
    "qpstep": "Largest allowed QP change frame to frame",
    "ipratio": "Quantizer scale of P relative to I frames",
    "pbratio": "Quantizer scale of B relative to P frames",
    "chroma-qp-offset": "Shift applied to the chroma quantizer",
    "aq-mode": "Per-MB quantizer adaptation: 0 off, 1 variance-based",
    "aq-strength": "Gain of the per-MB quantizer adaptation",
    "mbtree": "Propagate future-reference cost into per-MB QP decisions",
    "rc-lookahead": "Frames buffered ahead for rate-control analysis",
    "qcomp": "Blend between constant-QP and constant-rate behaviour (0..1)",
    "stats": "Path of the two-pass statistics checkpoint file",
    "pass": "Which pass of a multi-pass encode this run performs",
    "fast-firstpass": "Downgrade analysis settings during pass 1",
    "threads": "Worker parallelism ('auto' = one per mesh device)",
    "sliced-threads": "Split each frame into concurrently-coded slices",
    "lookahead-threads": "Parallelism of the lookahead analysis stage",
    "sync-lookahead": "Depth of the asynchronous lookahead queue",
    "slices": "Fixed slice count per picture",
    "deterministic": "Trade speed for reproducible multi-device output",
    "cpu-independent": "Force identical bitstreams on any device topology",
    "fps": "Input frame rate (integer, decimal, or num/den)",
    "sar": "Pixel aspect ratio as width:height",
    "level": "H.264 level to signal/conform to (e.g. 4.1)",
    "fullrange": "Mark samples as full-range (PC levels)",
    "range": "Input sample range selection ('tv' or 'pc')",
    "colorprim": "Colour primaries to signal in the VUI",
    "transfer": "Transfer function to signal in the VUI",
    "colormatrix": "YCbCr matrix coefficients to signal in the VUI",
    "nal-hrd": "Buffering-model signalling (none/vbr/cbr)",
    "aud": "Prefix every access unit with a delimiter NAL",
    "repeat-headers": "Re-emit SPS/PPS ahead of each keyframe",
    "annexb": "Start-code framing instead of length-prefixed NALs",
    "psnr": "Measure and log reconstruction PSNR",
    "ssim": "Measure and log reconstruction SSIM",
    "asm": "Compiled Pallas kernels (--no-asm = interpret mode)",
    "log-level": "Logging verbosity (none/error/warning/info/debug)",
}


def fullhelp() -> str:
    """Generate the complete option reference with live defaults — the
    role of the reference's in-dialog --fullhelp regeneration
    (config.c:1401-1781): every option, its default read from the real
    parameter object, preset/tune/profile lists."""
    from .params import PRESETS, PROFILES, TUNES
    d = EncoderParams()
    lines = [
        "x264vfw_tpu — TPU-native H.264 encoder",
        "",
        "Presets:  " + ", ".join(PRESETS),
        "Tunes:    " + ", ".join(TUNES),
        "Profiles: " + ", ".join(PROFILES),
        "",
        "Options (x264-compatible names; --name value | --name=value | "
        "--no-name):",
    ]
    for name, (fields_, _parser, negatable) in OPTION_TABLE.items():
        f0 = fields_ if isinstance(fields_, str) else fields_[0]
        dv = getattr(d, f0, None)
        desc = _HELP.get(name, "")
        neg = " [negatable]" if negatable else ""
        lines.append(f"  --{name:<20} {desc}")
        lines.append(f"    {'':<20} default: {dv!r}{neg}")
    lines.append("")
    lines.append("Unsupported x264 options (accepted, warned, ignored): "
                 + ", ".join(sorted(_KNOWN_UNSUPPORTED)))
    return "\n".join(lines)


def split_cmdline(s: str) -> list[str]:
    """Quoted-string-aware splitter (reference split_cmdline, codec.c:1004)."""
    return shlex.split(s)


def parse_cmdline(cmdline: str | list[str],
                  base: EncoderParams | None = None
                  ) -> tuple[EncoderParams, list[str]]:
    """Two-phase parse: preset/tune/profile first, then all options.

    Returns (params, warnings)."""
    args = split_cmdline(cmdline) if isinstance(cmdline, str) else list(cmdline)
    warnings: list[str] = []

    # normalize into (name, value) pairs
    pairs: list[tuple[str, str | None, bool]] = []  # (name, value, negated)
    i = 0
    while i < len(args):
        a = args[i]
        neg = False
        if a.startswith("--"):
            a = a[2:]
        if a.startswith("no-"):
            neg = True
            a = a[3:]
        if "=" in a:
            name, val = a.split("=", 1)
        else:
            name = a
            val = None
            # lookahead for a value
            if (not neg and name in OPTION_TABLE and i + 1 < len(args)
                    and not args[i + 1].startswith("--")):
                _, parser, negatable = OPTION_TABLE[name]
                if parser is not _bool or args[i + 1].lower() in (
                        "0", "1", "true", "false", "on", "off"):
                    val = args[i + 1]
                    i += 1
            elif name in ("preset", "tune", "profile") and i + 1 < len(args):
                val = args[i + 1]
                i += 1
        pairs.append((name, val, neg))
        i += 1

    # phase 1: preset / tune / profile
    preset = tune = profile = None
    rest = []
    for name, val, neg in pairs:
        if name == "preset":
            preset = val
        elif name == "tune":
            tune = val
        elif name == "profile":
            profile = val
        else:
            rest.append((name, val, neg))

    p, warns = resolve(preset=preset, tune=tune, base=base)
    warnings += warns

    # phase 2: everything else, in order
    for name, val, neg in rest:
        entry = OPTION_TABLE.get(name)
        if entry is None:
            if name in _KNOWN_UNSUPPORTED:
                warnings.append(f"option --{name} is not supported; ignored")
            else:
                warnings.append(f"unknown option --{name}; ignored")
            continue
        if name in ACCEPTED_IGNORED:
            warnings.append(
                f"option --{name} is accepted but not yet honored by the "
                f"TPU pipeline; it has no effect")
        fields_, parser, negatable = entry
        if neg:
            if not negatable:
                warnings.append(f"--no-{name} is not a flag; ignored")
                continue
            value = False
            if name == "deblock":
                p.deblock = False
                continue
            if name == "asm":
                p.no_asm = True
                continue
        else:
            if val is None and parser is _bool:
                value = True
            elif val is None:
                warnings.append(f"--{name} requires a value; ignored")
                continue
            else:
                try:
                    value = parser(val)
                except (ValueError, IndexError):
                    warnings.append(f"bad value '{val}' for --{name}; ignored")
                    continue
        if name == "deblock" and not neg:
            p.deblock = True
        if isinstance(fields_, tuple):
            if not isinstance(value, tuple):
                value = (value,) * len(fields_)
            for f, v in zip(fields_, value):
                setattr(p, f, v)
        else:
            setattr(p, fields_, value)

    # profile clamp + validation + level resolution (after overrides)
    from .presets import apply_level, apply_profile
    apply_profile(p, profile)
    warnings += p.validate()
    p, w2 = apply_level(p)
    warnings += w2
    return p, warnings
