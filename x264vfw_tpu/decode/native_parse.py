"""ctypes loader for the native CAVLC slice parser (tools/decparse).

The parser is the host entropy stage of the accelerated decode path
(SURVEY §7 step 7: entropy decode on host, reconstruction on TPU): it
turns one CAVLC I/P slice into the syntax tensors the device recon
consumes, including the fully-resolved motion field.  Built from source
on first use; returns None when the slice uses syntax outside its scope
(the caller falls back to the Python decoder).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "..", "..", "tools", "decparse")
_SRC = os.path.join(_DIR, "cavlc_parse.c")
_SO = os.path.join(_DIR, "libcavlcparse.so")
_lib = None
_failed = False
_luts = None


def _get_lib():
    global _lib, _failed, _luts
    if _lib is not None or _failed:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["gcc", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.cavlc_parse_slice.restype = ctypes.c_long
        lib.cavlc_parse_b_slice.restype = ctypes.c_long
        from ..bitstream.cavlc_luts import build_luts
        _luts = build_luts()
        _lib = lib
    except Exception:
        _failed = True
    return _lib


def available() -> bool:
    return _get_lib() is not None


def parse_slice(rbsp: np.ndarray, bitpos: int, slice_type: int,
                mbh: int, mbw: int, qp_init: int, nref: int,
                transform_8x8: bool, want_raw: bool = False):
    """Parse one CAVLC slice's data.  slice_type: 0 = P, 2 = I.

    Returns a dict of syntax arrays, or None when the slice is outside
    the parser's scope (B, I_PCM, 8x8 transform, >512 MB dims, or a
    parse error — the caller must fall back to the Python decoder).

    want_raw additionally returns the syntax elements AS PARSED (raw mvd
    per quadrant, partition kind, I4 mode flags, raw qp deltas) for the
    CAVLC->CABAC entropy transcoder (bitstream/cabac_transcode.py).
    """
    lib = _get_lib()
    if lib is None:
        return None
    n = mbh * mbw
    rbsp = np.ascontiguousarray(rbsp, np.uint8)
    # narrow dtypes on the bulk arrays: the syntax upload is the decode
    # path's host->device traffic, ~13 MB/frame at 1080p vs 27 MB as int32
    o = {
        "mb_kind": np.zeros(n, np.int32),
        "qp_map": np.zeros(n, np.int32),
        "i16mode": np.zeros(n, np.int32),
        "cmode": np.zeros(n, np.int32),
        "i4modes": np.zeros((n, 16), np.int8),
        "cbp_luma": np.zeros(n, np.int32),
        "cbp_chroma": np.zeros(n, np.int32),
        "dc16": np.zeros((n, 16), np.int16),
        "ac15": np.zeros((n, 16, 15), np.int16),
        "lvl16": np.zeros((n, 16, 16), np.int16),
        "cdc": np.zeros((n, 2, 4), np.int16),
        "cac": np.zeros((n, 2, 4, 15), np.int16),
        "mv4": np.zeros((n, 16, 2), np.int16),
        "ref4": np.zeros((n, 16), np.int8),
        "flags": np.zeros(n, np.int32),
    }
    args = [rbsp.ctypes.data_as(ctypes.c_void_p), ctypes.c_long(rbsp.size),
            ctypes.c_long(bitpos), slice_type, mbh, mbw, qp_init, nref,
            int(transform_8x8),
            _luts.ctypes.data_as(ctypes.c_void_p)]
    for key in ("mb_kind", "qp_map", "i16mode", "cmode", "i4modes",
                "cbp_luma", "cbp_chroma", "dc16", "ac15", "lvl16",
                "cdc", "cac", "mv4", "ref4", "flags"):
        args.append(o[key].ctypes.data_as(ctypes.c_void_p))
    if want_raw:
        o["mvdq"] = np.zeros((n, 4, 2), np.int16)
        o["refq"] = np.zeros((n, 4), np.int8)
        o["part"] = np.zeros(n, np.int8)
        o["i4prev"] = np.zeros((n, 16), np.uint8)
        o["i4rem"] = np.zeros((n, 16), np.int8)
        o["qpd"] = np.zeros(n, np.int8)
        o["t8"] = np.zeros(n, np.uint8)
        for key in ("mvdq", "refq", "part", "i4prev", "i4rem", "qpd",
                    "t8"):
            args.append(o[key].ctypes.data_as(ctypes.c_void_p))
    else:
        args += [None] * 7
    rc = lib.cavlc_parse_slice(*args)
    if rc != n:
        return None
    return o


def parse_b_slice(rbsp: np.ndarray, bitpos: int, mbh: int, mbw: int,
                  qp_init: int, transform_8x8: bool = False):
    """Raw-syntax parse of one restricted B slice (16x16 modes only) for
    the entropy transcoder.  Returns a dict or None on fallback."""
    lib = _get_lib()
    if lib is None:
        return None
    n = mbh * mbw
    rbsp = np.ascontiguousarray(rbsp, np.uint8)
    o = {
        "mode": np.zeros(n, np.int8),
        "mvd0": np.zeros((n, 2), np.int16),
        "mvd1": np.zeros((n, 2), np.int16),
        "cbp_luma": np.zeros(n, np.int32),
        "cbp_chroma": np.zeros(n, np.int32),
        "lvl16": np.zeros((n, 16, 16), np.int16),
        "cdc": np.zeros((n, 2, 4), np.int16),
        "cac": np.zeros((n, 2, 4, 15), np.int16),
        "qpd": np.zeros(n, np.int8),
    }
    args = [rbsp.ctypes.data_as(ctypes.c_void_p), ctypes.c_long(rbsp.size),
            ctypes.c_long(bitpos), mbh, mbw, qp_init,
            _luts.ctypes.data_as(ctypes.c_void_p)]
    for key in ("mode", "mvd0", "mvd1", "cbp_luma", "cbp_chroma",
                "lvl16", "cdc", "cac", "qpd"):
        args.append(o[key].ctypes.data_as(ctypes.c_void_p))
    o["t8"] = np.zeros(n, np.uint8)
    args.append(int(transform_8x8))
    args.append(o["t8"].ctypes.data_as(ctypes.c_void_p))
    rc = lib.cavlc_parse_b_slice(*args)
    if rc != n:
        return None
    return o
