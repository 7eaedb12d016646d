"""ctypes loader for the native CABAC slice encoder (tools/cabac).

Builds libcabac.so from source on first use (gcc is part of the baked
toolchain); falls back to the pure-Python writer when unavailable.  The
native encoder must produce byte-identical payloads to the Python golden
model (asserted in tests/test_cabac.py)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "..", "..", "tools", "cabac")
_SRC = os.path.join(_DIR, "cabac_ext.c")
_SO = os.path.join(_DIR, "libcabac.so")
_lib = None
_failed = False


def _get_lib():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["gcc", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.cabac_encode_p_slice.restype = ctypes.c_long
        lib.cabac_encode_i_slice.restype = ctypes.c_long
        lib.cabac_encode_b_slice.restype = ctypes.c_long
        _lib = lib
    except Exception:
        _failed = True
    return _lib


def available() -> bool:
    return _get_lib() is not None


def _p(a, dt):
    a = np.ascontiguousarray(a, dtype=dt)
    return a, a.ctypes.data_as(ctypes.c_void_p)


def encode_p_slice(qp, init_idc, mbh, mbw, skip, mvd, cbp_l, cbp_c,
                   levels, dc_u, dc_v, ac_u, ac_v, qpd=None,
                   part=None, ref=None, nref=1, t8=None,
                   t8_mode=False) -> bytes:
    """mvd: (n, 2) for an all-16x16 slice, or (n, 4, 2) quadrant-raster
    mvd slots with `part` (n,) in {0:16x16, 1:16x8, 2:8x16, 3:P_8x8}.
    ref (n,) + nref > 1 emit ref_idx bins (te/unary)."""
    lib = _get_lib()
    n = mbh * mbw
    cap = max(1 << 16, n * 800)
    out = np.zeros(cap, np.uint8)
    if qpd is None:
        qpd = np.zeros(n, np.int32)
    mvd = np.ascontiguousarray(mvd, np.int32)
    if mvd.size == n * 2:                 # legacy 16x16 layout -> slot 0
        m4 = np.zeros((n, 4, 2), np.int32)
        m4[:, 0, :] = mvd.reshape(n, 2)
        mvd = m4
    if part is None:
        part = np.zeros(n, np.int32)
    if ref is None:
        ref = np.zeros(n, np.int32)
    holds = []
    ptrs = []
    for a, dt in ((skip, np.uint8), (part, np.int32), (mvd, np.int32)):
        arr, p = _p(a, dt)
        holds.append(arr)
        ptrs.append(p)
    refa, refp = _p(ref, np.int32)
    holds.append(refa)
    ptrs += [refp, ctypes.c_int(int(nref))]
    for a, dt in ((cbp_l, np.int32),
                  (cbp_c, np.int32), (levels, np.int32), (dc_u, np.int32),
                  (dc_v, np.int32), (ac_u, np.int32), (ac_v, np.int32),
                  (qpd, np.int32)):
        arr, p = _p(a, dt)
        holds.append(arr)
        ptrs.append(p)
    if t8 is None:
        t8 = np.zeros(n, np.uint8)
    t8a, t8p = _p(t8, np.uint8)
    holds.append(t8a)
    ptrs += [t8p, ctypes.c_int(int(t8_mode))]
    sz = lib.cabac_encode_p_slice(
        qp, init_idc, mbh, mbw, *ptrs,
        out.ctypes.data_as(ctypes.c_void_p), ctypes.c_long(cap))
    assert sz >= 0, f"native cabac failed: {sz}"
    return out[:sz].tobytes()


def encode_b_slice(qp, init_idc, mbh, mbw, skip, mode, mvd0, mvd1,
                   cbp_l, cbp_c, levels, dc_u, dc_v, ac_u, ac_v,
                   t8_mode=False, t8=None) -> bytes:
    lib = _get_lib()
    n = mbh * mbw
    cap = max(1 << 16, n * 800)
    out = np.zeros(cap, np.uint8)
    holds = []
    ptrs = []
    for a, dt in ((skip, np.uint8), (mode, np.int32), (mvd0, np.int32),
                  (mvd1, np.int32), (cbp_l, np.int32), (cbp_c, np.int32),
                  (levels, np.int32), (dc_u, np.int32), (dc_v, np.int32),
                  (ac_u, np.int32), (ac_v, np.int32)):
        arr, p = _p(a, dt)
        holds.append(arr)
        ptrs.append(p)
    if t8 is None:
        t8 = np.zeros(n, np.uint8)
    t8a, t8p = _p(t8, np.uint8)
    holds.append(t8a)
    sz = lib.cabac_encode_b_slice(
        qp, init_idc, mbh, mbw, *ptrs, ctypes.c_int(int(t8_mode)), t8p,
        out.ctypes.data_as(ctypes.c_void_p), ctypes.c_long(cap))
    assert sz >= 0, f"native cabac failed: {sz}"
    return out[:sz].tobytes()


def encode_i_slice(qp, mbh, mbw, i16mode, cmode, acflag, cbp_c,
                   dc, ac, dc_u, dc_v, ac_u, ac_v,
                   use_i4=None, i4_prev=None, i4_rem=None, cbp4=None,
                   levels4=None, t8_mode=False) -> bytes:
    """Mixed I16/I_NxN slice; the five i4 args may all be None (pure I16).
    levels4: (n, 16, 16) zigzag decode-order blocks, cbp-masked."""
    lib = _get_lib()
    n = mbh * mbw
    cap = max(1 << 16, n * 1200)
    out = np.zeros(cap, np.uint8)
    holds = []
    ptrs = []
    if use_i4 is None:
        ptrs = [None] * 5
    else:
        for a, dt in ((use_i4, np.uint8), (i4_prev, np.uint8),
                      (i4_rem, np.int32), (cbp4, np.int32),
                      (levels4, np.int32)):
            arr, p = _p(a, dt)
            holds.append(arr)
            ptrs.append(p)
    for a, dt in ((i16mode, np.int32), (cmode, np.int32), (acflag, np.uint8),
                  (cbp_c, np.int32), (dc, np.int32), (ac, np.int32),
                  (dc_u, np.int32), (dc_v, np.int32), (ac_u, np.int32),
                  (ac_v, np.int32)):
        arr, p = _p(a, dt)
        holds.append(arr)
        ptrs.append(p)
    sz = lib.cabac_encode_i_slice(
        qp, mbh, mbw, *ptrs, ctypes.c_int(int(t8_mode)),
        out.ctypes.data_as(ctypes.c_void_p), ctypes.c_long(cap))
    assert sz >= 0, f"native cabac failed: {sz}"
    return out[:sz].tobytes()
