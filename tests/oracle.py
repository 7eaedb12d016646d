"""Conformance oracle for tests: stock FFmpeg decode + libx264 encode.

Used ONLY by the test suite (the framework's runtime path is fully native).
Provides the conformance check BASELINE.json demands ("decodable by stock
FFmpeg at matched PSNR/SSIM") and golden x264 streams for native-decoder
tests — the same role the external x264/FFmpeg played for the reference.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "tools", "ffshim.c")
_SO = os.path.join(_ROOT, "tools", "libffshim.so")

_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["gcc", "-O2", "-shared", "-fPIC", _SRC, "-o", _SO,
                 "-lavcodec", "-lavutil", "-lavformat"],
                check=True, capture_output=True)
        _lib = ctypes.CDLL(_SO)
        _lib.ffshim_encode_x264.restype = ctypes.c_long
        _lib.ffshim_decode_h264.restype = ctypes.c_int
        _lib.ffshim_decode_container.restype = ctypes.c_int
    return _lib


def decode_h264(bitstream: bytes, max_frames: int = 512) -> np.ndarray | None:
    """Decode Annex-B H.264 -> (n, h*w*3//2) uint8 I420 frames, or None."""
    lib = _get_lib()
    bs = np.frombuffer(bitstream, dtype=np.uint8).copy()
    # generous output buffer: assume up to 4K
    cap = max_frames * 3840 * 2176 * 3 // 2
    cap = min(cap, 1 << 31)
    out = np.zeros(cap, dtype=np.uint8)
    ow, oh = ctypes.c_int(0), ctypes.c_int(0)
    n = lib.ffshim_decode_h264(
        bs.ctypes.data_as(ctypes.c_void_p), int(bs.size),
        out.ctypes.data_as(ctypes.c_void_p), ctypes.c_long(out.size),
        ctypes.byref(ow), ctypes.byref(oh))
    if n < 0:
        return None
    w, h = ow.value, oh.value
    if n == 0 or w == 0:
        return np.zeros((0, 0), dtype=np.uint8)
    fsz = w * h * 3 // 2
    frames = out[:n * fsz].reshape(n, fsz)
    frames = frames.copy()
    frames.shape = (n, fsz)
    return frames


def decode_h264_planes(bitstream: bytes):
    """Decode -> (Y, U, V) stacked arrays: Y (n,h,w), U/V (n,h/2,w/2)."""
    lib = _get_lib()
    bs = np.frombuffer(bitstream, dtype=np.uint8).copy()
    cap = 512 * 3840 * 2176 * 3 // 2
    out = np.zeros(min(cap, 1 << 31), dtype=np.uint8)
    ow, oh = ctypes.c_int(0), ctypes.c_int(0)
    n = lib.ffshim_decode_h264(
        bs.ctypes.data_as(ctypes.c_void_p), int(bs.size),
        out.ctypes.data_as(ctypes.c_void_p), ctypes.c_long(out.size),
        ctypes.byref(ow), ctypes.byref(oh))
    if n <= 0:
        return None
    w, h = ow.value, oh.value
    fsz = w * h * 3 // 2
    fr = out[:n * fsz].reshape(n, fsz)
    y = fr[:, :w * h].reshape(n, h, w).copy()
    u = fr[:, w * h:w * h + w * h // 4].reshape(n, h // 2, w // 2).copy()
    v = fr[:, w * h + w * h // 4:].reshape(n, h // 2, w // 2).copy()
    return y, u, v


def encode_x264(yuv: np.ndarray, n: int, w: int, h: int, qp: int = -1,
                crf: float = 23.0, preset: str = "medium",
                x264opts: str = "") -> bytes:
    """Encode packed I420 frames with real x264 -> Annex-B bytes."""
    lib = _get_lib()
    yuv = np.ascontiguousarray(yuv, dtype=np.uint8)
    out = np.zeros(max(1 << 22, yuv.size * 2), dtype=np.uint8)
    sz = lib.ffshim_encode_x264(
        yuv.ctypes.data_as(ctypes.c_void_p), n, w, h,
        qp, ctypes.c_float(crf), preset.encode(), x264opts.encode(),
        out.ctypes.data_as(ctypes.c_void_p), ctypes.c_long(out.size))
    assert sz > 0, f"x264 encode failed: {sz}"
    return out[:sz].tobytes()


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = ((a - b) ** 2).mean()
    if mse == 0:
        return 99.0
    return 10.0 * np.log10(255.0 ** 2 / mse)


def make_test_clip(w: int, h: int, n: int, seed: int = 0,
                   motion: bool = True) -> np.ndarray:
    """Synthetic I420 clip with structure + noise + motion: (n, h*w*3//2)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (64 + 64 * np.sin(xx / 13.0) + 48 * np.cos(yy / 9.0))
    tex = rng.integers(-12, 13, size=(h, w))
    frames = []
    for f in range(n):
        dx = f * 2 if motion else 0
        y = np.clip(base + np.roll(tex, dx, axis=1)
                    + 24 * np.sin((xx + dx * 3) / 23.0), 0, 255).astype(np.uint8)
        u = np.clip(128 + 32 * np.sin((xx[::2, ::2] + f) / 17.0), 0, 255).astype(np.uint8)
        v = np.clip(128 + 32 * np.cos((yy[::2, ::2] - f) / 19.0), 0, 255).astype(np.uint8)
        frames.append(np.concatenate([y.ravel(), u.ravel(), v.ravel()]))
    return np.stack(frames).astype(np.uint8)


def decode_container(path: str):
    """Demux+decode any container -> (y, u, v, duration_s, fps) or None."""
    lib = _get_lib()
    cap = 512 * 3840 * 2176 * 3 // 2
    out = np.zeros(min(cap, 1 << 31), dtype=np.uint8)
    ow, oh = ctypes.c_int(0), ctypes.c_int(0)
    dur, fps = ctypes.c_double(0), ctypes.c_double(0)
    n = lib.ffshim_decode_container(
        path.encode(), out.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_long(out.size), ctypes.byref(ow), ctypes.byref(oh),
        ctypes.byref(dur), ctypes.byref(fps))
    if n <= 0:
        return None
    w, h = ow.value, oh.value
    fsz = w * h * 3 // 2
    fr = out[:n * fsz].reshape(n, fsz)
    y = fr[:, :w * h].reshape(n, h, w).copy()
    u = fr[:, w * h:w * h + w * h // 4].reshape(n, h // 2, w // 2).copy()
    v = fr[:, w * h + w * h // 4:].reshape(n, h // 2, w // 2).copy()
    return y, u, v, dur.value, fps.value
