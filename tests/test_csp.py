"""Colorspace converter tests: known colors, ranges, format plumbing."""

import numpy as np
import jax.numpy as jnp

from x264vfw_tpu.ops import csp


def test_rgb_gray_point():
    rgb = np.full((4, 4, 3), 128, np.uint8)
    y, u, v = csp.rgb_to_i420(jnp.asarray(rgb))
    # mid gray: Y = 16 + 128*219/255 ~ 126, U=V=128
    assert abs(int(y[0, 0]) - 126) <= 1
    assert int(u[0, 0]) == 128 and int(v[0, 0]) == 128


def test_rgb_primaries_bt601_tv():
    def one_color(r, g, b):
        rgb = np.zeros((2, 2, 3), np.uint8)
        rgb[..., 0], rgb[..., 1], rgb[..., 2] = r, g, b
        y, u, v = csp.rgb_to_i420(jnp.asarray(rgb))
        return int(y[0, 0]), int(u[0, 0]), int(v[0, 0])

    y, u, v = one_color(255, 255, 255)
    assert abs(y - 235) <= 1 and abs(u - 128) <= 1 and abs(v - 128) <= 1
    y, u, v = one_color(0, 0, 0)
    assert abs(y - 16) <= 1
    y, u, v = one_color(255, 0, 0)   # red: V high
    assert v > 220 and u < 110 and abs(y - 81) <= 2
    y, u, v = one_color(0, 0, 255)   # blue: U high
    assert u > 220 and abs(y - 41) <= 2


def test_fullrange_extents():
    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[...] = 255
    y, _, _ = csp.rgb_to_i420(jnp.asarray(rgb), fullrange=True)
    assert int(y[0, 0]) == 255
    rgb[...] = 0
    y, _, _ = csp.rgb_to_i420(jnp.asarray(rgb), fullrange=True)
    assert int(y[0, 0]) == 0


def test_bgr_swaps_channels():
    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[..., 0] = 255  # R in RGB order
    y1, u1, v1 = csp.rgb_to_i420(jnp.asarray(rgb))
    bgr = rgb[..., ::-1].copy()
    y2, u2, v2 = csp.rgb_to_i420(jnp.asarray(bgr), bgr=True)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_rgb_roundtrip():
    # chroma-smooth gradient (4:2:0 subsampling is lossless on 2x2-constant
    # chroma); roundtrip error should then be just fixed-point rounding
    yy, xx = np.mgrid[0:16, 0:16]
    rgb = np.stack([
        np.repeat(np.repeat((xx[::2, ::2] * 12 + 40) % 200, 2, 0), 2, 1),
        np.repeat(np.repeat((yy[::2, ::2] * 9 + 60) % 200, 2, 0), 2, 1),
        np.full((16, 16), 120),
    ], axis=-1).astype(np.uint8)
    y, u, v = csp.rgb_to_i420(jnp.asarray(rgb), matrix="bt709")
    back = np.asarray(csp.i420_to_rgb(y, u, v, matrix="bt709"))
    assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 3


def test_yuyv_uyvy():
    rng = np.random.default_rng(1)
    H, W = 8, 8
    ys = rng.integers(0, 256, (H, W))
    us = rng.integers(0, 256, (H, W // 2))
    vs = rng.integers(0, 256, (H, W // 2))
    yuyv = np.zeros((H, W * 2), np.uint8)
    yuyv[:, 0::4] = ys[:, 0::2]
    yuyv[:, 2::4] = ys[:, 1::2]
    yuyv[:, 1::4] = us
    yuyv[:, 3::4] = vs
    y, u, v = csp.yuyv_to_i420(jnp.asarray(yuyv))
    np.testing.assert_array_equal(np.asarray(y), ys)
    np.testing.assert_array_equal(np.asarray(u), (us[0::2].astype(int) + us[1::2] + 1) >> 1)
    uyvy = np.zeros((H, W * 2), np.uint8)
    uyvy[:, 1::4] = ys[:, 0::2]
    uyvy[:, 3::4] = ys[:, 1::2]
    uyvy[:, 0::4] = us
    uyvy[:, 2::4] = vs
    y2, u2, v2 = csp.uyvy_to_i420(jnp.asarray(uyvy))
    np.testing.assert_array_equal(np.asarray(y2), ys)
    np.testing.assert_array_equal(np.asarray(u2), np.asarray(u))


def test_nv12_nv21():
    rng = np.random.default_rng(2)
    y = rng.integers(0, 256, (8, 8))
    u = rng.integers(0, 256, (4, 4))
    v = rng.integers(0, 256, (4, 4))
    uv = np.zeros((4, 8), np.uint8)
    uv[:, 0::2] = u
    uv[:, 1::2] = v
    _, gu, gv = csp.nv12_to_i420(jnp.asarray(y), jnp.asarray(uv))
    np.testing.assert_array_equal(np.asarray(gu), u)
    np.testing.assert_array_equal(np.asarray(gv), v)
    _, gu, gv = csp.nv12_to_i420(jnp.asarray(y), jnp.asarray(uv), swapped=True)
    np.testing.assert_array_equal(np.asarray(gu), v)


def test_dispatch_and_flip():
    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, (8, 8)).astype(np.uint8)
    u = rng.integers(0, 256, (4, 4)).astype(np.uint8)
    v = rng.integers(0, 256, (4, 4)).astype(np.uint8)
    gy, gu, gv = csp.convert_to_i420("yv12", (y, v, u))
    np.testing.assert_array_equal(np.asarray(gu), u)
    fy, fu, fv = csp.convert_to_i420("i420", (y, u, v), flip=True)
    np.testing.assert_array_equal(np.asarray(fy), y[::-1])
