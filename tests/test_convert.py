"""Converter fidelity tests: every conversion pair and every supported
(ColorSpace, ColorRange) combo vs the float64 golden reference, with a
≤1 ULP-per-8-bit-channel budget (BASELINE.md north star)."""

import numpy as np
import pytest

from videoprocessingframework_tpu.core.enums import (
    ColorRange,
    ColorSpace,
    PixelFormat,
)
from videoprocessingframework_tpu.core.exceptions import UnsupportedConversion
from videoprocessingframework_tpu.core.packet import ColorspaceConversionContext
from videoprocessingframework_tpu.core.surface import Surface
from videoprocessingframework_tpu.ops import golden
from videoprocessingframework_tpu.ops.convert import SurfaceConverter

F = PixelFormat
CS = ColorSpace
CR = ColorRange

W, H = 64, 48
RNG = np.random.default_rng(42)


def _rand(shape, dtype=np.uint8):
    if np.dtype(dtype) == np.uint8:
        return RNG.integers(0, 256, shape, dtype=np.uint8)
    return RNG.integers(0, 65536, shape, dtype=np.uint16)


def _nv12():
    return Surface(F.NV12, W, H, [_rand((H, W)), _rand((H // 2, W))])


def _yuv420(fmt=F.YUV420):
    return Surface(
        fmt, W, H,
        [_rand((H, W)), _rand((H // 2, W // 2)), _rand((H // 2, W // 2))],
    )


def _yuv444():
    return Surface(F.YUV444, W, H, [_rand((H, W))] * 3)


def _rgb(fmt=F.RGB):
    return Surface(fmt, W, H, [_rand((H, W * 3))])


def _assert_ulp(actual: np.ndarray, expected: np.ndarray, tol: int = 1):
    a = np.asarray(actual).astype(np.int32)
    e = np.asarray(expected).astype(np.int32)
    diff = np.abs(a - e)
    frac_off = (diff > 0).mean()
    assert diff.max() <= tol, (
        f"max diff {diff.max()} > {tol} (off at {frac_off:.2%} of pixels)"
    )


@pytest.mark.parametrize(
    "space,rng",
    [(CS.BT_709, CR.JPEG), (CS.BT_709, CR.MPEG), (CS.BT_601, CR.JPEG)],
)
def test_nv12_to_rgb_combos(space, rng):
    s = _nv12()
    conv = SurfaceConverter(W, H, F.NV12, F.RGB)
    out = conv.run(s, ColorspaceConversionContext(space, rng))
    got = np.asarray(out.planes[0]).reshape(H, W, 3)
    want = golden.nv12_to_rgb(s.planes[0], s.planes[1], space, rng)
    _assert_ulp(got, want)


def test_nv12_to_rgb_default_unsupported():
    # default ctx = (BT_601, MPEG) — unsupported, like the reference
    conv = SurfaceConverter(W, H, F.NV12, F.RGB)
    with pytest.raises(UnsupportedConversion):
        conv.run(_nv12())


def test_nv12_to_bgr_is_swapped():
    s = _nv12()
    cc = ColorspaceConversionContext(CS.BT_709, CR.MPEG)
    rgb = SurfaceConverter(W, H, F.NV12, F.RGB).run(s, cc)
    bgr = SurfaceConverter(W, H, F.NV12, F.BGR).run(s, cc)
    np.testing.assert_array_equal(
        np.asarray(rgb.planes[0]).reshape(H, W, 3)[..., ::-1],
        np.asarray(bgr.planes[0]).reshape(H, W, 3),
    )


@pytest.mark.parametrize("rng", [CR.JPEG, CR.MPEG])
def test_yuv420_to_rgb(rng):
    s = _yuv420()
    conv = SurfaceConverter(W, H, F.YUV420, F.RGB)
    out = conv.run(s, ColorspaceConversionContext(CS.BT_601, rng))
    want = golden.yuv420_to_rgb(*[np.asarray(p) for p in s.planes], CS.BT_601, rng)
    _assert_ulp(np.asarray(out.planes[0]).reshape(H, W, 3), want)


def test_yuv420_to_rgb_709_unsupported():
    conv = SurfaceConverter(W, H, F.YUV420, F.RGB)
    with pytest.raises(UnsupportedConversion):
        conv.run(_yuv420(), ColorspaceConversionContext(CS.BT_709, CR.JPEG))


def test_nv12_yuv420_roundtrip_lossless():
    s = _nv12()
    to420 = SurfaceConverter(W, H, F.NV12, F.YUV420)
    back = SurfaceConverter(W, H, F.YUV420, F.NV12)
    mid = to420.run(s)
    out = back.run(mid)
    np.testing.assert_array_equal(np.asarray(out.planes[0]), s.planes[0])
    np.testing.assert_array_equal(np.asarray(out.planes[1]), s.planes[1])


@pytest.mark.parametrize("rng", [CR.JPEG, CR.MPEG])
def test_rgb_to_yuv420(rng):
    s = _rgb()
    conv = SurfaceConverter(W, H, F.RGB, F.YUV420)
    out = conv.run(s, ColorspaceConversionContext(CS.BT_601, rng))
    wy, wu, wv = golden.rgb_to_yuv420(
        np.asarray(s.planes[0]).reshape(H, W, 3), CS.BT_601, rng
    )
    _assert_ulp(out.planes[0], wy)
    _assert_ulp(out.planes[1], wu)
    _assert_ulp(out.planes[2], wv)


def test_rgb_to_yuv420_default_is_jpeg():
    s = _rgb()
    conv = SurfaceConverter(W, H, F.RGB, F.YUV420)
    out_default = conv.run(s)  # defaults to (601, JPEG) like the reference
    out_jpeg = conv.run(s, ColorspaceConversionContext(CS.BT_601, CR.JPEG))
    for a, b in zip(out_default.planes, out_jpeg.planes):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("rng", [CR.JPEG, CR.MPEG])
def test_rgb_to_yuv444(rng):
    s = _rgb()
    out = SurfaceConverter(W, H, F.RGB, F.YUV444).run(
        s, ColorspaceConversionContext(CS.BT_601, rng)
    )
    wy, wu, wv = golden.rgb_to_yuv444(
        np.asarray(s.planes[0]).reshape(H, W, 3), CS.BT_601, rng
    )
    _assert_ulp(out.planes[0], wy)
    _assert_ulp(out.planes[1], wu)
    _assert_ulp(out.planes[2], wv)


def test_yuv444_to_rgb_jpeg_only():
    s = _yuv444()
    out = SurfaceConverter(W, H, F.YUV444, F.RGB).run(
        s, ColorspaceConversionContext(CS.BT_601, CR.JPEG)
    )
    want = golden.ycbcr_to_rgb(
        *[np.asarray(p) for p in s.planes], CS.BT_601, CR.JPEG
    )
    _assert_ulp(np.asarray(out.planes[0]).reshape(H, W, 3), want)
    with pytest.raises(UnsupportedConversion):
        SurfaceConverter(W, H, F.YUV444, F.RGB).run(
            s, ColorspaceConversionContext(CS.BT_601, CR.MPEG)
        )


def test_yuv444_to_bgr_both_ranges():
    s = _yuv444()
    for rng in (CR.JPEG, CR.MPEG):
        out = SurfaceConverter(W, H, F.YUV444, F.BGR).run(
            s, ColorspaceConversionContext(CS.BT_601, rng)
        )
        want = golden.ycbcr_to_rgb(
            *[np.asarray(p) for p in s.planes], CS.BT_601, rng
        )[..., ::-1]
        _assert_ulp(np.asarray(out.planes[0]).reshape(H, W, 3), want)


def test_ycbcr_to_bgr():
    s = _yuv420(F.YCBCR)
    out = SurfaceConverter(W, H, F.YCBCR, F.BGR).run(
        s, ColorspaceConversionContext(CS.BT_601, CR.MPEG)
    )
    want = golden.yuv420_to_rgb(
        *[np.asarray(p) for p in s.planes], CS.BT_601, CR.MPEG
    )[..., ::-1]
    _assert_ulp(np.asarray(out.planes[0]).reshape(H, W, 3), want)


@pytest.mark.parametrize("rng", [CR.JPEG, CR.MPEG])
def test_bgr_to_yuv444(rng):
    # reference bgr_yuv444 (TasksColorCvt.cpp:617-664): BT_601 only,
    # both ranges
    s = _rgb(F.BGR)
    out = SurfaceConverter(W, H, F.BGR, F.YUV444).run(
        s, ColorspaceConversionContext(CS.BT_601, rng)
    )
    wy, wu, wv = golden.rgb_to_yuv444(
        np.asarray(s.planes[0]).reshape(H, W, 3)[..., ::-1], CS.BT_601, rng
    )
    _assert_ulp(out.planes[0], wy)
    _assert_ulp(out.planes[1], wu)
    _assert_ulp(out.planes[2], wv)
    with pytest.raises(UnsupportedConversion):
        SurfaceConverter(W, H, F.BGR, F.YUV444).run(
            s, ColorspaceConversionContext(CS.BT_709, rng)
        )


def test_bgr_to_ycbcr():
    s = _rgb(F.BGR)
    out = SurfaceConverter(W, H, F.BGR, F.YCBCR).run(
        s, ColorspaceConversionContext(CS.BT_601, CR.MPEG)
    )
    wy, wu, wv = golden.rgb_to_yuv420(
        np.asarray(s.planes[0]).reshape(H, W, 3)[..., ::-1], CS.BT_601, CR.MPEG
    )
    _assert_ulp(out.planes[0], wy)
    _assert_ulp(out.planes[1], wu)
    _assert_ulp(out.planes[2], wv)


def test_rgb_planar_roundtrip():
    s = _rgb()
    pl = SurfaceConverter(W, H, F.RGB, F.RGB_PLANAR).run(s)
    assert pl.planes[0].shape == (3 * H, W)
    back = SurfaceConverter(W, H, F.RGB_PLANAR, F.RGB).run(pl)
    np.testing.assert_array_equal(np.asarray(back.planes[0]), s.planes[0])


def test_rgb_bgr_swap_roundtrip():
    s = _rgb()
    bgr = SurfaceConverter(W, H, F.RGB, F.BGR).run(s)
    back = SurfaceConverter(W, H, F.BGR, F.RGB).run(bgr)
    np.testing.assert_array_equal(np.asarray(back.planes[0]), s.planes[0])


def test_rgb_planar_to_yuv444():
    s = _rgb()
    pl = SurfaceConverter(W, H, F.RGB, F.RGB_PLANAR).run(s)
    out = SurfaceConverter(W, H, F.RGB_PLANAR, F.YUV444).run(
        pl, ColorspaceConversionContext(CS.BT_601, CR.JPEG)
    )
    wy, wu, wv = golden.rgb_to_yuv444(
        np.asarray(s.planes[0]).reshape(H, W, 3), CS.BT_601, CR.JPEG
    )
    _assert_ulp(out.planes[0], wy)


def test_y_to_yuv444():
    y = _rand((H, W))
    s = Surface(F.Y, W, H, [y])
    out = SurfaceConverter(W, H, F.Y, F.YUV444).run(s)
    np.testing.assert_array_equal(np.asarray(out.planes[0]), y)
    assert np.all(np.asarray(out.planes[1]) == 128)
    assert np.all(np.asarray(out.planes[2]) == 128)


def test_nv12_to_y():
    s = _nv12()
    out = SurfaceConverter(W, H, F.NV12, F.Y).run(s)
    np.testing.assert_array_equal(np.asarray(out.planes[0]), s.planes[0])


def test_rgb_to_y_gray():
    s = _rgb()
    out = SurfaceConverter(W, H, F.RGB, F.Y).run(s)
    want = golden.rgb_to_gray(np.asarray(s.planes[0]).reshape(H, W, 3))
    _assert_ulp(out.planes[0], want)


def test_p10_p12_to_nv12():
    for fmt in (F.P10, F.P12):
        y = _rand((H, W), np.uint16)
        uv = _rand((H // 2, W), np.uint16)
        s = Surface(fmt, W, H, [y, uv])
        out = SurfaceConverter(W, H, fmt, F.NV12).run(s)
        _assert_ulp(out.planes[0], golden.p16_to_8bit(y))
        _assert_ulp(out.planes[1], golden.p16_to_8bit(uv))


def test_rgb_to_rgb32f():
    s = _rgb()
    out = SurfaceConverter(W, H, F.RGB, F.RGB_32F).run(s)
    want = golden.rgb8_to_rgb32f(np.asarray(s.planes[0]))
    np.testing.assert_allclose(np.asarray(out.planes[0]), want, atol=1e-7)
    pl = SurfaceConverter(W, H, F.RGB_32F, F.RGB_32F_PLANAR).run(out)
    assert pl.planes[0].shape == (3 * H, W)
    assert pl.planes[0].dtype == np.float32


def test_unsupported_pair_message():
    with pytest.raises(UnsupportedConversion, match="Unsupported pixel format"):
        SurfaceConverter(W, H, F.YUV422, F.RGB)


def test_batched_matches_single():
    """The batched path must equal N independent single conversions."""
    from videoprocessingframework_tpu.ops.convert import nv12_to_rgb

    ys = np.stack([_rand((H, W)) for _ in range(4)])
    uvs = np.stack([_rand((H // 2, W)) for _ in range(4)])
    out = np.asarray(
        nv12_to_rgb(ys, uvs, space=CS.BT_709, rng=CR.MPEG)
    )
    for i in range(4):
        want = golden.nv12_to_rgb(ys[i], uvs[i], CS.BT_709, CR.MPEG)
        _assert_ulp(out[i], want)
