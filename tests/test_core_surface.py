"""Core type tests: plane geometry, Surface lifecycle, alloc tracking."""

import numpy as np
import pytest

import videoprocessingframework_tpu as vpf
from videoprocessingframework_tpu.core import geometry
from videoprocessingframework_tpu.core.enums import PixelFormat
from videoprocessingframework_tpu.utils import alloc


W, H = 848, 464


@pytest.mark.parametrize(
    "fmt,expected",
    [
        (PixelFormat.Y, [(H, W)]),
        (PixelFormat.NV12, [(H, W), (H // 2, W)]),
        (PixelFormat.YUV420, [(H, W), (H // 2, W // 2), (H // 2, W // 2)]),
        (PixelFormat.YUV422, [(H, W), (H, W // 2), (H, W // 2)]),
        (PixelFormat.YUV444, [(H, W)] * 3),
        (PixelFormat.RGB, [(H, W * 3)]),
        (PixelFormat.BGR, [(H, W * 3)]),
        (PixelFormat.RGB_PLANAR, [(H * 3, W)]),
        (PixelFormat.RGB_32F, [(H, W * 3)]),
        (PixelFormat.RGB_32F_PLANAR, [(H * 3, W)]),
        (PixelFormat.P10, [(H, W), (H // 2, W)]),
        (PixelFormat.P12, [(H, W), (H // 2, W)]),
        (PixelFormat.YUV444_10bit, [(H, W)] * 3),
    ],
)
def test_plane_shapes(fmt, expected):
    assert geometry.plane_shapes(fmt, W, H) == expected


@pytest.mark.parametrize(
    "fmt,factor_num,factor_den",
    [
        (PixelFormat.NV12, 3, 2),
        (PixelFormat.YUV420, 3, 2),
        (PixelFormat.YUV422, 2, 1),
        (PixelFormat.YUV444, 3, 1),
        (PixelFormat.RGB, 3, 1),
        (PixelFormat.RGB_PLANAR, 3, 1),
        (PixelFormat.Y, 1, 1),
    ],
)
def test_host_frame_size_8bit(fmt, factor_num, factor_den):
    # matches the reference's download sizing rules (Tasks.cpp:742-766)
    assert geometry.host_frame_size(fmt, W, H) == W * H * factor_num // factor_den


def test_host_frame_size_16bit():
    assert geometry.host_frame_size(PixelFormat.P10, W, H) == W * H * 3
    assert geometry.host_frame_size(PixelFormat.RGB_32F, W, H) == W * H * 12


def test_surface_make_host_and_roundtrip():
    s = vpf.Surface.make(PixelFormat.NV12, W, H)
    assert s.format == PixelFormat.NV12
    assert s.num_planes == 2
    assert not s.is_on_device
    raw = s.download()
    assert raw.nbytes == W * H * 3 // 2
    s2 = vpf.Surface.from_host_frame(raw, PixelFormat.NV12, W, H)
    assert s2.planes[0].shape == (H, W)
    assert s2.planes[1].shape == (H // 2, W)


def test_surface_device_upload_download():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (H, W), dtype=np.uint8)
    uv = rng.integers(0, 256, (H // 2, W), dtype=np.uint8)
    s = vpf.Surface(PixelFormat.NV12, W, H, [y, uv])
    d = s.to_device()
    assert d.is_on_device
    back = d.to_host()
    np.testing.assert_array_equal(back.planes[0], y)
    np.testing.assert_array_equal(back.planes[1], uv)


def test_surface_clone_independent():
    s = vpf.Surface.make(PixelFormat.RGB, 16, 8)
    c = s.clone()
    s.planes[0][:] = 7
    assert c.planes[0].max() == 0


def test_surface_crop():
    rng = np.random.default_rng(1)
    y = rng.integers(0, 256, (H, W), dtype=np.uint8)
    uv = rng.integers(0, 256, (H // 2, W), dtype=np.uint8)
    s = vpf.Surface(PixelFormat.NV12, W, H, [y, uv])
    c = s.crop(16, 32, 64, 48)
    np.testing.assert_array_equal(c.planes[0], y[32:80, 16:80])
    # chroma: rows scale by 1/2; columns scale by 1/2 in pairs ×2 channels
    np.testing.assert_array_equal(c.planes[1], uv[16:40, 16:80])


def test_surface_shape_validation():
    with pytest.raises(ValueError):
        vpf.Surface(PixelFormat.NV12, W, H, [np.zeros((H, W), np.uint8)])
    with pytest.raises(ValueError):
        vpf.Surface(
            PixelFormat.NV12,
            W,
            H,
            [np.zeros((H, W), np.uint8), np.zeros((H, W), np.uint8)],
        )
    with pytest.raises(ValueError):
        vpf.Surface.make(PixelFormat.NV12, 99, 64)  # odd width


def test_alloc_tracking():
    alloc.reset()
    alloc.enable(True)
    try:
        s = vpf.Surface.make(PixelFormat.Y, 8, 8)
        assert len(alloc.live_allocations()) == 1
        del s
        assert alloc.check_allocation_counters() == 0
    finally:
        alloc.enable(False)


def test_packet_and_seek_types():
    pd = vpf.PacketData(key=1, pts=100, dts=90, bsl=1234)
    assert "bsl=1234" in repr(pd)
    sc = vpf.SeekContext(seek_frame=10)
    assert sc.use_seek and sc.IsByNumber() and not sc.IsByTimestamp()
    sc2 = vpf.SeekContext(seek_tssec=1.5)
    assert sc2.use_seek and sc2.IsByTimestamp()
    sc3 = vpf.SeekContext()
    assert not sc3.use_seek
