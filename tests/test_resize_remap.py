"""Resize / remap / normalize / fused pipeline tests."""

import numpy as np
import pytest

from videoprocessingframework_tpu.core.enums import (
    ColorRange,
    ColorSpace,
    PixelFormat,
)
from videoprocessingframework_tpu.core.surface import Surface
from videoprocessingframework_tpu.ops import golden
from videoprocessingframework_tpu.ops.fused import FusedPipeline, decode_postproc
from videoprocessingframework_tpu.ops.normalize import normalize
from videoprocessingframework_tpu.ops.remap import SurfaceRemaper, remap_image
from videoprocessingframework_tpu.ops.resize import (
    SurfaceResizer,
    resize_matrix,
    resize_plane,
)

F = PixelFormat
RNG = np.random.default_rng(7)


def test_resize_matrix_rows_sum_to_one():
    for method in ("lanczos", "bilinear", "nearest"):
        m = resize_matrix(97, 41, method)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)
        m = resize_matrix(41, 97, method)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)


def test_resize_identity():
    img = RNG.integers(0, 256, (2, 32, 48), np.uint8)
    for method in ("lanczos", "bilinear", "nearest"):
        out = np.asarray(resize_plane(img, h_out=32, w_out=48, method=method))
        np.testing.assert_array_equal(out, img)


def test_resize_constant_preserved():
    img = np.full((1, 40, 56), 113, np.uint8)
    out = np.asarray(resize_plane(img, h_out=17, w_out=29, method="lanczos"))
    assert np.abs(out.astype(int) - 113).max() <= 1


def test_bilinear_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    img = RNG.integers(0, 256, (64, 96), np.uint8)
    out = np.asarray(
        resize_plane(img[None], h_out=128, w_out=192, method="bilinear")
    )[0]
    want = cv2.resize(img, (192, 128), interpolation=cv2.INTER_LINEAR)
    # same pixel-center convention; allow rounding skew on a few pixels
    diff = np.abs(out.astype(int) - want.astype(int))
    assert np.percentile(diff, 99) <= 1 and diff.max() <= 2


def test_surface_resizer_formats():
    W, H, TW, TH = 64, 48, 32, 24
    cases = {
        F.RGB: [(H, W * 3)],
        F.NV12: [(H, W), (H // 2, W)],
        F.YUV420: [(H, W), (H // 2, W // 2), (H // 2, W // 2)],
        F.YUV444: [(H, W)] * 3,
        F.RGB_PLANAR: [(H * 3, W)],
        F.Y: [(H, W)],
    }
    for fmt, shapes in cases.items():
        planes = [RNG.integers(0, 256, s, np.uint8) for s in shapes]
        s = Surface(fmt, W, H, planes)
        out = SurfaceResizer(TW, TH, fmt).run(s)
        assert out.width == TW and out.height == TH
        assert out.format == fmt
        # plane geometry follows the format rules
        from videoprocessingframework_tpu.core import geometry

        for p, shp in zip(out.planes, geometry.plane_shapes(fmt, TW, TH)):
            assert tuple(p.shape) == shp


def test_resize_f32_keeps_dtype():
    img = RNG.random((1, 16, 24, 3), np.float32)
    out = np.asarray(resize_plane(img, h_out=8, w_out=12))
    assert out.dtype == np.float32


def test_remap_identity():
    H, W = 24, 32
    img = RNG.integers(0, 256, (1, H, W, 3), np.uint8)
    xs, ys = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    out = np.asarray(remap_image(img, xs, ys))
    np.testing.assert_array_equal(out, img)


def test_remap_flip_and_interp():
    H, W = 16, 20
    img = RNG.integers(0, 256, (1, H, W, 3), np.uint8)
    xs, ys = np.meshgrid(
        np.arange(W - 1, -1, -1, dtype=np.float32),
        np.arange(H, dtype=np.float32),
    )
    out = np.asarray(remap_image(img, xs, ys))
    np.testing.assert_array_equal(out, img[:, :, ::-1, :])
    # half-pixel shift averages horizontal neighbors
    xs2 = np.clip(xs + 0.0, 0, W - 1) * 0 + 0.5
    ys2 = ys * 0.0
    out2 = np.asarray(remap_image(img, xs2[:1, :1], ys2[:1, :1]))
    want = np.rint((img[:, 0, 0, :].astype(float) + img[:, 0, 1, :]) / 2)
    np.testing.assert_allclose(out2[0, 0, 0], want[0], atol=1)


def test_surface_remaper():
    H, W = 24, 32
    s = Surface(F.RGB, W, H, [RNG.integers(0, 256, (H, W * 3), np.uint8)])
    xs, ys = np.meshgrid(
        np.arange(0, W, 2, dtype=np.float32), np.arange(0, H, 2, dtype=np.float32)
    )
    r = SurfaceRemaper(xs, ys)
    out = r.run(s)
    assert out.width == W // 2 and out.height == H // 2
    with pytest.raises(ValueError, match="RGB/BGR"):
        SurfaceRemaper(xs, ys, fmt=F.NV12)


def test_normalize_shapes_and_values():
    img = np.full((2, 8, 8, 3), 255, np.uint8)
    out = np.asarray(normalize(img))
    want = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array(
        [0.229, 0.224, 0.225]
    )
    np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-5)
    nchw = np.asarray(normalize(img, channels_first=True))
    assert nchw.shape == (2, 3, 8, 8)


def test_fused_pipeline_matches_staged():
    """Fused NV12→RGB (no resize) must match the staged converter exactly."""
    W, H = 64, 48
    y = RNG.integers(0, 256, (1, H, W), np.uint8)
    uv = RNG.integers(0, 256, (1, H // 2, W), np.uint8)
    pipe = FusedPipeline(
        F.NV12, ColorSpace.BT_709, ColorRange.MPEG, out_size=(W, H)
    )
    out = np.asarray(pipe(y, uv))[0]
    want = golden.nv12_to_rgb(y[0], uv[0], ColorSpace.BT_709, ColorRange.MPEG)
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 1


def test_fused_pipeline_resize_normalize():
    W, H = 64, 48
    y = RNG.integers(0, 256, (3, H, W), np.uint8)
    uv = RNG.integers(0, 256, (3, H // 2, W), np.uint8)
    out = np.asarray(
        decode_postproc(
            y,
            uv,
            src_format=F.NV12,
            space=ColorSpace.BT_709,
            rng=ColorRange.MPEG,
            out_h=24,
            out_w=32,
            output="normalized_nchw",
        )
    )
    assert out.shape == (3, 3, 24, 32)
    assert out.dtype == np.float32
    assert np.isfinite(out).all()


def test_fused_packed_layouts_bit_exact():
    """Packed planar YUV420 (the hot decode-pool layout), packed NV12, and
    explicit 3-plane input must produce bit-identical fused output."""
    import numpy as np

    r = np.random.default_rng(1)
    N, H, W = 2, 64, 96
    y = r.integers(0, 256, (N, H, W), np.uint8)
    u = r.integers(0, 256, (N, H // 2, W // 2), np.uint8)
    v = r.integers(0, 256, (N, H // 2, W // 2), np.uint8)
    packed420 = np.concatenate(
        [y.reshape(N, -1), u.reshape(N, -1), v.reshape(N, -1)], 1
    ).reshape(N, H * 3 // 2, W)
    uv = np.empty((N, H // 2, W), np.uint8)
    uv[..., 0::2] = u
    uv[..., 1::2] = v
    packednv = np.concatenate(
        [y.reshape(N, -1), uv.reshape(N, -1)], 1
    ).reshape(N, H * 3 // 2, W)
    kw = dict(space=ColorSpace.BT_709, rng=ColorRange.MPEG, out_h=32,
              out_w=48, output="rgb_u8")
    a = np.asarray(decode_postproc(
        y, u, v, src_format=PixelFormat.YUV420, **kw))
    b = np.asarray(decode_postproc(
        packed420, src_format=PixelFormat.YUV420, **kw))
    c = np.asarray(decode_postproc(
        packednv, src_format=PixelFormat.NV12, **kw))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(b, c)


def test_fused_pipeline_4k():
    """Large-frame handling (SURVEY §5 long-context analog): a 3840x2160
    frame through the fused pipeline, checked against the float64 golden."""
    from videoprocessingframework_tpu.ops import colorspace as cspace

    H, W, OH, OW = 2160, 3840, 224, 224
    r = np.random.default_rng(5)
    y = r.integers(0, 256, (1, H, W), np.uint8)
    u = r.integers(0, 256, (1, H // 2, W // 2), np.uint8)
    v = r.integers(0, 256, (1, H // 2, W // 2), np.uint8)
    packed = np.concatenate(
        [y.reshape(1, -1), u.reshape(1, -1), v.reshape(1, -1)], 1
    ).reshape(1, H * 3 // 2, W)
    pipe = FusedPipeline(
        PixelFormat.YUV420, ColorSpace.BT_709, ColorRange.MPEG,
        out_size=(OW, OH), kernel="xla",
    )
    out = np.asarray(pipe(packed))
    assert out.shape == (1, OH, OW, 3)

    rm = resize_matrix(H, OH, "lanczos").astype(np.float64)
    cm = resize_matrix(W, OW, "lanczos").astype(np.float64)
    uu = np.repeat(np.repeat(u, 2, 1), 2, 2).astype(np.float64)
    vv = np.repeat(np.repeat(v, 2, 1), 2, 2).astype(np.float64)

    def rsz(p):
        return np.einsum("oh,nhw->now", rm, p) @ cm.T

    M, OFF = cspace.rgb_from_ycbcr_matrix(ColorSpace.BT_709, ColorRange.MPEG)
    M, OFF = np.asarray(M, np.float64), np.asarray(OFF, np.float64)
    ycc = np.stack(
        [rsz(y.astype(np.float64)) - OFF[0], rsz(uu) - OFF[1],
         rsz(vv) - OFF[2]], -1
    )
    want = np.clip(np.rint(np.einsum("...c,dc->...d", ycc, M)), 0, 255)
    assert np.abs(out.astype(int) - want.astype(int)).max() <= 1


def test_fused_split_bf16_one_ulp_vs_golden():
    """The default split-bf16 resize (2-pass u8 stage + 3-pass bit-masked
    f32 stage, ops/fused.py:_resize_plane2d) must stay within 1 u8 ULP of
    the float64 golden for both filter methods, odd sizes, both stage
    orders (down/up mix forces rows-first and cols-first)."""
    from videoprocessingframework_tpu.ops import colorspace as cspace

    r = np.random.default_rng(11)
    for (H, W, OH, OW), method in [
        ((132, 252, 56, 40), "lanczos"),    # downscale, cols-first
        ((96, 64, 44, 120), "bilinear"),    # W upscale, rows-first
    ]:
        y = r.integers(0, 256, (2, H, W), np.uint8)
        u = r.integers(0, 256, (2, H // 2, W // 2), np.uint8)
        v = r.integers(0, 256, (2, H // 2, W // 2), np.uint8)

        rm = resize_matrix(H, OH, method).astype(np.float64)
        cm = resize_matrix(W, OW, method).astype(np.float64)
        uu = np.repeat(np.repeat(u, 2, 1), 2, 2).astype(np.float64)
        vv = np.repeat(np.repeat(v, 2, 1), 2, 2).astype(np.float64)

        def rsz(p):
            return np.einsum("oh,nhw->now", rm, p) @ cm.T

        M, OFF = cspace.rgb_from_ycbcr_matrix(
            ColorSpace.BT_709, ColorRange.MPEG
        )
        M, OFF = np.asarray(M, np.float64), np.asarray(OFF, np.float64)
        ycc = np.stack(
            [rsz(y.astype(np.float64)) - OFF[0], rsz(uu) - OFF[1],
             rsz(vv) - OFF[2]], -1
        )
        want = np.clip(
            np.rint(np.einsum("...c,dc->...d", ycc, M)), 0, 255
        ).astype(int)

        kw = dict(
            src_format=PixelFormat.YUV420, space=ColorSpace.BT_709,
            rng=ColorRange.MPEG, out_h=OH, out_w=OW, method=method,
            output="rgb_u8",
        )
        split = np.asarray(
            decode_postproc(y, u, v, compute="split_bf16", **kw)
        ).astype(int)
        hi = np.asarray(
            decode_postproc(y, u, v, compute="highest", **kw)
        ).astype(int)
        assert np.abs(split - want).max() <= 1, method
        assert np.abs(hi - want).max() <= 1, method


def test_fused_compute_mode_validation():
    y = RNG.integers(0, 256, (1, 16, 16), np.uint8)
    uv = RNG.integers(0, 256, (1, 8, 16), np.uint8)
    with pytest.raises(ValueError, match="compute"):
        decode_postproc(
            y, uv, src_format=F.NV12, space=ColorSpace.BT_709,
            rng=ColorRange.MPEG, out_h=8, out_w=8, compute="bogus",
        )


def test_fused_pipeline_normalized_outputs_consistent():
    """All output modes agree between kernel implementations: the XLA path
    and (on TPU) the planar Pallas kernel share the normalized/rgb_f32
    semantics; on CPU this pins the XLA reference values."""
    import numpy as np

    r = np.random.default_rng(21)
    N, H, W = 2, 96, 128
    packed = r.integers(0, 256, (N, H * 3 // 2, W), np.uint8)
    kw = dict(out_size=(32, 24), mean=(0.485, 0.456, 0.406),
              std=(0.229, 0.224, 0.225))
    nhwc = FusedPipeline(F.YUV420, ColorSpace.BT_709, ColorRange.MPEG,
                         output="normalized", **kw)(packed)
    nchw = FusedPipeline(F.YUV420, ColorSpace.BT_709, ColorRange.MPEG,
                         output="normalized_nchw", **kw)(packed)
    f32 = FusedPipeline(F.YUV420, ColorSpace.BT_709, ColorRange.MPEG,
                        output="rgb_f32", **kw)(packed)
    assert nhwc.shape == (N, 24, 32, 3)
    assert nchw.shape == (N, 3, 24, 32)
    np.testing.assert_allclose(
        np.asarray(nhwc), np.moveaxis(np.asarray(nchw), 1, -1), atol=1e-6
    )
    # normalized == (rgb_f32 - mean)/std
    want = (np.asarray(f32) - np.asarray(kw["mean"])) / np.asarray(kw["std"])
    np.testing.assert_allclose(np.asarray(nhwc), want, atol=1e-5)
