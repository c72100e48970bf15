"""Interop (DLPack/torch), quality metrics, and Pallas kernel tests."""

import numpy as np
import pytest

from videoprocessingframework_tpu.core.enums import (
    ColorRange,
    ColorSpace,
    PixelFormat,
)
from videoprocessingframework_tpu.core.surface import Surface
from videoprocessingframework_tpu.interop import dlpack as di
from videoprocessingframework_tpu.ops import golden
from videoprocessingframework_tpu.ops.metrics import psnr, ssim

RNG = np.random.default_rng(3)
W, H = 128, 64


def test_surface_to_jax_zero_copy():
    s = Surface.make(PixelFormat.NV12, W, H).to_device()
    arr = di.surface_to_jax(s, 0)
    assert arr is s.planes[0]  # literally the same buffer


def test_surface_torch_roundtrip():
    torch = pytest.importorskip("torch")
    y = RNG.integers(0, 256, (H, W), np.uint8)
    uv = RNG.integers(0, 256, (H // 2, W), np.uint8)
    s = Surface(PixelFormat.NV12, W, H, [y, uv])
    t = di.surface_to_torch(s, 0)
    assert t.shape == (H, W)
    np.testing.assert_array_equal(t.numpy(), y)
    packed = np.concatenate([y.ravel(), uv.ravel()])
    s2 = di.torch_to_surface(torch.from_numpy(packed), PixelFormat.NV12, W, H)
    np.testing.assert_array_equal(np.asarray(s2.planes[0]), y)


def test_jax_torch_bridge():
    pytest.importorskip("torch")
    import jax.numpy as jnp

    a = jnp.arange(12.0).reshape(3, 4)
    t = di.jax_to_torch(a)
    assert t.shape == (3, 4)
    back = di.torch_to_jax(t)
    np.testing.assert_allclose(np.asarray(back), np.asarray(a))


def test_psnr_basics():
    a = RNG.integers(0, 256, (2, 32, 32), np.uint8)
    assert np.isinf(np.asarray(psnr(a, a))).all()
    noisy = np.clip(a.astype(int) + RNG.integers(-4, 5, a.shape), 0, 255)
    vals = np.asarray(psnr(a, noisy.astype(np.uint8)))
    assert (vals > 30).all() and (vals < 60).all()
    # identical up to a constant offset of 16 → ~24 dB
    off = np.clip(a.astype(int) + 16, 0, 255).astype(np.uint8)
    assert np.asarray(psnr(a, off)).mean() < 30


def test_ssim_basics():
    a = RNG.integers(0, 256, (2, 64, 64), np.uint8)
    np.testing.assert_allclose(np.asarray(ssim(a, a)), 1.0, atol=1e-4)
    inverted = (255 - a).astype(np.uint8)
    assert np.asarray(ssim(a, inverted)).mean() < 0.2


def test_ms_ssim_basics():
    from videoprocessingframework_tpu.ops.metrics import ms_ssim

    a = RNG.integers(0, 256, (2, 256, 256), np.uint8)
    # identity → 1; inversion → near 0
    np.testing.assert_allclose(np.asarray(ms_ssim(a, a)), 1.0, atol=1e-4)
    assert np.asarray(ms_ssim(a, (255 - a).astype(np.uint8))).mean() < 0.2
    # mild noise must score higher than a strong blur-like degradation
    noisy = np.clip(a.astype(int) + RNG.integers(-3, 4, a.shape), 0, 255)
    coarse = (a // 64 * 64).astype(np.uint8)
    m_noisy = np.asarray(ms_ssim(a, noisy.astype(np.uint8)))
    m_coarse = np.asarray(ms_ssim(a, coarse))
    assert (m_noisy > m_coarse).all()
    # small frames drop scales instead of failing (weights renormalize)
    s = RNG.integers(0, 256, (1, 24, 24), np.uint8)
    v = np.asarray(ms_ssim(s, s))
    np.testing.assert_allclose(v, 1.0, atol=1e-4)
    # channels-last input
    rgb = RNG.integers(0, 256, (1, 128, 128, 3), np.uint8)
    np.testing.assert_allclose(np.asarray(ms_ssim(rgb, rgb)), 1.0, atol=1e-4)


def test_pallas_nv12_rgb_interpret_matches_golden():
    from videoprocessingframework_tpu.ops.pallas_kernels import (
        nv12_to_rgb_planar_pallas,
        pallas_supported,
    )

    assert pallas_supported(H, W)
    y = RNG.integers(0, 256, (2, H, W), np.uint8)
    uv = RNG.integers(0, 256, (2, H // 2, W), np.uint8)
    out = np.asarray(
        nv12_to_rgb_planar_pallas(
            y, uv, space=ColorSpace.BT_709, rng=ColorRange.MPEG,
            interpret=True,
        )
    )
    assert out.shape == (2, 3, H, W)
    for i in range(2):
        want = golden.nv12_to_rgb(y[i], uv[i], ColorSpace.BT_709, ColorRange.MPEG)
        got = np.moveaxis(out[i], 0, -1)
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_pallas_alignment_guard():
    from videoprocessingframework_tpu.ops.pallas_kernels import (
        nv12_to_rgb_planar_pallas,
    )

    y = np.zeros((1, 30, 100), np.uint8)
    uv = np.zeros((1, 15, 100), np.uint8)
    with pytest.raises(ValueError, match="pallas nv12 kernel"):
        nv12_to_rgb_planar_pallas(y, uv, interpret=True)


def test_pallas_yuv420_rgb_interpret_matches_golden():
    from videoprocessingframework_tpu.ops.pallas_kernels import (
        yuv420_to_rgb_planar_pallas,
    )

    y = RNG.integers(0, 256, (1, H, W), np.uint8)
    u = RNG.integers(0, 256, (1, H // 2, W // 2), np.uint8)
    v = RNG.integers(0, 256, (1, H // 2, W // 2), np.uint8)
    out = np.asarray(
        yuv420_to_rgb_planar_pallas(
            y, u, v, space=ColorSpace.BT_601, rng=ColorRange.JPEG,
            interpret=True,
        )
    )
    want = golden.yuv420_to_rgb(y[0], u[0], v[0], ColorSpace.BT_601,
                                ColorRange.JPEG)
    got = np.moveaxis(out[0], 0, -1)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_yuv420_rgb_planar_converter_pair():
    from videoprocessingframework_tpu.core.surface import Surface
    from videoprocessingframework_tpu.core.packet import (
        ColorspaceConversionContext,
    )
    from videoprocessingframework_tpu.ops.convert import SurfaceConverter

    y = RNG.integers(0, 256, (H, W), np.uint8)
    u = RNG.integers(0, 256, (H // 2, W // 2), np.uint8)
    v = RNG.integers(0, 256, (H // 2, W // 2), np.uint8)
    s = Surface(PixelFormat.YUV420, W, H, [y, u, v])
    conv = SurfaceConverter(W, H, PixelFormat.YUV420, PixelFormat.RGB_PLANAR)
    out = conv.run(
        s, ColorspaceConversionContext(ColorSpace.BT_601, ColorRange.MPEG)
    )
    assert out.planes[0].shape == (3 * H, W)
    want = golden.yuv420_to_rgb(y, u, v, ColorSpace.BT_601, ColorRange.MPEG)
    got = np.moveaxis(
        np.asarray(out.planes[0]).reshape(3, H, W), 0, -1
    )
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_pallas_fused_resize_interpret_one_ulp_vs_xla():
    """Two-kernel fused resize+CSC (ops/pallas_fused.py) vs the XLA
    f32-highest path in interpret mode: within 1 u8 ULP. (Bit-exactness
    between the two held before the banded-K2 rewrite only by accident of
    summation order — both paths are independently pinned to ≤1 ULP vs
    the float64 golden, which is the actual contract.)"""
    from videoprocessingframework_tpu.ops.fused import decode_postproc
    from videoprocessingframework_tpu.ops.pallas_fused import (
        fused_nv12_resize_rgb_pallas,
        fused_pallas_supported,
    )

    B, HH, WW = 2, 96, 512
    assert fused_pallas_supported(WW, 32)
    y = RNG.integers(0, 256, (B, HH, WW), np.uint8)
    uv = RNG.integers(0, 256, (B, HH // 2, WW), np.uint8)
    a = np.asarray(
        fused_nv12_resize_rgb_pallas(
            y, uv, out_h=32, out_w=48,
            space=ColorSpace.BT_709, rng=ColorRange.MPEG, interpret=True,
        )
    )
    b = np.moveaxis(
        np.asarray(
            decode_postproc(
                y, uv, src_format=PixelFormat.NV12,
                space=ColorSpace.BT_709, rng=ColorRange.MPEG,
                out_h=32, out_w=48, output="rgb_u8", compute="highest",
            )
        ), -1, 1,
    )
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_pallas_fused_one_ulp_vs_float64_golden():
    """Graduation bar (VERDICT r1 item 3): the split-bf16 fused Pallas
    resize+CSC matches a float64 reference to <=1 u8 ULP. (Compiled-mode
    parity on a real v5e chip was verified to the same bound; interpret
    mode here exercises identical numerics.)"""
    from videoprocessingframework_tpu.ops import colorspace as cspace
    from videoprocessingframework_tpu.ops.pallas_fused import (
        fused_nv12_resize_rgb_pallas,
    )
    from videoprocessingframework_tpu.ops.resize import resize_matrix

    r = np.random.default_rng(3)
    B, H, W, OH, OW = 2, 128, 256, 64, 64
    y = r.integers(0, 256, (B, H, W), np.uint8)
    u = r.integers(0, 256, (B, H // 2, W // 2), np.uint8)
    v = r.integers(0, 256, (B, H // 2, W // 2), np.uint8)
    uv = np.empty((B, H // 2, W), np.uint8)
    uv[..., 0::2] = u
    uv[..., 1::2] = v

    out = np.asarray(
        fused_nv12_resize_rgb_pallas(
            y, uv, out_h=OH, out_w=OW,
            space=ColorSpace.BT_709, rng=ColorRange.MPEG, interpret=True,
        )
    )
    out = np.moveaxis(out, 1, -1)

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


def test_pallas_planar_banded_one_ulp_vs_golden():
    """Planar YUV420 Pallas pair (banded K1 + half-grid-chroma K2) vs the
    float64 golden at a banded-eligible shape, interpret mode."""
    from videoprocessingframework_tpu.ops import colorspace as cspace
    from videoprocessingframework_tpu.ops.pallas_fused import (
        fused_pallas_planar_supported,
        fused_yuv420_resize_rgb_pallas,
    )
    from videoprocessingframework_tpu.ops.resize import resize_matrix

    r = np.random.default_rng(9)
    B, H, W, OH, OW = 2, 256, 512, 64, 48
    assert fused_pallas_planar_supported(H, W, OH, OW)
    y = r.integers(0, 256, (B, H, W), np.uint8)
    u = r.integers(0, 256, (B, H // 2, W // 2), np.uint8)
    v = r.integers(0, 256, (B, H // 2, W // 2), np.uint8)

    out = np.asarray(
        fused_yuv420_resize_rgb_pallas(
            y, u, v, out_h=OH, out_w=OW,
            space=ColorSpace.BT_709, rng=ColorRange.MPEG, interpret=True,
        )
    )
    out = np.moveaxis(out, 1, -1)

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


def test_pallas_planar_unsupported_shapes():
    from videoprocessingframework_tpu.ops.pallas_fused import (
        fused_pallas_planar_supported,
    )

    assert not fused_pallas_planar_supported(64, 512, 64, 64)   # too short
    assert not fused_pallas_planar_supported(256, 500, 64, 64)  # W % 128
    assert fused_pallas_planar_supported(256, 512, 63, 64)  # any out_h
    # 1080p -> 224 (the product shape) must be eligible
    assert fused_pallas_planar_supported(1080, 1920, 224, 224)


def test_band_plan_reconstructs_dense_matrix():
    """Invariant behind the banded kernels: every nonzero of the dense
    resize matrix must be captured inside some tile's window, so stacking
    the extracted bands back at their starts reproduces the matrix
    exactly — across scale factors, methods, and the half-grid collapse."""
    from videoprocessingframework_tpu.ops.pallas_fused import (
        _band_plan, _band_starts, _extract_bands,
    )
    from videoprocessingframework_tpu.ops.resize import resize_matrix

    cases = [
        (1080, 224, "lanczos", False), (1080, 224, "lanczos", True),
        (720, 224, "bilinear", False), (480, 224, "lanczos", False),
        (256, 64, "lanczos", True), (2160, 224, "lanczos", False),
        (360, 480, "lanczos", False),  # upscale
    ]
    for n_in, n_out, method, half in cases:
        mat = resize_matrix(n_in, n_out, method)
        if half:
            mat = mat.reshape(n_out, n_in // 2, 2).sum(-1)
        win = 64 if half else 128
        plan = _band_plan(mat, win)
        if plan is None:
            continue  # support too wide for the window: dense fallback
        starts, bands = plan
        rebuilt = np.zeros_like(mat)
        for t, s in enumerate(starts):
            rebuilt[t * 8: (t + 1) * 8, s: s + win] += bands[t]
        np.testing.assert_array_equal(rebuilt, mat)

    # column windows: same invariant at 128-col tiles / 128 alignment
    for w, out_w in [(1920, 224), (512, 48), (1280, 224)]:
        cmat = resize_matrix(w, out_w)
        out_wp = (out_w + 127) // 128 * 128
        cy = np.zeros((out_wp, w), np.float32)
        cy[:out_w] = cmat
        for win in list(range(128, w, 128)) + [w]:
            starts = _band_starts(cy != 0, win, 128, 128)
            if starts is not None:
                break
        bands = _extract_bands(cy, starts, win, 128)
        rebuilt = np.zeros_like(cy)
        for t, s in enumerate(starts):
            rebuilt[t * 128: (t + 1) * 128, s: s + win] += bands[t]
        np.testing.assert_array_equal(rebuilt, cy)


def test_pallas_planar_odd_output_sizes():
    """out_h/out_w need no alignment: the kernel pads both (zero-support
    band tiles / zero matrix rows — exact) and slices outside."""
    from videoprocessingframework_tpu.ops.fused import decode_postproc
    from videoprocessingframework_tpu.ops.pallas_fused import (
        fused_pallas_planar_supported,
        fused_yuv420_resize_rgb_pallas,
    )

    r = np.random.default_rng(13)
    B, HH, WW, OH, OW = 1, 192, 384, 61, 45
    assert fused_pallas_planar_supported(HH, WW, OH, OW)
    y = r.integers(0, 256, (B, HH, WW), np.uint8)
    u = r.integers(0, 256, (B, HH // 2, WW // 2), np.uint8)
    v = r.integers(0, 256, (B, HH // 2, WW // 2), np.uint8)
    out = np.asarray(
        fused_yuv420_resize_rgb_pallas(
            y, u, v, out_h=OH, out_w=OW,
            space=ColorSpace.BT_709, rng=ColorRange.MPEG, interpret=True,
        )
    )
    assert out.shape == (B, 3, OH, OW)
    ref = np.asarray(
        decode_postproc(
            y, u, v, src_format=PixelFormat.YUV420,
            space=ColorSpace.BT_709, rng=ColorRange.MPEG,
            out_h=OH, out_w=OW, output="rgb_u8", compute="highest",
        )
    )
    got = np.moveaxis(out, 1, -1)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_pallas_planar_two_pass_4k_one_ulp_vs_golden():
    """4K-class frames exceed the whole-frame kernel's VMEM budget and
    must route through the striped two-pass variant (banded row-resize
    stripes + column/CSC kernel) — same ≤1 u8 ULP contract vs the float64
    golden, interpret mode."""
    from videoprocessingframework_tpu.ops import colorspace as cspace
    from videoprocessingframework_tpu.ops.pallas_fused import (
        _planar_layout,
        fused_yuv420_resize_rgb_pallas,
    )
    from videoprocessingframework_tpu.ops.resize import resize_matrix

    B, H, W, OH, OW = 1, 2160, 3840, 224, 224
    lay = _planar_layout(H, W, OH, OW, "lanczos", 1)
    assert lay is not None and lay["mode"] == "two_pass"

    r = np.random.default_rng(11)
    y = r.integers(0, 256, (B, H, W), np.uint8)
    u = r.integers(0, 256, (B, H // 2, W // 2), np.uint8)
    v = r.integers(0, 256, (B, H // 2, W // 2), np.uint8)

    out = np.asarray(
        fused_yuv420_resize_rgb_pallas(
            y, u, v, out_h=OH, out_w=OW,
            space=ColorSpace.BT_709, rng=ColorRange.MPEG, interpret=True,
        )
    )
    out = np.moveaxis(out, 1, -1)

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


def test_pallas_nv12_fused_output_modes_consistent():
    """The NV12-source fused kernel's rgb_f32 / normalized outputs share
    the u8 path's float pipeline: normalized == (rgb_f32 − mean)/std
    exactly, and rint(rgb_f32·255) is within 1 code of the u8 output."""
    from videoprocessingframework_tpu.ops.pallas_fused import (
        fused_nv12_resize_rgb_pallas,
        fused_pallas_supported,
    )

    H2, W2, OH, OW = 256, 512, 64, 64
    assert fused_pallas_supported(W2, OH)
    r = np.random.default_rng(13)
    y = r.integers(0, 256, (1, H2, W2), np.uint8)
    uv = r.integers(0, 256, (1, H2 // 2, W2), np.uint8)
    mean, std = (0.5, 0.4, 0.3), (0.2, 0.25, 0.3)
    kw = dict(out_h=OH, out_w=OW, space=ColorSpace.BT_709,
              rng=ColorRange.MPEG, interpret=True)
    u8 = np.asarray(fused_nv12_resize_rgb_pallas(y, uv, **kw))
    f32 = np.asarray(
        fused_nv12_resize_rgb_pallas(y, uv, output="rgb_f32", **kw)
    )
    norm = np.asarray(
        fused_nv12_resize_rgb_pallas(
            y, uv, output="normalized", mean=mean, std=std, **kw
        )
    )
    assert f32.dtype == norm.dtype == np.float32 and u8.dtype == np.uint8
    want = (f32 - np.asarray(mean)[:, None, None]) \
        / np.asarray(std)[:, None, None]
    np.testing.assert_allclose(norm, want.astype(np.float32), atol=1e-5)
    assert np.abs(
        np.rint(f32 * 255.0).astype(int) - u8.astype(int)
    ).max() <= 1


def test_planar_layout_picks_16_row_tiles_at_1080p():
    """Pin the pass-latency optimization: a systolic pass costs ~(N+K)
    cycles regardless of tile rows (M≤128), so the layout must prefer the
    16-row/16-aligned tile (half the passes of 8/32 at identical MACs)
    whenever a plan exists — it does at the product shape."""
    from videoprocessingframework_tpu.ops.pallas_fused import _planar_layout

    lay = _planar_layout(1080, 1920, 224, 224, "lanczos", 1)
    assert lay is not None and lay["mode"] == "whole"
    assert lay["tile"] == 16
    assert lay["t_cnt"] == 224 // 16


def test_nv12_vmem_feasibility_gate():
    """The NV12 kernel gate must include the VMEM footprint (advisor r2):
    the product downscale passes, a full-res f32 output (K2 inputs alone
    exceed the budget) is rejected so kernel="auto" falls back to XLA
    instead of failing at Mosaic compile time."""
    from videoprocessingframework_tpu.ops.pallas_fused import (
        fused_pallas_nv12_supported,
    )

    assert fused_pallas_nv12_supported(1080, 1920, 224, 224, "lanczos", 1)
    assert not fused_pallas_nv12_supported(
        1080, 1920, 1080, 1920, "lanczos", 4
    )


def test_presplit_scratch_variant_bit_exact(monkeypatch):
    """The experimental pre-split bf16 row-scratch kernel (measured-reject
    r3, kept behind VPF_PALLAS_PRESPLIT) must stay bit-exact with the
    product f32-scratch kernel."""
    import numpy as np

    from videoprocessingframework_tpu.ops.pallas_fused import (
        fused_yuv420_resize_rgb_pallas,
    )

    y = RNG.integers(0, 256, (1, 96, 512), np.uint8)
    u = RNG.integers(0, 256, (1, 48, 256), np.uint8)
    v = RNG.integers(0, 256, (1, 48, 256), np.uint8)

    def run():
        return np.asarray(
            fused_yuv420_resize_rgb_pallas(
                y, u, v, out_h=32, out_w=48,
                space=ColorSpace.BT_709, rng=ColorRange.MPEG,
                interpret=True,
            )
        )

    monkeypatch.setenv("VPF_PALLAS_PRESPLIT", "0")
    base = run()
    monkeypatch.setenv("VPF_PALLAS_PRESPLIT", "1")
    pre = run()
    np.testing.assert_array_equal(base, pre)
