"""Batched color-space / pixel-format conversion kernels (JAX).

The device-side equivalent of the reference's 23-impl NPP dispatch
(src/TC/src/TasksColorCvt.cpp:1308-1367), re-designed TPU-first:

* every conversion is a **batched** pure function over (N, …) plane arrays,
  so one compiled kernel serves any number of parallel streams;
* 8-bit math runs as float32 on the VPU (load u8 → f32, 3×3 matrix,
  round-half-to-even, saturate, store u8) and XLA fuses the chroma
  upsample + matrix + rounding into one pass over HBM;
* conversions compose inside one ``jax.jit`` (see ops/fused.py) instead of
  the reference's clone-per-stage chain.

Supported (ColorSpace, ColorRange) combinations and defaults are enforced
exactly as the reference does — see ops/colorspace.py.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.enums import ColorRange, ColorSpace, PixelFormat
from ..core.exceptions import UnsupportedConversion
from ..core.packet import ColorspaceConversionContext
from ..core.surface import Surface
from ..utils.tracing import trace_range
from . import colorspace as cs

F = PixelFormat


def _round_u8(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jnp.rint(x), 0.0, 255.0).astype(jnp.uint8)


def _upsample2(c: jnp.ndarray) -> jnp.ndarray:
    """(..., H/2, W/2) → (..., H, W) 2×2 replicate (NPP nearest)."""
    return jnp.repeat(jnp.repeat(c, 2, axis=-2), 2, axis=-1)


def _downsample2(c: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) float → (..., H/2, W/2) 2×2 mean."""
    h, w = c.shape[-2], c.shape[-1]
    c = c.reshape(*c.shape[:-2], h // 2, 2, w // 2, 2)
    return (c.sum(axis=-1).sum(axis=-2)) * 0.25


def _deinterleave_uv(uv: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NV12 chroma (..., H/2, W) → U, V each (..., H/2, W/2)."""
    s = uv.reshape(*uv.shape[:-1], uv.shape[-1] // 2, 2)
    return s[..., 0], s[..., 1]


def _interleave_uv(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    s = jnp.stack([u, v], axis=-1)
    return s.reshape(*s.shape[:-2], s.shape[-2] * 2)


def _packed3(p: jnp.ndarray) -> jnp.ndarray:
    """(N, H, 3W) interleaved → (N, H, W, 3)."""
    return p.reshape(*p.shape[:-1], p.shape[-1] // 3, 3)


def _pack3(img: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, 3) → (N, H, 3W)."""
    return img.reshape(*img.shape[:-2], img.shape[-2] * 3)


def _planar3(p: jnp.ndarray) -> jnp.ndarray:
    """(N, 3H, W) stacked → (N, H, W, 3)."""
    n, h3, w = p.shape
    return jnp.moveaxis(p.reshape(n, 3, h3 // 3, w), 1, -1)


def _to_planar3(img: jnp.ndarray) -> jnp.ndarray:
    n, h, w, _ = img.shape
    return jnp.moveaxis(img, -1, 1).reshape(n, 3 * h, w)


# -- core matrix applications (float32 on the VPU) --------------------------


def _apply_to_rgb(y, cb, cr, space: ColorSpace, rng: ColorRange,
                  fixed=None):
    if fixed is not None:
        return _apply_to_rgb_fixed(y, cb, cr, space, rng, *fixed)
    m, off = cs.rgb_from_ycbcr_matrix(space, rng)
    m32 = jnp.asarray(m, jnp.float32)
    off32 = jnp.asarray(off, jnp.float32)
    ycc = jnp.stack([y, cb, cr], axis=-1).astype(jnp.float32) - off32
    rgb = jnp.einsum("...c,dc->...d", ycc, m32, precision="highest")
    return _round_u8(rgb)


#: rounding modes for the NPP fixed-point emulation (half_up is the
#: classic DSP `(acc + 2^(q-1)) >> q`; half_even adds the quotient's own
#: LSB so exact ties round to even; truncate is a plain floor shift)
FIXED_ROUNDINGS = ("half_up", "half_even", "truncate")


def quantize_csc_matrix(space: ColorSpace, rng: ColorRange, q: int):
    """Integer CSC coefficients for the fixed-point emulation: the exact
    ITU matrix scaled by 2**q, rounded to nearest — the |ΔM| ≤ 2^-(q+1)
    per-entry model docs/fidelity.md's analytic NPP bound is built on.
    Returns (mq int32 [3,3], off int32 [3]); offsets are exact integers
    (0/16 luma, 128 chroma) so quantization touches only the matrix."""
    if not 1 <= q <= 20:
        # |acc| ≤ 3·255·max|M|·2^q ≈ 1630·2^q must stay inside int32
        raise ValueError(f"q={q} outside the int32-safe range [1, 20]")
    m, off = cs.rgb_from_ycbcr_matrix(space, rng)
    mq = np.rint(np.asarray(m, np.float64) * (1 << q)).astype(np.int32)
    offi = np.rint(np.asarray(off, np.float64)).astype(np.int32)
    return mq, offi


def _apply_to_rgb_fixed(y, cb, cr, space: ColorSpace, rng: ColorRange,
                        q: int = 10, rounding: str = "half_up"):
    """NPP fixed-point emulation (VERDICT r4 #4): integer matrix ×
    integer pixel with parameterized coefficient precision ``q``
    (fractional bits) and ``rounding``, matching the documented
    structure of NPP's fixed-function CSC kernels
    (TasksColorCvt.cpp:142-169 dispatches to them). All arithmetic is
    int32 on the VPU — no float anywhere, so the result is bit-exact
    reproducible across backends and measurable against the float64
    golden (docs/fidelity.md records the measured deviations)."""
    if rounding not in FIXED_ROUNDINGS:
        raise ValueError(
            f"rounding={rounding!r} not in {FIXED_ROUNDINGS}"
        )
    mq, offi = quantize_csc_matrix(space, rng, q)
    ycc = (
        jnp.stack([y, cb, cr], axis=-1).astype(jnp.int32)
        - jnp.asarray(offi)
    )
    acc = jnp.einsum(
        "...c,dc->...d", ycc, jnp.asarray(mq), precision="highest"
    )
    if rounding == "half_up":
        out = (acc + (1 << (q - 1))) >> q
    elif rounding == "half_even":
        out = (acc + (1 << (q - 1)) - 1 + ((acc >> q) & 1)) >> q
    else:  # truncate
        out = acc >> q
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def _apply_from_rgb(rgb_f32, space: ColorSpace, rng: ColorRange):
    """(…, 3) float32 RGB → unrounded float32 YCbCr (chroma still full-res)."""
    m, off = cs.ycbcr_from_rgb_matrix(space, rng)
    m32 = jnp.asarray(m, jnp.float32)
    off32 = jnp.asarray(off, jnp.float32)
    return (
        jnp.einsum("...c,dc->...d", rgb_f32, m32, precision="highest") + off32
    )


# -- batched conversions (jitted; space/rng static) --------------------------


@partial(jax.jit, static_argnames=("space", "rng", "swap", "fixed"))
def nv12_to_rgb(y, uv, *, space: ColorSpace, rng: ColorRange,
                swap: bool = False, fixed=None):
    """y (N,H,W), uv (N,H/2,W) → (N,H,W,3) RGB (or BGR when swap).

    ``fixed=(q, rounding)`` switches the CSC to the NPP fixed-point
    emulation (integer math, see :func:`_apply_to_rgb_fixed`)."""
    u, v = _deinterleave_uv(uv)
    rgb = _apply_to_rgb(y, _upsample2(u), _upsample2(v), space, rng, fixed)
    return rgb[..., ::-1] if swap else rgb


@partial(jax.jit, static_argnames=("space", "rng", "swap", "fixed"))
def yuv420_to_rgb(y, u, v, *, space, rng, swap: bool = False, fixed=None):
    rgb = _apply_to_rgb(y, _upsample2(u), _upsample2(v), space, rng, fixed)
    return rgb[..., ::-1] if swap else rgb


@partial(jax.jit, static_argnames=("space", "rng", "swap", "fixed"))
def yuv444_to_rgb(y, u, v, *, space, rng, swap: bool = False, fixed=None):
    rgb = _apply_to_rgb(y, u, v, space, rng, fixed)
    return rgb[..., ::-1] if swap else rgb


@partial(jax.jit, static_argnames=("space", "rng", "swap"))
def rgb_to_yuv420(img, *, space, rng, swap: bool = False):
    """(N,H,W,3) → y (N,H,W), u, v (N,H/2,W/2)."""
    if swap:
        img = img[..., ::-1]
    ycc = _apply_from_rgb(img.astype(jnp.float32), space, rng)
    y = _round_u8(ycc[..., 0])
    u = _round_u8(_downsample2(ycc[..., 1]))
    v = _round_u8(_downsample2(ycc[..., 2]))
    return y, u, v


@partial(jax.jit, static_argnames=("space", "rng", "swap"))
def rgb_to_yuv444(img, *, space, rng, swap: bool = False):
    if swap:
        img = img[..., ::-1]
    ycc = _apply_from_rgb(img.astype(jnp.float32), space, rng)
    return (
        _round_u8(ycc[..., 0]),
        _round_u8(ycc[..., 1]),
        _round_u8(ycc[..., 2]),
    )


@jax.jit
def rgb_to_gray(img):
    w = jnp.asarray(cs.GRAY_WEIGHTS, jnp.float32)
    return _round_u8(img.astype(jnp.float32) @ w)


@jax.jit
def p16_to_u8(plane):
    """MSB-aligned 16-bit → 8-bit (reference p16_nv12: /256, round, sat)."""
    return _round_u8(plane.astype(jnp.float32) * (1.0 / 256.0))


@jax.jit
def u8_to_f32_unit(img):
    """uint8 → float32 in [0,1] (nppiScale_8u32f semantics)."""
    return img.astype(jnp.float32) * jnp.float32(1.0 / 255.0)


# -- conversion registry ------------------------------------------------------

_NEEDS_CTX_TO_RGB = "to_rgb"
_NEEDS_CTX_FROM_RGB = "from_rgb"


def _check_combo(pair_key: str, combos_key: str, combo) -> None:
    table = (
        cs.TO_RGB_COMBOS if combos_key == _NEEDS_CTX_TO_RGB else cs.FROM_RGB_COMBOS
    )
    allowed = table[pair_key]
    if combo not in allowed:
        space, rng = combo
        raise UnsupportedConversion(
            f"{pair_key}: {ColorSpace(space).name} / {ColorRange(rng).name} "
            f"conversion isn't supported. Supported combinations: "
            + ", ".join(
                f"({s.name},{r.name})" for s, r in sorted(allowed)
            )
        )


class SurfaceConverter:
    """Per-pair converter over Surfaces (PySurfaceConverter analog).

    One instance is bound to (width, height, src_format, dst_format) like
    the reference (PySurfaceConverter.cpp:28-121); ``run()`` applies the
    conversion to a batch of Surfaces or raw plane arrays. The full pair
    list matches ConvertSurface's dispatch (TasksColorCvt.cpp:1308-1367).
    """

    #: (src, dst) → implementation descriptor
    PAIRS: Dict[Tuple[PixelFormat, PixelFormat], dict] = {}

    def __init__(
        self,
        width: int,
        height: int,
        src_format: PixelFormat,
        dst_format: PixelFormat,
        fidelity: str = "exact",
        fixed_q: int = 10,
        fixed_rounding: str = "half_up",
    ):
        self.width = width
        self.height = height
        self.src_format = PixelFormat(src_format)
        self.dst_format = PixelFormat(dst_format)
        key = (self.src_format, self.dst_format)
        if key not in self.PAIRS:
            raise UnsupportedConversion(
                f"Unsupported pixel format conversion: {self.src_format} "
                f"to {self.dst_format}"
            )
        self._impl = self.PAIRS[key]
        if fidelity not in ("exact", "npp-fixed"):
            raise ValueError(
                f"fidelity={fidelity!r}: expected 'exact' (float math, "
                "round(exact) — the default) or 'npp-fixed' (integer "
                "matrix × integer pixel emulation of NPP's fixed-point "
                "CSC kernels; see docs/fidelity.md)"
            )
        self._fixed = None
        if fidelity == "npp-fixed":
            if not self._impl.get("fixed_ok"):
                raise UnsupportedConversion(
                    f"fidelity='npp-fixed' applies to the YCbCr→RGB "
                    f"matrix conversions (the NPP fixed-function kernels "
                    f"being emulated), not {self.src_format.name}→"
                    f"{self.dst_format.name}"
                )
            if fixed_rounding not in FIXED_ROUNDINGS:
                raise ValueError(
                    f"fixed_rounding={fixed_rounding!r} not in "
                    f"{FIXED_ROUNDINGS}"
                )
            quantize_csc_matrix(  # validates q's int32-safe range
                ColorSpace.BT_709, ColorRange.MPEG, int(fixed_q)
            )
            self._fixed = (int(fixed_q), fixed_rounding)

    def run_planes(
        self, planes: tuple, cc: Optional[ColorspaceConversionContext] = None
    ) -> tuple:
        """Convert batched plane arrays (each with leading N)."""
        impl = self._impl
        kind = impl.get("ctx")
        if kind is None:
            return impl["fn"](*planes)
        default = (
            cs.DEFAULT_TO_RGB if kind == _NEEDS_CTX_TO_RGB else cs.DEFAULT_FROM_RGB
        )
        combo = cs.resolve_ctx(cc, default)
        _check_combo(impl["combos"], kind, combo)
        if self._fixed is not None:
            return impl["fn"](
                *planes, space=combo[0], rng=combo[1], fixed=self._fixed
            )
        return impl["fn"](*planes, space=combo[0], rng=combo[1])

    def run(
        self, src: Surface, cc: Optional[ColorspaceConversionContext] = None
    ) -> Surface:
        """Convert one Surface (adds/strips the batch dim)."""
        if (src.width, src.height) != (self.width, self.height):
            raise ValueError(
                f"Surface is {src.width}x{src.height}, converter is "
                f"{self.width}x{self.height}"
            )
        if src.format != self.src_format:
            raise ValueError(
                f"Surface format {src.format.name} != converter input "
                f"{self.src_format.name}"
            )
        batched = tuple(p[None] for p in src.planes)
        with trace_range(self._impl.get("name", "ConvertSurface")):
            out = self.run_planes(batched, cc)
        if not isinstance(out, tuple):
            out = (out,)
        planes = [p[0] for p in out]
        ow, oh = self._impl.get("out_size", lambda w, h: (w, h))(
            self.width, self.height
        )
        return Surface(self.dst_format, ow, oh, planes)

    # same spelling as the reference
    Execute = run


def _register(src, dst, fn, ctx=None, combos=None, name=None,
              fixed_ok=False):
    SurfaceConverter.PAIRS[(src, dst)] = {
        "fn": fn,
        "ctx": ctx,
        "combos": combos,
        "name": name or f"{src.name}->{dst.name}",
        # supports the fixed=(q, rounding) NPP-emulation kwarg
        "fixed_ok": fixed_ok,
    }


# ---- plane-level adapter functions (Surface layout in/out) ----------------

# packed RGB/BGR plane is (N, H, 3W); planar is (N, 3H, W)


def _w(fn):
    """no-op wrapper to keep registry entries uniform."""
    return fn


def _nv12_rgb(y, uv, *, space, rng, fixed=None):
    return (_pack3(nv12_to_rgb(y, uv, space=space, rng=rng, fixed=fixed)),)


def _nv12_bgr(y, uv, *, space, rng, fixed=None):
    return (_pack3(nv12_to_rgb(y, uv, space=space, rng=rng, swap=True,
                               fixed=fixed)),)


def _yuv420_rgb(y, u, v, *, space, rng, fixed=None):
    return (_pack3(yuv420_to_rgb(y, u, v, space=space, rng=rng,
                                 fixed=fixed)),)


def _yuv420_bgr(y, u, v, *, space, rng, fixed=None):
    return (_pack3(yuv420_to_rgb(y, u, v, space=space, rng=rng, swap=True,
                                 fixed=fixed)),)


def _ycbcr_bgr(y, u, v, *, space, rng, fixed=None):
    return (_pack3(yuv420_to_rgb(y, u, v, space=space, rng=rng, swap=True,
                                 fixed=fixed)),)


def _yuv444_bgr(y, u, v, *, space, rng, fixed=None):
    return (_pack3(yuv444_to_rgb(y, u, v, space=space, rng=rng, swap=True,
                                 fixed=fixed)),)


def _yuv444_rgb(y, u, v, *, space, rng, fixed=None):
    return (_pack3(yuv444_to_rgb(y, u, v, space=space, rng=rng,
                                 fixed=fixed)),)


def _yuv444_rgb_planar(y, u, v, *, space, rng, fixed=None):
    return (_to_planar3(yuv444_to_rgb(y, u, v, space=space, rng=rng,
                                      fixed=fixed)),)


def _rgb_yuv420(p, *, space, rng):
    return rgb_to_yuv420(_packed3(p), space=space, rng=rng)


def _rgb_yuv444(p, *, space, rng):
    return rgb_to_yuv444(_packed3(p), space=space, rng=rng)


def _rgb_planar_yuv444(p, *, space, rng):
    return rgb_to_yuv444(_planar3(p), space=space, rng=rng)


def _bgr_ycbcr(p, *, space, rng):
    return rgb_to_yuv420(_packed3(p), space=space, rng=rng, swap=True)


def _bgr_yuv444(p, *, space, rng):
    # reference bgr_yuv444 (TasksColorCvt.cpp:617-664)
    return rgb_to_yuv444(_packed3(p), space=space, rng=rng, swap=True)


@jax.jit
def _nv12_yuv420(y, uv):
    u, v = _deinterleave_uv(uv)
    return y, u, v


@jax.jit
def _yuv420_nv12(y, u, v):
    return y, _interleave_uv(u, v)


@jax.jit
def _p16_nv12(y, uv):
    return p16_to_u8(y), p16_to_u8(uv)


@jax.jit
def _rgb_deinterleave(p):
    return (_to_planar3(_packed3(p)),)


@jax.jit
def _rgb_interleave(p):
    return (_pack3(_planar3(p)),)


@jax.jit
def _swap3(p):
    return (_pack3(_packed3(p)[..., ::-1]),)


@jax.jit
def _nv12_y(y, uv):
    return (y,)


@jax.jit
def _rgb_y(p):
    return (rgb_to_gray(_packed3(p)),)


@jax.jit
def _y_yuv444(y):
    neutral = jnp.full_like(y, 128)
    return y, neutral, neutral


@jax.jit
def _rgb8_rgb32f(p):
    return (u8_to_f32_unit(p),)


@jax.jit
def _rgb32f_deinterleave(p):
    return (_to_planar3(_packed3(p)),)


# ---- the 23-pair table (ConvertSurface ctor, TasksColorCvt.cpp:1308-1367) --

_register(F.NV12, F.YUV420, _nv12_yuv420)
_register(F.YUV420, F.NV12, _yuv420_nv12)
_register(F.P10, F.NV12, _p16_nv12)
_register(F.P12, F.NV12, _p16_nv12)
_register(F.NV12, F.RGB, _nv12_rgb, ctx=_NEEDS_CTX_TO_RGB, combos="nv12",
           fixed_ok=True)
_register(F.NV12, F.BGR, _nv12_bgr, ctx=_NEEDS_CTX_TO_RGB, combos="nv12",
           fixed_ok=True)
_register(F.RGB, F.RGB_PLANAR, _rgb_deinterleave)
_register(F.RGB_PLANAR, F.RGB, _rgb_interleave)
_register(
    F.RGB_PLANAR, F.YUV444, _rgb_planar_yuv444,
    ctx=_NEEDS_CTX_FROM_RGB, combos="rgb_yuv444",
)
_register(F.Y, F.YUV444, _y_yuv444)
_register(F.YUV420, F.RGB, _yuv420_rgb, ctx=_NEEDS_CTX_TO_RGB,
           combos="yuv420", fixed_ok=True)
_register(
    F.RGB, F.YUV420, _rgb_yuv420, ctx=_NEEDS_CTX_FROM_RGB, combos="rgb_yuv420"
)
_register(
    F.RGB, F.YUV444, _rgb_yuv444, ctx=_NEEDS_CTX_FROM_RGB, combos="rgb_yuv444"
)
_register(
    F.BGR, F.YCBCR, _bgr_ycbcr, ctx=_NEEDS_CTX_FROM_RGB, combos="bgr_ycbcr"
)
_register(
    F.BGR, F.YUV444, _bgr_yuv444, ctx=_NEEDS_CTX_FROM_RGB, combos="bgr_yuv444"
)
_register(F.RGB, F.BGR, _swap3)
_register(F.BGR, F.RGB, _swap3)
_register(F.YUV420, F.BGR, _yuv420_bgr, ctx=_NEEDS_CTX_TO_RGB,
           combos="yuv420", fixed_ok=True)
_register(F.YCBCR, F.BGR, _ycbcr_bgr, ctx=_NEEDS_CTX_TO_RGB,
           combos="ycbcr", fixed_ok=True)
_register(
    F.YUV444, F.BGR, _yuv444_bgr, ctx=_NEEDS_CTX_TO_RGB,
    combos="yuv444_bgr", fixed_ok=True,
)
_register(
    F.YUV444, F.RGB, _yuv444_rgb, ctx=_NEEDS_CTX_TO_RGB,
    combos="yuv444_rgb", fixed_ok=True,
)
_register(
    F.YUV444, F.RGB_PLANAR, _yuv444_rgb_planar,
    ctx=_NEEDS_CTX_TO_RGB, combos="yuv444_rgb", fixed_ok=True,
)
def _nv12_rgb_planar(y, uv, *, space, rng):
    """Extension pair (not in the reference's 23): NV12 → planar RGB, the
    layout models consume. Uses the hand-tiled Pallas kernel on TPU when
    the geometry is tile-aligned (~1.8x the XLA path); XLA otherwise."""
    h, w = y.shape[-2], y.shape[-1]
    from .pallas_kernels import nv12_to_rgb_planar_pallas, pallas_supported

    if pallas_supported(h, w) and jax.default_backend() not in ("cpu",):
        out = nv12_to_rgb_planar_pallas(y, uv, space=space, rng=rng)
    else:
        out = jnp.moveaxis(nv12_to_rgb(y, uv, space=space, rng=rng), -1, 1)
    n = out.shape[0]
    return (out.reshape(n, 3 * h, w),)


def _yuv420_rgb_planar(y, u, v, *, space, rng):
    """Extension pair: planar 4:2:0 → planar RGB (Pallas-accelerated)."""
    h, w = y.shape[-2], y.shape[-1]
    from .pallas_kernels import pallas_supported, yuv420_to_rgb_planar_pallas

    if pallas_supported(h, w) and jax.default_backend() not in ("cpu",):
        out = yuv420_to_rgb_planar_pallas(y, u, v, space=space, rng=rng)
    else:
        out = jnp.moveaxis(yuv420_to_rgb(y, u, v, space=space, rng=rng), -1, 1)
    n = out.shape[0]
    return (out.reshape(n, 3 * h, w),)


_register(
    F.NV12, F.RGB_PLANAR, _nv12_rgb_planar,
    ctx=_NEEDS_CTX_TO_RGB, combos="nv12",
)
_register(
    F.YUV420, F.RGB_PLANAR, _yuv420_rgb_planar,
    ctx=_NEEDS_CTX_TO_RGB, combos="yuv420",
)
_register(F.NV12, F.Y, _nv12_y)
_register(F.RGB, F.RGB_32F, _rgb8_rgb32f)
_register(F.RGB, F.Y, _rgb_y)
_register(F.RGB_32F, F.RGB_32F_PLANAR, _rgb32f_deinterleave)
