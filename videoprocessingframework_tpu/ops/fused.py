"""Fused per-frame pipelines: CSC + resize + normalize in ONE compiled op.

The reference executes its pipeline as 4-5 separate NPP kernels, each
cloning its output surface (SampleTorchResnet.py chain; clone-per-stage
noted at SURVEY.md §3.4-3.5). On TPU the whole post-decode chain is one
XLA program: uint8 planes → float32 VPU math (chroma upsample + color
matrix) → MXU resize matmuls → normalize, with no intermediate HBM
round-trips for the fused stages XLA folds together.

Fidelity note: the fused path resizes in float32 *before* the final
quantization instead of re-quantizing between stages, so it is strictly
more precise than the reference's u8-stage chain. The per-stage ops in
ops/convert.py / ops/resize.py keep exact stage-by-stage semantics when
parity matters.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.enums import ColorRange, ColorSpace, PixelFormat
from . import colorspace as cs
from .convert import _deinterleave_uv, _upsample2, _round_u8
from .normalize import IMAGENET_MEAN, IMAGENET_STD
from .resize import resize_matrix

F = PixelFormat


def _csc_to_rgb_f32(y, u, v, space, rng):
    m, off = cs.rgb_from_ycbcr_matrix(space, rng)
    ycc = jnp.stack([y, u, v], axis=-1).astype(jnp.float32) - jnp.asarray(
        off, jnp.float32
    )
    return jnp.einsum(
        "...c,dc->...d", ycc, jnp.asarray(m, jnp.float32), precision="highest"
    )


def _resize_f32(img, h_out, w_out, method):
    h_in, w_in = img.shape[-3], img.shape[-2]
    if (h_in, w_in) == (h_out, w_out):
        return img
    r = jnp.asarray(resize_matrix(h_in, h_out, method))
    c = jnp.asarray(resize_matrix(w_in, w_out, method))
    t = jnp.einsum("oh,...hwc->...owc", r, img, precision="highest")
    return jnp.einsum("pw,...hwc->...hpc", c, t, precision="highest")


@partial(
    jax.jit,
    static_argnames=(
        "src_format",
        "space",
        "rng",
        "out_h",
        "out_w",
        "method",
        "output",
        "mean",
        "std",
        "swap",
        "compute_dtype",
    ),
)
def decode_postproc(
    *planes,
    src_format: PixelFormat,
    space: ColorSpace,
    rng: ColorRange,
    out_h: int,
    out_w: int,
    method: str = "lanczos",
    output: str = "rgb_u8",
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    swap: bool = False,
    compute_dtype=jnp.float32,
):
    """Fused (N-batched) decode post-processing.

    planes: NV12 → (y, uv); YUV420 → (y, u, v); YUV444 → (y, u, v).
    output: 'rgb_u8' (N,H,W,3 u8) | 'rgb_f32' ([0,1]) |
            'normalized' (NHWC f32) | 'normalized_nchw' (NCHW f32).
    """
    fmt = PixelFormat(src_format)
    if fmt in (F.NV12, F.NV12_PLANAR) and len(planes) == 1:
        # packed layout: one (N, H·3/2, W) buffer (y rows then uv rows) —
        # the batched pipeline uploads each batch as ONE contiguous array
        packed = planes[0]
        h = packed.shape[-2] * 2 // 3
        planes = (packed[..., :h, :], packed[..., h:, :])
    if fmt in (F.NV12, F.NV12_PLANAR):
        y, uv = planes
        u, v = _deinterleave_uv(uv)
        u, v = _upsample2(u), _upsample2(v)
    elif fmt in (F.YUV420, F.YCBCR):
        y, u, v = planes
        u, v = _upsample2(u), _upsample2(v)
    elif fmt == F.YUV444:
        y, u, v = planes
    elif fmt in (F.P10, F.P12):
        y, uv = planes
        y = y.astype(jnp.float32) * (1.0 / 256.0)
        u, v = _deinterleave_uv(uv.astype(jnp.float32) * (1.0 / 256.0))
        u, v = _upsample2(u), _upsample2(v)
    else:
        raise ValueError(f"decode_postproc: unsupported source {fmt}")

    rgb = _csc_to_rgb_f32(y, u, v, space, rng)
    if swap:
        rgb = rgb[..., ::-1]
    if compute_dtype != jnp.float32:
        # bf16 intermediates halve VPU/HBM traffic on the resize; outside
        # the ≤1-ULP parity path — use for model feeds, not for u8 parity.
        rgb = rgb.astype(compute_dtype)
    rgb = _resize_f32(rgb, out_h, out_w, method).astype(jnp.float32)

    if output == "rgb_u8":
        return _round_u8(rgb)
    if output == "rgb_f32":
        return jnp.clip(rgb * (1.0 / 255.0), 0.0, 1.0)
    x = jnp.clip(rgb * (1.0 / 255.0), 0.0, 1.0)
    x = (x - jnp.asarray(mean, jnp.float32)) * (
        1.0 / jnp.asarray(std, jnp.float32)
    )
    if output == "normalized_nchw":
        return jnp.moveaxis(x, -1, 1)
    if output == "normalized":
        return x
    raise ValueError(f"unknown output mode {output!r}")


class FusedPipeline:
    """Configured fused pipeline: call with batched planes, get model input.

    Binds (src_format, colorimetry, target size, output mode) once; each
    call is one compiled XLA program per input shape.
    """

    def __init__(
        self,
        src_format: PixelFormat,
        color_space: ColorSpace,
        color_range: ColorRange,
        out_size: Tuple[int, int],  # (width, height)
        method: str = "lanczos",
        output: str = "rgb_u8",
        mean: Sequence[float] = tuple(IMAGENET_MEAN),
        std: Sequence[float] = tuple(IMAGENET_STD),
        device=None,
    ):
        self.src_format = PixelFormat(src_format)
        self.space = ColorSpace(color_space)
        self.range = ColorRange(color_range)
        self.out_w, self.out_h = out_size
        self.method = method
        self.output = output
        self.mean = tuple(mean)
        self.std = tuple(std)
        self.device = device

    def __call__(self, *planes):
        return decode_postproc(
            *planes,
            src_format=self.src_format,
            space=self.space,
            rng=self.range,
            out_h=self.out_h,
            out_w=self.out_w,
            method=self.method,
            output=self.output,
            mean=self.mean,
            std=self.std,
        )
