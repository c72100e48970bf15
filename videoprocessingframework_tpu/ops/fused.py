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
from typing import Sequence, Tuple

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


def _resize_plane2d(x, rmat, cmat, dtype):
    """(N, H, W) → (N, out_h, out_w) via the two resize matmuls."""
    rmat = rmat.astype(dtype)
    cmat = cmat.astype(dtype)
    t = jnp.einsum("oh,nhw->now", rmat, x.astype(dtype), precision="highest")
    return jnp.einsum("pw,nhw->nhp", cmat, t, precision="highest")


def _chroma_collapse(mat: jnp.ndarray) -> jnp.ndarray:
    """Fold a full-res resize matrix onto the half-res chroma grid.

    With nearest (2× replicate) chroma upsampling, c_full[i] = c[i // 2],
    so  Σ_i M[o, i]·c_full[i]  ==  Σ_j (M[o, 2j] + M[o, 2j+1])·c[j]:
    summing adjacent matrix column pairs gives a half-size matrix whose
    result is bit-identical to upsample-then-resize — without ever
    materializing full-resolution chroma.
    """
    o, n = mat.shape
    return mat.reshape(o, n // 2, 2).sum(-1)


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
    elif fmt == F.YUV420 and len(planes) == 1:
        # packed planar layout: y (H rows), then u then v, each H/2×W/2
        # stored as H/4 rows of width W. Preferred hot path: the host pack
        # is pure row memcpys (no chroma interleave loop — measured ~8%
        # of the 1-core 1080p decode budget) and the slicing/reshapes here
        # are free on contiguous data.
        packed = planes[0]
        h = packed.shape[-2] * 2 // 3
        w = packed.shape[-1]
        lead = packed.shape[:-2]
        chroma = packed[..., h:, :]
        planes = (
            packed[..., :h, :],
            chroma[..., : h // 4, :].reshape(*lead, h // 2, w // 2),
            chroma[..., h // 4:, :].reshape(*lead, h // 2, w // 2),
        )
    subsampled = fmt in (F.NV12, F.NV12_PLANAR, F.YUV420, F.YCBCR, F.P10, F.P12)
    if fmt in (F.NV12, F.NV12_PLANAR):
        y, uv = planes
        u, v = _deinterleave_uv(uv)
    elif fmt in (F.YUV420, F.YCBCR):
        y, u, v = planes
    elif fmt == F.YUV444:
        y, u, v = planes
    elif fmt in (F.P10, F.P12):
        y, uv = planes
        y = y.astype(jnp.float32) * (1.0 / 256.0)
        u, v = _deinterleave_uv(uv.astype(jnp.float32) * (1.0 / 256.0))
    else:
        raise ValueError(f"decode_postproc: unsupported source {fmt}")

    h_in, w_in = y.shape[-2], y.shape[-1]
    if (h_in, w_in) != (out_h, out_w):
        # Resize-before-CSC: the color matrix is affine and every resize
        # row sums to 1, so resizing Y/Cb/Cr planes first is mathematically
        # identical to CSC-then-resize — but never materializes the
        # full-resolution f32 RGB intermediate (a ~3x HBM saving at 1080p).
        # The 2x chroma replicate-upsample folds exactly into the chroma
        # resize matrix (see _chroma_collapse), so subsampled chroma is
        # resized straight from its native half resolution.
        rmat = jnp.asarray(resize_matrix(h_in, out_h, method))
        cmat = jnp.asarray(resize_matrix(w_in, out_w, method))
        y = _resize_plane2d(y, rmat, cmat, compute_dtype)
        if subsampled:
            rc = _chroma_collapse(rmat)
            cc = _chroma_collapse(cmat)
            u = _resize_plane2d(u, rc, cc, compute_dtype)
            v = _resize_plane2d(v, rc, cc, compute_dtype)
        else:
            u = _resize_plane2d(u, rmat, cmat, compute_dtype)
            v = _resize_plane2d(v, rmat, cmat, compute_dtype)
    elif subsampled:
        u, v = _upsample2(u), _upsample2(v)

    rgb = _csc_to_rgb_f32(y, u, v, space, rng)
    if swap:
        rgb = rgb[..., ::-1]

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
