"""Resize kernels: separable interpolation as MXU matmuls.

TPU-first re-design of the reference's NPP Lanczos resize
(src/TC/src/Tasks.cpp:1134-1503, ResizeSurface): a separable resampler
``out = R @ img @ Cᵀ`` where R (H_out×H_in) and C (W_out×W_in) are
precomputed interpolation matrices. Dense matmuls map straight onto the
MXU and batch over frames and channels, so resizing N frames is two
batched matmuls — no gathers, no scalar loops. Supported filters:

* ``lanczos``  — 3-lobe Lanczos (the reference's NPPI_INTER_LANCZOS
  analog; fixed 6-tap kernel, no antialiasing scaling — same as NPP's
  plain Lanczos interpolation mode)
* ``bilinear`` — 2-tap triangle
* ``nearest``  — 1-tap

Matrices use dst-pixel-center mapping ``s = (i + 0.5)·scale − 0.5`` with
edge clamping and per-row weight normalization.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.enums import PixelFormat
from ..core.surface import Surface
from ..core import geometry
from ..utils.tracing import trace_range

F = PixelFormat

_SUPPORTED = ("lanczos", "bilinear", "nearest")


def _lanczos(x: np.ndarray, a: int = 3) -> np.ndarray:
    x = np.abs(x)
    out = np.sinc(x) * np.sinc(x / a)
    return np.where(x < a, out, 0.0)


@lru_cache(maxsize=256)
def resize_matrix(
    n_in: int, n_out: int, method: str = "lanczos", window=None
) -> np.ndarray:
    """(n_out, n_in) float32 interpolation matrix, rows sum to 1.

    ``window=(start, length)`` resamples only that source span (the NPP
    ROI-resize analog, `nppiResize* oSrcROI`): output pixel centers map
    into [start, start+length) instead of the full axis. Taps falling
    just outside the window use the REAL neighboring pixels (no
    replicated crop seam); taps beyond the frame clamp to the edge as
    usual. ``window=None`` is the full axis.
    """
    if method not in _SUPPORTED:
        raise ValueError(f"unknown resize method {method!r}")
    if window is None:
        start, length = 0.0, float(n_in)
    else:
        start, length = float(window[0]), float(window[1])
        if not (length > 0 and 0.0 <= start and start + length <= n_in):
            raise ValueError(
                f"window {window} outside source axis of {n_in}"
            )
    scale = length / n_out
    dst = np.arange(n_out, dtype=np.float64)
    src = start + (dst + 0.5) * scale - 0.5
    m = np.zeros((n_out, n_in), dtype=np.float64)
    if method == "nearest":
        idx = np.clip(np.floor(src + 0.5).astype(np.int64), 0, n_in - 1)
        m[np.arange(n_out), idx] = 1.0
    else:
        a = 3 if method == "lanczos" else 1
        base = np.floor(src).astype(np.int64)
        for k in range(-a + 1, a + 1):
            tap = base + k
            w = (
                _lanczos(src - tap, a)
                if method == "lanczos"
                else np.maximum(0.0, 1.0 - np.abs(src - tap))
            )
            np.add.at(m, (np.arange(n_out), np.clip(tap, 0, n_in - 1)), w)
        m /= m.sum(axis=1, keepdims=True)
    return m.astype(np.float32)


@partial(jax.jit, static_argnames=("h_out", "w_out", "method", "round_u8"))
def resize_plane(
    img: jnp.ndarray,
    *,
    h_out: int,
    w_out: int,
    method: str = "lanczos",
    round_u8: bool = True,
) -> jnp.ndarray:
    """Resize (..., H, W) or (..., H, W, C) arrays via two MXU matmuls."""
    has_c = img.ndim >= 3 and img.shape[-1] <= 4 and img.ndim > 2
    # canonicalize to (..., H, W, C)
    x = img if has_c else img[..., None]
    h_in, w_in = x.shape[-3], x.shape[-2]
    r = jnp.asarray(resize_matrix(h_in, h_out, method))
    c = jnp.asarray(resize_matrix(w_in, w_out, method))
    xf = x.astype(jnp.float32)
    # rows: (h_out, h_in) @ (..., h_in, w_in, C)
    t = jnp.einsum("oh,...hwc->...owc", r, xf, precision="highest")
    y = jnp.einsum("pw,...hwc->...hpc", c, t, precision="highest")
    if jnp.issubdtype(img.dtype, jnp.integer):
        if round_u8:
            info = jnp.iinfo(img.dtype)
            y = jnp.clip(jnp.rint(y), info.min, info.max).astype(img.dtype)
        # else: caller wants the float32 intermediate (fusion)
    else:
        y = y.astype(img.dtype)
    return y if has_c else y[..., 0]


def resize_packed3(img: jnp.ndarray, h_out: int, w_out: int, method="lanczos"):
    """(..., H, 3W) interleaved → (..., h_out, 3·w_out)."""
    x = img.reshape(*img.shape[:-1], img.shape[-1] // 3, 3)
    y = resize_plane(x, h_out=h_out, w_out=w_out, method=method)
    return y.reshape(*y.shape[:-2], y.shape[-2] * 3)


class SurfaceResizer:
    """Fixed-target resizer over Surfaces (PySurfaceResizer analog,
    src/PyNvCodec/src/PySurfaceResizer.cpp). Handles every format family
    the reference does: packed 8-bit C3 (RGB/BGR), planar 8-bit per plane
    (YUV420/YCbCr/YUV444/RGB_PLANAR/Y/NV12), packed/planar float32."""

    def __init__(self, width: int, height: int, fmt: PixelFormat,
                 method: str = "lanczos"):
        self.width = width
        self.height = height
        self.format = PixelFormat(fmt)
        self.method = method
        if self.format not in geometry.PLANE_SPECS:
            raise ValueError(f"unsupported format {fmt}")

    def run_planes(self, planes: Tuple[jnp.ndarray, ...]) -> tuple:
        """Resize batched plane arrays (leading N) to the target size."""
        fmt = self.format
        specs = geometry.PLANE_SPECS[fmt]
        out = []
        for spec, p in zip(specs, planes):
            th = (self.height * spec.height_num) // spec.height_den
            tw = (self.width * spec.width_num) // spec.width_den
            if fmt in (F.RGB, F.BGR, F.RGB_32F):
                out.append(resize_packed3(p, th, tw, self.method))
            elif fmt in (F.NV12, F.NV12_PLANAR, F.P10, F.P12) and spec.channels == 2:
                # interleaved UV: resize U and V separately
                s = p.reshape(*p.shape[:-1], p.shape[-1] // 2, 2)
                y = resize_plane(s, h_out=th, w_out=tw, method=self.method)
                out.append(y.reshape(*y.shape[:-2], y.shape[-2] * 2))
            elif fmt in (F.RGB_PLANAR, F.RGB_32F_PLANAR):
                n, h3, w = p.shape
                x = p.reshape(n, 3, h3 // 3, w)
                y = resize_plane(
                    x, h_out=self.height, w_out=tw, method=self.method
                )
                out.append(y.reshape(n, 3 * self.height, tw))
            else:
                out.append(resize_plane(p, h_out=th, w_out=tw, method=self.method))
        return tuple(out)

    def run(self, src: Surface) -> Surface:
        if src.format != self.format:
            raise ValueError(
                f"Surface format {src.format.name} != resizer format "
                f"{self.format.name}"
            )
        batched = tuple(p[None] for p in src.planes)
        with trace_range("ResizeSurface"):
            out = self.run_planes(batched)
        return Surface(self.format, self.width, self.height, [p[0] for p in out])

    Execute = run
