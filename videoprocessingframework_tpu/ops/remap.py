"""Remap kernel: per-pixel coordinate lookup (undistort / warp).

Re-design of the reference's RemapSurface (src/TC/src/Tasks.cpp:1505-1649,
nppiRemap_8u_C3R with float x/y maps uploaded once at construction): on TPU
the remap is an XLA gather — flat indices precomputed from the maps at
construction (host, once), then per-frame work is 4 gathers + a lerp for
bilinear, fully fused and batched under jit.

Coordinates outside the source are clamped to the border (NPP leaves such
pixels unwritten; with the undistort-style maps both behaviors agree).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.enums import PixelFormat
from ..core.surface import Surface
from ..utils.tracing import trace_range

F = PixelFormat


@partial(jax.jit, static_argnames=("method",))
def remap_image(
    img: jnp.ndarray,
    xmap: jnp.ndarray,
    ymap: jnp.ndarray,
    *,
    method: str = "bilinear",
) -> jnp.ndarray:
    """img (N, H, W, C); xmap/ymap (H_out, W_out) float32 → (N, H_out, W_out, C)."""
    n, h, w, c = img.shape
    if method == "nearest":
        xi = jnp.clip(jnp.rint(xmap).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(jnp.rint(ymap).astype(jnp.int32), 0, h - 1)
        return img[:, yi, xi, :]
    x0 = jnp.clip(jnp.floor(xmap).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(ymap).astype(jnp.int32), 0, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = jnp.clip(xmap - x0.astype(jnp.float32), 0.0, 1.0)[None, :, :, None]
    fy = jnp.clip(ymap - y0.astype(jnp.float32), 0.0, 1.0)[None, :, :, None]
    p00 = img[:, y0, x0, :].astype(jnp.float32)
    p01 = img[:, y0, x1, :].astype(jnp.float32)
    p10 = img[:, y1, x0, :].astype(jnp.float32)
    p11 = img[:, y1, x1, :].astype(jnp.float32)
    top = p00 + (p01 - p00) * fx
    bot = p10 + (p11 - p10) * fx
    out = top + (bot - top) * fy
    if jnp.issubdtype(img.dtype, jnp.integer):
        info = jnp.iinfo(img.dtype)
        out = jnp.clip(jnp.rint(out), info.min, info.max).astype(img.dtype)
    else:
        out = out.astype(img.dtype)
    return out


class SurfaceRemaper:
    """Packed RGB/BGR remap with fixed maps (PySurfaceRemaper analog,
    src/PyNvCodec/src/PySurfaceRemaper.cpp: packed 8-bit C3 only)."""

    def __init__(
        self,
        xmap: np.ndarray,
        ymap: np.ndarray,
        fmt: PixelFormat = F.RGB,
        method: str = "bilinear",
    ):
        if xmap.shape != ymap.shape or xmap.ndim != 2:
            raise ValueError("x/y maps must be 2-D and equally shaped")
        if PixelFormat(fmt) not in (F.RGB, F.BGR):
            raise ValueError("remap supports packed RGB/BGR only")
        self.format = PixelFormat(fmt)
        self.method = method
        self.xmap = jnp.asarray(xmap, jnp.float32)
        self.ymap = jnp.asarray(ymap, jnp.float32)
        self.out_h, self.out_w = xmap.shape

    def run_planes(self, planes: Tuple[jnp.ndarray, ...]) -> tuple:
        p = planes[0]
        img = p.reshape(*p.shape[:-1], p.shape[-1] // 3, 3)
        out = remap_image(img, self.xmap, self.ymap, method=self.method)
        return (out.reshape(*out.shape[:-2], out.shape[-2] * 3),)

    def run(self, src: Surface) -> Surface:
        if src.format != self.format:
            raise ValueError(
                f"Surface format {src.format.name} != remaper format "
                f"{self.format.name}"
            )
        with trace_range("RemapSurface"):
            out = self.run_planes(tuple(p[None] for p in src.planes))
        return Surface(self.format, self.out_w, self.out_h, [out[0][0]])

    Execute = run
