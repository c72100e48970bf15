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
import numpy as np

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
    call is one compiled program per input shape.

    ``kernel`` selects the device implementation:

    * ``"xla"`` — the jitted XLA resize-before-CSC program (f32-highest).
    * ``"pallas"`` — the hand-tiled split-bf16 Pallas kernel pair
      (ops/pallas_fused.py; ≤1 u8 ULP vs the float64 golden, ~2.5x less
      MXU work than f32-highest).
    * ``"auto"`` (default) — when the shape/format/output qualify for the
      Pallas path on a TPU backend, time both once per input shape with an
      RTT-cancelling two-point measurement and cache the winner; otherwise
      XLA. (Measured on v5e: XLA ≈ 28 µs/frame vs Pallas ≈ 33 µs at
      1080p→224, so auto currently picks XLA there — the hook exists
      because the balance is hardware-generation dependent.)
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
        kernel: str = "auto",
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
        if kernel not in ("auto", "xla", "pallas"):
            raise ValueError(f"kernel must be auto|xla|pallas, got {kernel!r}")
        self.kernel = kernel
        self._picked = {}  # input-shape key -> "xla" | "pallas"

    # -- kernel selection ---------------------------------------------------

    def _pallas_planes(self, planes):
        """Map the call planes to the Pallas kernel's (y, uv) inputs, or
        None when this input doesn't qualify."""
        if self.output != "rgb_u8" or self.method not in ("lanczos", "bilinear"):
            return None
        fmt = self.src_format
        if fmt == F.NV12 and len(planes) == 2:
            return planes
        if fmt in (F.NV12, F.YUV420) and len(planes) == 1:
            packed = planes[0]
            h = packed.shape[-2] * 2 // 3
            w = packed.shape[-1]
            y = packed[..., :h, :]
            if fmt == F.NV12:
                return y, packed[..., h:, :]
            lead = packed.shape[:-2]
            c = packed[..., h:, :]
            u = c[..., : h // 4, :].reshape(*lead, h // 2, w // 2)
            v = c[..., h // 4:, :].reshape(*lead, h // 2, w // 2)
            uv = jnp.stack([u, v], axis=-1).reshape(*lead, h // 2, w)
            return y, uv
        if fmt == F.YUV420 and len(planes) == 3:
            y, u, v = planes
            uv = jnp.stack([u, v], axis=-1).reshape(
                *u.shape[:-1], u.shape[-1] * 2
            )
            return y, uv
        return None

    def _run_pallas(self, y, uv):
        from .pallas_fused import fused_nv12_resize_rgb_pallas

        out = fused_nv12_resize_rgb_pallas(
            y, uv,
            out_h=self.out_h, out_w=self.out_w,
            space=self.space, rng=self.range, method=self.method,
        )
        return jnp.moveaxis(out, -3, -1)  # planar → NHWC like the XLA path

    def _run_xla(self, *planes):
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

    def _pick(self, planes, pallas_in):
        """Time both kernels once for this shape (RTT-cancelling slope)."""
        import time

        import jax

        def slope(fn, args):
            def chained(iters):
                @jax.jit
                def f(*a):
                    def body(c, i):
                        o = fn(a[0] + i.astype(jnp.uint8), *a[1:])
                        return c + o.astype(jnp.uint32).sum(), None
                    acc, _ = jax.lax.scan(
                        body, jnp.uint32(0), jnp.arange(iters)
                    )
                    return acc
                return f

            lo, hi = chained(4), chained(24)
            int(lo(*args)); int(hi(*args))  # compile
            t_lo = min(_walltime(lambda: int(lo(*args))) for _ in range(2))
            t_hi = min(_walltime(lambda: int(hi(*args))) for _ in range(2))
            return max(t_hi - t_lo, 1e-9)

        staged = [jax.device_put(np.asarray(p)) for p in planes]
        pallas_staged = [jax.device_put(np.asarray(p)) for p in pallas_in]
        t_xla = slope(lambda p0, *rest: self._run_xla(p0, *rest), staged)
        t_pal = slope(lambda y, uv: self._run_pallas(y, uv), pallas_staged)
        return "pallas" if t_pal < t_xla else "xla"

    def __call__(self, *planes):
        choice = self.kernel
        pallas_in = None
        if choice in ("auto", "pallas"):
            pallas_in = self._pallas_planes(planes)
            if pallas_in is not None:
                from .pallas_fused import fused_pallas_supported

                y = pallas_in[0]
                if not fused_pallas_supported(y.shape[-1], self.out_h):
                    pallas_in = None
            if pallas_in is not None:
                import jax

                if jax.devices()[0].platform == "cpu":
                    pallas_in = None  # interpret mode: never a speed win
        if choice == "pallas":
            if pallas_in is None:
                raise ValueError(
                    "pallas kernel unavailable for this input "
                    "(needs NV12/YUV420 u8, rgb_u8 output, aligned shapes, "
                    "TPU backend)"
                )
            return self._run_pallas(*pallas_in)
        if choice == "auto" and pallas_in is not None:
            key = tuple(p.shape for p in planes)
            if key not in self._picked:
                self._picked[key] = self._pick(planes, pallas_in)
            if self._picked[key] == "pallas":
                return self._run_pallas(*pallas_in)
        return self._run_xla(*planes)


def _walltime(fn) -> float:
    import time

    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0
