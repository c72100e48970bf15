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


def _bf16_split_const(m):
    """hi+lo bf16 decomposition of a constant matrix (residual ≤ 2⁻¹⁶·|m|)."""
    hi = m.astype(jnp.bfloat16)
    lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _bf16_split_f32(t):
    """Elision-proof hi+lo split of an f32 activation.

    ``thi`` keeps the top 16 bits of each float (exactly
    bf16-representable, so the bf16 cast is lossless), and
    ``tlo = t − thi`` is exact in f32 and loses ≤ 2⁻¹⁷ relative when
    rounded to bf16. The naive ``t − f32(bf16(t))`` split is removed by
    XLA's excess-precision simplification (the f32→bf16→f32 round trip
    folds to identity), which silently degrades the split to plain bf16
    rounding — measured ~0.17 mean u8 error at 1080p→224. Bit-masking
    the mantissa cannot be elided.
    """
    bits = jax.lax.bitcast_convert_type(t, jnp.uint32)
    thi_f32 = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32
    )
    return thi_f32.astype(jnp.bfloat16), (t - thi_f32).astype(jnp.bfloat16)


_ROWS_EQ = "oh,nhw->now"
_COLS_EQ = "pw,nhw->nhp"


def _split_stage1(xi, m, eq):
    """Integer input × constant matrix as hi+lo bf16 MXU passes (the
    input is exact in bf16, so only the matrix splits — 2 passes)."""
    hi, lo = _bf16_split_const(m)
    xb = xi.astype(jnp.bfloat16)
    return jnp.einsum(
        eq, hi, xb, preferred_element_type=jnp.float32
    ) + jnp.einsum(eq, lo, xb, preferred_element_type=jnp.float32)


def _split_stage2(t, m, eq):
    """f32 intermediate × constant matrix: elision-proof hi+lo split of
    the activation, lo×lo dropped (3 passes). Shared by the plane and
    NHWC resize paths so the split strategy can never desynchronize
    between the decode and encode directions."""
    mhi, mlo = _bf16_split_const(m)
    thi, tlo = _bf16_split_f32(t)
    return (
        jnp.einsum(eq, mhi, thi, preferred_element_type=jnp.float32)
        + jnp.einsum(eq, mhi, tlo, preferred_element_type=jnp.float32)
        + jnp.einsum(eq, mlo, thi, preferred_element_type=jnp.float32)
    )


def _resize_plane2d(x, rmat, cmat, dtype, mode="highest"):
    """(N, H, W) → (N, out_h, out_w) via the two resize matmuls.

    Contraction order (rows-first vs cols-first) is chosen by MAC count —
    for a 1080p→224² downscale cols-first saves ~10% because the second
    stage then contracts the short H axis.

    mode "split_bf16" (integer inputs only) runs the MXU work as hi+lo
    bf16 passes: stage 1 needs only the matrix split because u8 pixels
    are exact in bf16 (2 passes), stage 2 splits the f32 intermediate
    with the bit-mask trick and drops the lo×lo term (3 passes).
    Measured ≤1 u8 ULP vs the float64 golden (error ≈ 0.008 in u8
    units) at ~2.4× less MXU work than f32-highest's 6-pass dots —
    1.52× end-to-end on v5e at 1080p→224².
    """
    oh, ow = rmat.shape[0], cmat.shape[0]
    hin, win = x.shape[-2], x.shape[-1]
    rows_first = oh * hin * win + oh * win * ow <= (
        hin * win * ow + oh * hin * ow
    )
    if mode == "split_bf16" and jnp.issubdtype(x.dtype, jnp.integer) and (
        dtype == jnp.float32
    ):
        if rows_first:
            return _split_stage2(
                _split_stage1(x, rmat, _ROWS_EQ), cmat, _COLS_EQ
            )
        return _split_stage2(
            _split_stage1(x, cmat, _COLS_EQ), rmat, _ROWS_EQ
        )

    rmat = rmat.astype(dtype)
    cmat = cmat.astype(dtype)
    if rows_first:
        t = jnp.einsum(_ROWS_EQ, rmat, x.astype(dtype), precision="highest")
        return jnp.einsum(_COLS_EQ, cmat, t, precision="highest")
    t = jnp.einsum(_COLS_EQ, cmat, x.astype(dtype), precision="highest")
    return jnp.einsum(_ROWS_EQ, rmat, t, precision="highest")


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


def unpack_yuv_planes(fmt: PixelFormat, planes):
    """Normalize any decode_postproc input layout to (y, u, v) planes
    plus chroma-subsampling flags. Shared by the fused pipeline and the
    augmentation pipeline so packed-layout conventions can never
    diverge between the two.

    Returns ``(y, u, v, subsampled, sub_h)``; ``u``/``v`` are None for
    grayscale sources (neutral chroma is synthesized at output
    resolution after the luma resize). ``subsampled`` = 2x2 chroma
    (4:2:0 family), ``sub_h`` = horizontal-only (4:2:2).
    """
    fmt = PixelFormat(fmt)
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
        if h % 4:
            # each chroma plane occupies H/4 packed rows — H=270-style
            # even heights can't use this layout (the reshape below
            # would fail opaquely inside the jitted program)
            raise ValueError(
                f"packed planar YUV420 requires height % 4 == 0, got "
                f"{h}; pass separate (y, u, v) planes instead"
            )
        lead = packed.shape[:-2]
        chroma = packed[..., h:, :]
        planes = (
            packed[..., :h, :],
            chroma[..., : h // 4, :].reshape(*lead, h // 2, w // 2),
            chroma[..., h // 4:, :].reshape(*lead, h // 2, w // 2),
        )
    subsampled = fmt in (F.NV12, F.NV12_PLANAR, F.YUV420, F.YCBCR, F.P10, F.P12)
    sub_h = fmt == F.YUV422  # 4:2:2: horizontal-only chroma subsampling
    if fmt in (F.NV12, F.NV12_PLANAR):
        y, uv = planes
        u, v = _deinterleave_uv(uv)
    elif fmt in (F.YUV420, F.YCBCR, F.YUV422, F.YUV444):
        y, u, v = planes
    elif fmt == F.Y:
        # grayscale: neutral (constant-128) chroma makes the CSC collapse
        # to the luma scale+offset; chroma is synthesized at OUTPUT
        # resolution after the luma resize — exact, because every resize
        # row sums to 1 (resize of a constant is that constant).
        (y,) = planes
        u = v = None
    elif fmt in (F.P10, F.P12):
        y, uv = planes
        y = y.astype(jnp.float32) * (1.0 / 256.0)
        u, v = _deinterleave_uv(uv.astype(jnp.float32) * (1.0 / 256.0))
    else:
        raise ValueError(f"decode_postproc: unsupported source {fmt}")
    return y, u, v, subsampled, sub_h


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
        "compute",
        "src_window",
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
    compute: str = "auto",
    src_window=None,
):
    """Fused (N-batched) decode post-processing.

    planes: NV12 → (y, uv); YUV420/YUV422/YUV444 → (y, u, v)
    (422 chroma is (H, W/2): horizontal-only subsampling);
    Y (grayscale) → (y,) — neutral chroma, CSC collapses to the luma
    scale+offset.
    output: 'rgb_u8' (N,H,W,3 u8) | 'rgb_f32' ([0,1]) |
            'normalized' (NHWC f32) | 'normalized_nchw' (NCHW f32).
    compute: 'auto' (split-bf16 resize for u8 sources at f32 compute —
            ≤1 u8 ULP, ~1.5x faster) | 'split_bf16' | 'highest'.
    src_window: optional static (y0, x0, h, w) source ROI in luma
            pixels — the NPP ROI-resize analog: only that window maps
            to the output (crop+resize as the same two matmuls; taps
            just outside the window use the real neighboring pixels).
    """
    if compute not in ("auto", "split_bf16", "highest"):
        raise ValueError(f"unknown compute mode {compute!r}")
    mode = "split_bf16" if compute == "auto" else compute
    fmt = PixelFormat(src_format)
    y, u, v, subsampled, sub_h = unpack_yuv_planes(fmt, planes)

    gray = u is None
    h_in, w_in = y.shape[-2], y.shape[-1]
    if src_window is not None:
        wy0, wx0, wh, ww = (float(t) for t in src_window)
        rwin, cwin = (wy0, wh), (wx0, ww)
    else:
        rwin = cwin = None
    if (h_in, w_in) != (out_h, out_w) or src_window is not None:
        # Resize-before-CSC: the color matrix is affine and every resize
        # row sums to 1, so resizing Y/Cb/Cr planes first is mathematically
        # identical to CSC-then-resize — but never materializes the
        # full-resolution f32 RGB intermediate (a ~3x HBM saving at 1080p).
        # The 2x chroma replicate-upsample folds exactly into the chroma
        # resize matrix (see _chroma_collapse), so subsampled chroma is
        # resized straight from its native half resolution.
        rmat = jnp.asarray(resize_matrix(h_in, out_h, method, window=rwin))
        cmat = jnp.asarray(resize_matrix(w_in, out_w, method, window=cwin))
        y = _resize_plane2d(y, rmat, cmat, compute_dtype, mode)
        if gray:
            pass  # neutral chroma synthesized below at output size
        elif subsampled:
            rc = _chroma_collapse(rmat)
            cc = _chroma_collapse(cmat)
            u = _resize_plane2d(u, rc, cc, compute_dtype, mode)
            v = _resize_plane2d(v, rc, cc, compute_dtype, mode)
        elif sub_h:  # 4:2:2 — collapse columns only
            cc = _chroma_collapse(cmat)
            u = _resize_plane2d(u, rmat, cc, compute_dtype, mode)
            v = _resize_plane2d(v, rmat, cc, compute_dtype, mode)
        else:
            u = _resize_plane2d(u, rmat, cmat, compute_dtype, mode)
            v = _resize_plane2d(v, rmat, cmat, compute_dtype, mode)
    elif subsampled:
        u, v = _upsample2(u), _upsample2(v)
    elif sub_h:
        u = jnp.repeat(u, 2, axis=-1)
        v = jnp.repeat(v, 2, axis=-1)

    if gray:
        u = v = jnp.full(y.shape, 128, jnp.float32)

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

    * ``"xla"`` — the jitted XLA resize-before-CSC program. Its resize
      matmuls default to the split-bf16 decomposition (``compute="auto"``
      → ≤1 u8 ULP vs float64, ~2.4x less MXU work than f32-highest;
      pass ``compute="highest"`` for the 6-pass f32 dots).
    * ``"pallas"`` — the hand-tiled banded split-bf16 Pallas kernels
      (ops/pallas_fused.py; ≤1 u8 ULP vs the float64 golden). Planar
      YUV420 sources run ONE whole-frame kernel (banded row windows →
      VMEM scratch → banded column tiles + CSC/normalize); NV12 sources
      run the two-kernel striped variant.
    * ``"auto"`` (default) — when the shape/format/output qualify for the
      Pallas path on a TPU backend, time both once per input shape with an
      RTT-cancelling two-point measurement and cache the winner; otherwise
      XLA. (Measured on v5e at 1080p→224², batch 8, random input: banded
      Pallas ≈ 17 µs/frame fed planar — the product path; the decode
      pool passes free plane views — ~24 µs fed packed, XLA split-bf16
      ≈ 35 µs, XLA f32-highest ≈ 53 µs — auto picks Pallas there.)
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
        compute: str = "auto",
        src_window=None,
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
        # static source ROI (y0, x0, h, w): crop+resize in the same two
        # matmuls (NPP ROI-resize analog). XLA path only — the Pallas
        # kernels bind full-axis band windows.
        self.src_window = tuple(src_window) if src_window else None
        if self.src_window is not None and kernel == "pallas":
            raise ValueError("src_window is not available with kernel='pallas'")
        self.kernel = kernel
        self.compute = compute
        self._picked = {}  # input-shape key -> "xla" | "pallas"

    # -- kernel selection ---------------------------------------------------

    def _pallas_planes(self, planes):
        """Map the call planes to a Pallas kernel entry: ("planar", y, u,
        v) for YUV420 sources (chroma stays planar end to end — an XLA
        interleave into NV12 layout costs a ~20 µs/frame lane relayout at
        1080p, measured) or ("nv12", y, uv) for NV12 sources; None when
        this input doesn't qualify."""
        if self.method not in ("lanczos", "bilinear"):
            return None
        if self.src_window is not None:
            return None  # ROI matrices are XLA-path only
        if any(getattr(p, "ndim", 0) != 3 for p in planes):
            return None  # the kernels take batched (N, H, W) planes
        if any(p.dtype != jnp.uint8 for p in planes):
            return None  # kernels convert via i32 — u8 only (f32 planes
            #               with fractional values would truncate)
        fmt = self.src_format
        planar_out = self.output in (
            "rgb_u8", "rgb_f32", "normalized", "normalized_nchw"
        )
        if not planar_out:
            return None
        if fmt == F.NV12 and len(planes) == 2:
            return ("nv12",) + tuple(planes)
        if fmt in (F.NV12, F.YUV420) and len(planes) == 1:
            packed = planes[0]
            h = packed.shape[-2] * 2 // 3
            w = packed.shape[-1]
            y = packed[..., :h, :]
            if fmt == F.NV12:
                return "nv12", y, packed[..., h:, :]
            lead = packed.shape[:-2]
            c = packed[..., h:, :]
            u = c[..., : h // 4, :].reshape(*lead, h // 2, w // 2)
            v = c[..., h // 4:, :].reshape(*lead, h // 2, w // 2)
            return "planar", y, u, v
        if fmt == F.YUV420 and len(planes) == 3:
            return ("planar",) + tuple(planes)
        return None

    def _pallas_ok(self, pallas_in):
        from .pallas_fused import (
            fused_pallas_nv12_supported,
            fused_pallas_planar_supported,
        )

        mode, y = pallas_in[0], pallas_in[1]
        out_elem = 1 if self.output == "rgb_u8" else 4
        if mode == "planar":
            return fused_pallas_planar_supported(
                y.shape[-2], y.shape[-1], self.out_h, self.out_w,
                self.method, out_elem_bytes=out_elem,
            )
        return fused_pallas_nv12_supported(
            y.shape[-2], y.shape[-1], self.out_h, self.out_w,
            self.method, out_elem_bytes=out_elem,
        )

    def _run_pallas(self, mode, *planes):
        from .pallas_fused import (
            fused_nv12_resize_rgb_pallas,
            fused_yuv420_resize_rgb_pallas,
        )

        kern = (fused_yuv420_resize_rgb_pallas if mode == "planar"
                else fused_nv12_resize_rgb_pallas)
        kern_out = ("normalized" if self.output.startswith("normalized")
                    else self.output)
        out = kern(
            *planes,
            out_h=self.out_h, out_w=self.out_w,
            space=self.space, rng=self.range, method=self.method,
            output=kern_out, mean=self.mean, std=self.std,
        )
        if self.output == "normalized_nchw":
            return out  # the kernel's planar layout IS NCHW
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
            compute=self.compute,
            src_window=self.src_window,
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

            # CLAUDE.md slope rule: short chains read up to 2x+
            # optimistic through tunnel noise — chain length is nearly
            # free here (the scan body is the same compiled program; the
            # cost is RTT-dominated), so use the long-chain policy
            lo, hi = chained(50), chained(350)
            int(lo(*args)); int(hi(*args))  # compile
            t_lo = min(_walltime(lambda: int(lo(*args))) for _ in range(2))
            t_hi = min(_walltime(lambda: int(hi(*args))) for _ in range(2))
            return max(t_hi - t_lo, 1e-9)

        staged = [jax.device_put(np.asarray(p)) for p in planes]
        t_xla = slope(lambda p0, *rest: self._run_xla(p0, *rest), staged)
        # time the pallas candidate from the SAME call planes so the
        # packed→planar slice/reshape it pays on every real call is
        # included (timing pre-unpacked planes flattered it by ~7 µs/frame
        # at 1080p and could cache the wrong winner)
        t_pal = slope(
            lambda *ps: self._run_pallas(*self._pallas_planes(ps)), staged
        )
        return "pallas" if t_pal < t_xla else "xla"

    def __call__(self, *planes):
        choice = self.kernel
        pallas_in = None
        if choice in ("auto", "pallas"):
            pallas_in = self._pallas_planes(planes)
            if pallas_in is not None and not self._pallas_ok(pallas_in):
                pallas_in = None
            if pallas_in is not None:
                import jax

                if jax.devices()[0].platform == "cpu":
                    pallas_in = None  # interpret mode: never a speed win
        if choice == "pallas":
            if pallas_in is None:
                raise ValueError(
                    "pallas kernel unavailable for this input (needs "
                    "NV12/YUV420 u8 batched planes on a TPU backend with "
                    "rgb_u8/rgb_f32/normalized output; NV12 sources need "
                    "W divisible by a 128-lane stripe; planar YUV420 "
                    "sources need W % 128 == 0 and a band/VMEM-feasible "
                    "layout)"
                )
            return self._run_pallas(*pallas_in)
        if choice == "auto" and pallas_in is not None:
            import jax

            key = tuple(p.shape for p in planes)
            if key not in self._picked:
                if any(isinstance(p, jax.core.Tracer) for p in planes):
                    # called under an outer trace with an unseen shape:
                    # timing is impossible here — use XLA this time and
                    # let a concrete warm-up call do the picking.
                    return self._run_xla(*planes)
                self._picked[key] = self._pick(planes, pallas_in)
            if self._picked[key] == "pallas":
                return self._run_pallas(*pallas_in)
        return self._run_xla(*planes)


def _walltime(fn) -> float:
    import time

    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


# ---- outbound: device-side encoder feed ------------------------------------
# The symmetric counterpart of decode_postproc for the encode direction
# (reference transcode chain: ResizeSurface NV12 path + RGB→YUV NPP
# converters, Tasks.cpp:1265-1332 / TasksColorCvt.cpp rgb→yuv420): batched
# RGB frames → resized planar YUV420 in ONE compiled program. Resize runs
# on the MXU in NHWC (no channel relayout); the color matrix is affine and
# resize rows sum to 1, so converting AFTER the resize is exact; the 4:2:0
# chroma subsample (2×2 mean) is linear too and runs on the small output
# grid.

_ROWS_NHWC = "oh,nhwc->nowc"
_COLS_NHWC = "pw,nhwc->nhpc"


def _resize_nhwc(x, rmat, cmat, mode):
    """(N, H, W, C) → (N, out_h, out_w, C): the two resize matmuls in
    channel-last layout (same split-bf16 strategy as _resize_plane2d)."""
    oh, ow = rmat.shape[0], cmat.shape[0]
    hin, win = x.shape[-3], x.shape[-2]
    if (hin, win) == (oh, ow):
        return x.astype(jnp.float32)
    rows_first = oh * hin * win + oh * win * ow <= (
        hin * win * ow + oh * hin * ow
    )
    if mode == "split_bf16" and jnp.issubdtype(x.dtype, jnp.integer):
        if rows_first:
            return _split_stage2(
                _split_stage1(x, rmat, _ROWS_NHWC), cmat, _COLS_NHWC
            )
        return _split_stage2(
            _split_stage1(x, cmat, _COLS_NHWC), rmat, _ROWS_NHWC
        )
    x = x.astype(jnp.float32)
    if rows_first:
        t = jnp.einsum(_ROWS_NHWC, rmat, x, precision="highest")
        return jnp.einsum(_COLS_NHWC, cmat, t, precision="highest")
    t = jnp.einsum(_COLS_NHWC, cmat, x, precision="highest")
    return jnp.einsum(_ROWS_NHWC, rmat, t, precision="highest")


@partial(
    jax.jit,
    static_argnames=("out_h", "out_w", "space", "rng", "method", "swap",
                     "compute"),
)
def encode_feed(
    rgb: jnp.ndarray,
    *,
    out_h: int,
    out_w: int,
    space: ColorSpace = ColorSpace.BT_709,
    rng: ColorRange = ColorRange.MPEG,
    method: str = "lanczos",
    swap: bool = False,
    compute: str = "auto",
):
    """Batched RGB frames → resized planar YUV420 encoder feed.

    rgb: (N, H, W, 3) uint8, or float32 in [0, 1] (e.g. a model/overlay
    output); ``swap=True`` reads BGR channel order. Returns u8 planes
    ``(y, u, v)`` with y (N, out_h, out_w) and u/v
    (N, out_h/2, out_w/2) — :func:`planes_to_host_packed` assembles the
    VideoEncoder input layout on the host for free. out_h/out_w must be
    even (4:2:0). Fidelity: ≤1 u8 ULP vs the float64 golden
    (resize matrices + golden.rgb_to_yuv420 semantics,
    TasksColorCvt.cpp rgb→yuv420 anchor).
    """
    if out_h % 2 or out_w % 2:
        raise ValueError("YUV420 target size must be even")
    n = rgb.shape[0]
    out = _encode_feed_resized(rgb, out_h, out_w, method, swap, compute)

    m, off = cs.ycbcr_from_rgb_matrix(space, rng)
    ycc = jnp.einsum(
        "...c,dc->...d", out, jnp.asarray(m, jnp.float32),
        precision="highest",
    ) + jnp.asarray(off, jnp.float32)
    y = _round_u8(ycc[..., 0])
    # 4:2:0 chroma: 2×2 mean on the target grid (linear — identical to
    # folding the pair-average into the resize matrices), then quantize
    cbcr = ycc[..., 1:]
    cbcr = cbcr.reshape(n, out_h // 2, 2, out_w // 2, 2, 2).mean((2, 4))
    u = _round_u8(cbcr[..., 0])
    v = _round_u8(cbcr[..., 1])
    return y, u, v


def _encode_feed_resized(rgb, out_h, out_w, method, swap, compute):
    """Shared outbound prologue: validate, channel-swap, scale float
    inputs, resize → (N, out_h, out_w, 3) f32. One implementation so
    the 4:2:0 and gray feeds can never drift."""
    if rgb.ndim != 4 or rgb.shape[-1] != 3:
        raise ValueError(f"expected (N, H, W, 3) RGB, got {rgb.shape}")
    h, w = rgb.shape[1], rgb.shape[2]
    if swap:
        rgb = rgb[..., ::-1]
    if not jnp.issubdtype(rgb.dtype, jnp.integer):
        rgb = rgb.astype(jnp.float32) * 255.0
    if compute not in ("auto", "split_bf16", "highest"):
        raise ValueError(f"unknown compute mode {compute!r}")
    mode = "split_bf16" if compute in ("auto", "split_bf16") else "highest"
    rmat = jnp.asarray(resize_matrix(h, out_h, method))
    cmat = jnp.asarray(resize_matrix(w, out_w, method))
    return _resize_nhwc(rgb, rmat, cmat, mode)


@partial(
    jax.jit,
    static_argnames=("out_h", "out_w", "space", "rng", "method", "swap",
                     "compute"),
)
def encode_feed_gray(
    rgb: jnp.ndarray,
    *,
    out_h: int,
    out_w: int,
    space: ColorSpace = ColorSpace.BT_601,
    rng: ColorRange = ColorRange.JPEG,
    method: str = "lanczos",
    swap: bool = False,
    compute: str = "auto",
):
    """Luma-only :func:`encode_feed`: RGB → resized u8 Y plane in one
    program (grayscale encoder targets; no 4:2:0 fold, so odd target
    sizes are fine). NOTE the defaults differ from :func:`encode_feed`
    deliberately — gray targets are the JPEG path's convention
    (full-range BT.601); callers with other colorimetry pass it
    explicitly."""
    out = _encode_feed_resized(rgb, out_h, out_w, method, swap, compute)
    m, off = cs.ycbcr_from_rgb_matrix(space, rng)
    y = jnp.einsum(
        "...c,c->...", out, jnp.asarray(m[0], jnp.float32),
        precision="highest",
    ) + jnp.float32(off[0])
    return _round_u8(y)


def planes_to_host_packed(y, u, v) -> np.ndarray:
    """Assemble (y, u, v) device planes into the packed planar-YUV420 host
    frame layout ``(N, H*3/2, W)`` that VideoEncoder.encode consumes. The
    reshapes regroup row-major bytes, so this is copy-free on the numpy
    side beyond the device→host download itself."""
    y = np.asarray(y)
    u = np.asarray(u)
    v = np.asarray(v)
    n, h, w = y.shape
    if h % 4:
        raise ValueError(
            f"packed planar YUV420 requires height % 4 == 0, got {h}"
        )
    return np.concatenate(
        [y, u.reshape(n, h // 4, w), v.reshape(n, h // 4, w)], axis=1
    )
