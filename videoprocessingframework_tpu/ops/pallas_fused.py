"""Pallas fused NV12 → resized planar RGB: two hand-tiled kernels.

The XLA fused pipeline (ops/fused.py) is already resize-before-CSC; this
variant moves both resize matmuls and the CSC into Pallas so each stage
reads its inputs from HBM exactly once:

* K1 (grid B × W/LANES): row-resize. Loads a (H, LANES) u8 column stripe
  of luma (+ the interleaved chroma stripe at H/2), converts to f32 in
  VMEM, and multiplies by the row interpolation matrix on the MXU. The 2×
  vertical chroma upsample is folded into the chroma matrix (adjacent
  column pairs summed — exact, see ops/fused._chroma_collapse).
* K2 (grid B): column-resize + CSC. Loads the (OUT_H, W) f32 intermediates,
  horizontally expands interleaved chroma with lane rolls (which makes a
  plain matmul with the full column matrix equal the collapsed-matrix
  result exactly), resizes on the MXU, applies the color matrix, writes
  planar u8.

Alignment: H is zero-padded to a multiple of 64 (zero rows paired with
zero matrix columns — exact); W must be a multiple of LANES; OUT_W is
computed in a 128-lane padded buffer and sliced outside the kernel.

Status: EXPERIMENTAL. On a v5e chip this measures only ~4% faster than
the XLA resize-before-CSC pipeline (ops/fused.py), and the in-kernel MXU
``jnp.dot`` runs at default (bf16-pass) precision, so compiled results can
differ from the f32-highest XLA path by a few 8-bit ULPs. The XLA path
remains the default; this kernel is the foundation for further in-kernel
fusion work (see ROADMAP.md).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.enums import ColorRange, ColorSpace
from . import colorspace as cs
from .resize import resize_matrix

LANES_MAX = 512  # K1 column-stripe width cap


def _lanes_for(w: int) -> int:
    """Largest multiple of 128 ≤ LANES_MAX that divides w (0 if none)."""
    for lanes in range(min(LANES_MAX, w), 0, -128):
        if lanes % 128 == 0 and w % lanes == 0:
            return lanes
    return 0


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _f32(x):
    return x.astype(jnp.int32).astype(jnp.float32)


# ---- split-precision MXU strategy -----------------------------------------
# A full-f32 ("highest") MXU dot costs ~6 bf16 passes. But the pixel
# operands here are uint8 — EXACT in bf16's 8-bit mantissa. Splitting only
# the resize matrix into hi+lo bf16 halves (m ≈ hi + lo, |lo| ≤ 2^-8|m|,
# residual ≤ 2^-16|m|) makes  dot(hi, x) + dot(lo, x)  accurate to ~2e-3
# of an 8-bit code at 2 passes instead of 6. K2's inputs are f32
# intermediates, so there BOTH operands are split and the lo×lo term
# dropped (3 passes). Net ~2.5x less MXU work than f32-highest at the same
# ≤1-ULP-vs-float64-golden budget (tests/test_interop_metrics_pallas.py).


def _split_bf16_host(m: np.ndarray):
    import ml_dtypes

    hi = m.astype(ml_dtypes.bfloat16)
    lo = (m - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


def _bf16(x):
    return x.astype(jnp.int32).astype(jnp.bfloat16)  # exact for u8


def _k1_factory():
    def kernel(y_ref, uv_ref, rmh_ref, rml_ref, rch_ref, rcl_ref, yo_ref,
               uvo_ref):
        y = _bf16(y_ref[0])  # (Hp, LANES), exact
        uv = _bf16(uv_ref[0])  # (Hp/2, LANES), exact
        yo_ref[0] = jnp.dot(
            rmh_ref[...], y, preferred_element_type=jnp.float32
        ) + jnp.dot(rml_ref[...], y, preferred_element_type=jnp.float32)
        uvo_ref[0] = jnp.dot(
            rch_ref[...], uv, preferred_element_type=jnp.float32
        ) + jnp.dot(rcl_ref[...], uv, preferred_element_type=jnp.float32)

    return kernel


def _k2_factory(space: ColorSpace, rng: ColorRange, out_w: int, swap: bool):
    m, off = cs.rgb_from_ycbcr_matrix(space, rng)
    m = np.asarray(m, np.float32)
    off = np.asarray(off, np.float32)
    chans = [0, 1, 2] if not swap else [2, 1, 0]

    def split_dot(x, cmh, cml):
        # x f32 → hi+lo bf16; drop the lo×lo term (≤2^-16 relative)
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        return (
            jnp.dot(xh, cmh, preferred_element_type=jnp.float32)
            + jnp.dot(xh, cml, preferred_element_type=jnp.float32)
            + jnp.dot(xl, cmh, preferred_element_type=jnp.float32)
        )

    def kernel(y_ref, uv_ref, cmh_ref, cml_ref, out_ref):
        from jax.experimental.pallas import tpu as pltpu

        y = y_ref[0]  # (OUT_H, W) f32
        uv = uv_ref[0]
        w = uv.shape[-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, uv.shape, 1)
        even = (lane % 2) == 0
        # horizontal expand of interleaved chroma: matmul with the full
        # column matrix then equals the collapsed-matrix result exactly
        u = jnp.where(even, uv, pltpu.roll(uv, 1, 1))
        v = jnp.where(even, pltpu.roll(uv, w - 1, 1), uv)
        cmh = cmh_ref[...]  # (W, OUT_WP) bf16 hi
        cml = cml_ref[...]  # (W, OUT_WP) bf16 lo
        yr = split_dot(y, cmh, cml) - off[0]
        ur = split_dot(u, cmh, cml) - off[1]
        vr = split_dot(v, cmh, cml) - off[2]
        for i, c in enumerate(chans):
            val = m[c, 0] * yr + m[c, 1] * ur + m[c, 2] * vr
            val = jnp.clip(jnp.rint(val), 0.0, 255.0)
            out_ref[0, i] = val.astype(jnp.int32).astype(jnp.uint8)

    return kernel


@partial(
    jax.jit,
    static_argnames=("out_h", "out_w", "space", "rng", "method", "swap",
                     "interpret"),
)
def fused_nv12_resize_rgb_pallas(
    y: jnp.ndarray,
    uv: jnp.ndarray,
    *,
    out_h: int,
    out_w: int,
    space: ColorSpace = ColorSpace.BT_709,
    rng: ColorRange = ColorRange.MPEG,
    method: str = "lanczos",
    swap: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """y (B,H,W) u8 + uv (B,H/2,W) u8 → (B, 3, out_h, out_w) u8 planar RGB.

    Requires W % LANES == 0 and out_h % 8 == 0; use
    :func:`fused_pallas_supported` to gate.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = y.shape
    lanes = _lanes_for(w)
    if not lanes or out_h % 8:
        raise ValueError(
            f"needs a 128-multiple stripe dividing W and out_h%8==0, "
            f"got {w}/{out_h}"
        )

    hp = _round_up(h, 64)
    hp2 = hp // 2
    if hp != h:
        y = jnp.pad(y, ((0, 0), (0, hp - h), (0, 0)))
        uv = jnp.pad(uv, ((0, 0), (0, hp2 - h // 2), (0, 0)))

    # row matrices: zero columns for the padded rows keep the math exact
    rm_np = np.zeros((out_h, hp), np.float32)
    rm_np[:, :h] = resize_matrix(h, out_h, method)
    rc_np = np.zeros((out_h, hp2), np.float32)
    rc_np[:, : h // 2] = (
        resize_matrix(h, out_h, method).reshape(out_h, h // 2, 2).sum(-1)
    )
    rmh, rml = map(jnp.asarray, _split_bf16_host(rm_np))
    rch, rcl = map(jnp.asarray, _split_bf16_host(rc_np))

    k1 = pl.pallas_call(
        _k1_factory(),
        grid=(b, w // lanes),
        in_specs=[
            pl.BlockSpec((1, hp, lanes), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp2, lanes), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, hp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, hp), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, hp2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_h, hp2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, out_h, lanes), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_h, lanes), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, out_h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, out_h, w), jnp.float32),
        ],
        interpret=interpret,
    )
    y1, uv1 = k1(y, uv, rmh, rml, rch, rcl)

    out_wp = _round_up(out_w, 128)
    cm_np = np.zeros((w, out_wp), np.float32)
    cm_np[:, :out_w] = resize_matrix(w, out_w, method).T
    cmh, cml = map(jnp.asarray, _split_bf16_host(cm_np))

    k2 = pl.pallas_call(
        _k2_factory(ColorSpace(space), ColorRange(rng), out_w, swap),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, out_h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, out_wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, out_h, out_wp), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, out_h, out_wp), jnp.uint8),
        interpret=interpret,
    )
    out = k2(y1, uv1, cmh, cml)
    return out[..., :out_w]


def fused_pallas_supported(w: int, out_h: int) -> bool:
    return _lanes_for(w) > 0 and out_h % 8 == 0
