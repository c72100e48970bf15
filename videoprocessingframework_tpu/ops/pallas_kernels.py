"""Hand-tiled Pallas TPU kernels for the hottest conversion paths.

The XLA path (ops/convert.py / ops/fused.py) already fuses CSC chains
well; these kernels exist for the cases where explicit tiling wins:
keeping the uint8→f32→uint8 round trip entirely in VMEM with exactly one
HBM read of the source planes and one HBM write of the result, and doing
the 4:2:0 chroma upsample in-register instead of materializing
``jnp.repeat`` intermediates in HBM.

Mosaic-layout notes (see /opt/skills/guides/pallas_guide.md):
* no in-kernel shape casts → the luma/output row-parity axis is exposed
  as its own (free, contiguous) reshape OUTSIDE the kernel: y is fed as
  (B, H/2, 2, W) and the output written as (B, 3, H/2, 2, W);
* the interleaved UVUV… lane axis is deinterleaved with ``pltpu.roll`` +
  a lane-parity select — u_full[j] = uv[j & ~1], v_full[j] = uv[j | 1] —
  which simultaneously performs the horizontal 2× upsample;
* uint8 ↔ float32 casts go through int32 (no direct u8↔f32 on the VPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.enums import ColorRange, ColorSpace
from . import colorspace as cs

CROWS = 16  # chroma rows per grid step → 32 luma rows (u8 sublane minimum)


def _kernel_factory(space: ColorSpace, rng: ColorRange, swap: bool):
    m, off = cs.rgb_from_ycbcr_matrix(space, rng)
    m = np.asarray(m, np.float32)
    off = np.asarray(off, np.float32)
    chans = [0, 1, 2] if not swap else [2, 1, 0]

    def _f32(x):
        return x.astype(jnp.int32).astype(jnp.float32)

    def kernel(y_ref, uv_ref, out_ref):
        from jax.experimental.pallas import tpu as pltpu

        uv = _f32(uv_ref[0])  # (CROWS, W): U V U V …
        w = uv.shape[-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, uv.shape, 1)
        even = (lane % 2) == 0
        # u_full[j] = uv[j - (j%2)]  (even lanes keep, odd take left nbr)
        u = jnp.where(even, uv, pltpu.roll(uv, 1, 1)) - off[1]
        # v_full[j] = uv[j + 1-(j%2)] (odd lanes keep, even take right
        # neighbor; roll by w-1 ≡ shift left by one, shifts must be ≥ 0)
        v = jnp.where(even, pltpu.roll(uv, w - 1, 1), uv) - off[2]

        for parity in range(2):  # vertical 2x: same chroma row pair
            y = _f32(y_ref[0, :, parity, :]) - off[0]  # (CROWS, W)
            for i, c in enumerate(chans):
                val = m[c, 0] * y + m[c, 1] * u + m[c, 2] * v
                val = jnp.clip(jnp.rint(val), 0.0, 255.0)
                out_ref[0, i, :, parity, :] = val.astype(jnp.int32).astype(
                    jnp.uint8
                )

    return kernel


@partial(jax.jit, static_argnames=("space", "rng", "swap", "interpret"))
def nv12_to_rgb_planar_pallas(
    y: jnp.ndarray,
    uv: jnp.ndarray,
    *,
    space: ColorSpace = ColorSpace.BT_709,
    rng: ColorRange = ColorRange.MPEG,
    swap: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """y (B, H, W) u8 + uv (B, H/2, W) u8 → (B, 3, H, W) u8 planar RGB.

    Requires H % 32 == 0 and W % 128 == 0 (tile alignment incl. the
    row-parity split); callers fall back to ops/convert.py otherwise.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = y.shape
    if h % (2 * CROWS) or w % 128:
        raise ValueError(
            f"pallas nv12 kernel needs H%{2 * CROWS}==0 and W%128==0, "
            f"got {h}x{w}"
        )
    # free contiguous reshape: expose luma row parity as its own axis
    y4 = y.reshape(b, h // 2, 2, w)
    grid = (b, h // (2 * CROWS))
    kernel = _kernel_factory(ColorSpace(space), ColorRange(rng), swap)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, CROWS, 2, w),
                lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, CROWS, w), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, CROWS, 2, w),
            lambda i, j: (i, 0, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 3, h // 2, 2, w), jnp.uint8),
        interpret=interpret,
    )(y4, uv)
    return out.reshape(b, 3, h, w)  # contiguous → free


@partial(jax.jit, static_argnames=("space", "rng", "swap", "interpret"))
def yuv420_to_rgb_planar_pallas(
    y: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    *,
    space: ColorSpace = ColorSpace.BT_709,
    rng: ColorRange = ColorRange.MPEG,
    swap: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Planar 4:2:0 → planar RGB via the NV12 kernel.

    The chroma planes are interleaved into NV12 layout by XLA first
    (pltpu.repeat is tile-concat, not element interleave, so the lane
    interleave can't be done in-kernel); the extra HBM traffic is ~20% of
    the frame and the combined path still clearly beats the XLA-only one.
    """
    uv = jnp.stack([u, v], axis=-1).reshape(*u.shape[:-1], u.shape[-1] * 2)
    return nv12_to_rgb_planar_pallas(
        y, uv, space=space, rng=rng, swap=swap, interpret=interpret
    )


def pallas_supported(h: int, w: int) -> bool:
    return h % (2 * CROWS) == 0 and w % 128 == 0
