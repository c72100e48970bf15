"""Video quality metrics: PSNR and SSIM as batched jitted ops.

The reference measures transcode quality host-side in a sample
(samples/SampleMeasureVideoQuality.py: per-frame PSNR in numpy); here the
metrics are device ops so a whole batch of frames is scored in one XLA
program, and SSIM is included as well.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("max_val",))
def psnr(a: jnp.ndarray, b: jnp.ndarray, *, max_val: float = 255.0):
    """PSNR per batch element over all remaining axes. (N, …) → (N,)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    axes = tuple(range(1, a.ndim))
    mse = jnp.mean((a - b) ** 2, axis=axes)
    return jnp.where(
        mse == 0,
        jnp.inf,
        10.0 * jnp.log10((max_val * max_val) / jnp.maximum(mse, 1e-12)),
    )


@partial(jax.jit, static_argnames=("max_val", "window"))
def ssim(a: jnp.ndarray, b: jnp.ndarray, *, max_val: float = 255.0,
         window: int = 8):
    """Mean SSIM per batch element for (N, H, W) or (N, H, W, C) images.

    Uses non-overlapping ``window``×``window`` patches (uniform window) —
    the patch statistics are plain reshapes + means, which XLA fuses into
    a single pass.
    """
    if a.ndim == 3:
        a = a[..., None]
        b = b[..., None]
    n, h, w, c = a.shape
    hh, ww = (h // window) * window, (w // window) * window
    a = a[:, :hh, :ww, :].astype(jnp.float32)
    b = b[:, :hh, :ww, :].astype(jnp.float32)

    def patches(x):
        x = x.reshape(n, hh // window, window, ww // window, window, c)
        return x.transpose(0, 1, 3, 5, 2, 4).reshape(
            n, -1, window * window
        )

    pa, pb = patches(a), patches(b)
    mu_a = pa.mean(-1)
    mu_b = pb.mean(-1)
    var_a = pa.var(-1)
    var_b = pb.var(-1)
    cov = (pa * pb).mean(-1) - mu_a * mu_b
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return s.mean(-1)
