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


def _ssim_cs(a, b, max_val: float, window: int):
    """Per-batch (ssim, contrast-structure) over non-overlapping
    ``window``×``window`` patches of (N, H, W, C) f32 inputs."""
    n, h, w, c = a.shape
    hh, ww = (h // window) * window, (w // window) * window
    a = a[:, :hh, :ww, :]
    b = b[:, :hh, :ww, :]

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
    cs = (2 * cov + c2) / (var_a + var_b + c2)
    lum = (2 * mu_a * mu_b + c1) / (mu_a**2 + mu_b**2 + c1)
    return (lum * cs).mean(-1), cs.mean(-1)


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
    s, _ = _ssim_cs(
        a.astype(jnp.float32), b.astype(jnp.float32), max_val, window
    )
    return s


#: Wang et al. 2003 per-scale weights (5-scale MS-SSIM)
_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


@partial(jax.jit, static_argnames=("max_val", "window"))
def ms_ssim(a: jnp.ndarray, b: jnp.ndarray, *, max_val: float = 255.0,
            window: int = 8):
    """Multi-scale SSIM per batch element, (N, H, W[, C]) → (N,).

    The standard 5-scale construction (Wang, Simoncelli & Bovik 2003):
    contrast-structure at scales 1-4, full SSIM at the coarsest, 2x2
    average pooling between scales, weighted geometric mean. Scales that
    would shrink below one aggregation window are dropped automatically
    (weights renormalized) so small frames still score. One XLA program,
    batched — the device-side upgrade of the reference's host-side
    per-frame PSNR loop (samples/SampleMeasureVideoQuality.py).
    """
    if a.ndim == 3:
        a = a[..., None]
        b = b[..., None]
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    # static scale count from the static input shape
    levels = 1
    h, w = a.shape[1], a.shape[2]
    while levels < len(_MSSSIM_WEIGHTS) and min(h, w) // 2 >= window:
        levels += 1
        h, w = h // 2, w // 2
    weights = jnp.asarray(_MSSSIM_WEIGHTS[:levels], jnp.float32)
    weights = weights / weights.sum()

    def pool2(x):
        n, h, w, c = x.shape
        x = x[:, : (h // 2) * 2, : (w // 2) * 2, :]
        x = x.reshape(n, h // 2, 2, w // 2, 2, c)
        return x.mean(axis=(2, 4))

    vals = []
    for lvl in range(levels):
        s, cs = _ssim_cs(a, b, max_val, window)
        vals.append(s if lvl == levels - 1 else cs)
        if lvl != levels - 1:
            a, b = pool2(a), pool2(b)
    # weighted geometric mean; cs/s can dip ≤0 on pathological inputs —
    # clamp like the common implementations (relu) before the power
    stacked = jnp.stack(vals, axis=-1)
    stacked = jnp.maximum(stacked, 1e-6)
    return jnp.exp(jnp.sum(weights * jnp.log(stacked), axis=-1))
