"""Video stabilization: flow-based global motion + smoothed camera path.

No reference analog (VPF exposes remap for undistort but nothing builds
on it); this composes the round-4 flow estimator with the remap-style
warp into the classic stabilization pipeline:

1. dense flow between consecutive frames (ops/flow.py, on device);
2. a robust global translation per pair (median over the interior —
   median rejects foreground movers without RANSAC's data-dependent
   control flow, which XLA can't trace);
3. cumulative camera trajectory, low-passed with a Gaussian (the
   intended path — keeps deliberate pans, removes jitter);
4. per-frame warp by (trajectory − smoothed trajectory) on device.

Steps 1/2/4 are jitted device work batched over all frame pairs at
once; only the tiny [N, 2] trajectory passes through the host between
them (numpy convolve — microseconds, and keeping the smoothing on host
lets callers swap in their own path filter).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .flow import lucas_kanade_flow, warp_image

__all__ = ["global_translations", "smooth_path", "stabilize_clip"]


@partial(jax.jit, static_argnames=("levels", "iters", "window", "margin"))
def global_translations(
    frames: jnp.ndarray,
    *,
    levels: int = 3,
    iters: int = 3,
    window: int = 9,
    margin: int = 16,
) -> jnp.ndarray:
    """Per-pair robust global motion for [N, H, W] consecutive luma
    frames → [N-1, 2] f32 (dx, dy): content at position p in frame i
    appears at p + (dx, dy) in frame i+1 (flow convention
    ``prev(x) ≈ next(x + flow)``, so a camera pan by +c shows as
    content shift −c).

    All N−1 flows solve as ONE batched pyramid program; the median over
    the interior (border ``margin`` excluded — the warp pads it with
    clamped samples) is the robust global estimate.
    """
    h, w = frames.shape[-2], frames.shape[-1]
    if h <= 2 * margin or w <= 2 * margin:
        raise ValueError(
            f"frames {h}x{w} leave no interior at margin={margin} "
            f"(need H > {2 * margin} and W > {2 * margin}); pass a "
            "smaller margin= for tiny frames"
        )
    flow = lucas_kanade_flow(
        frames[:-1], frames[1:], levels=levels, iters=iters, window=window
    )
    core = flow[:, margin:-margin, margin:-margin, :]
    return jnp.median(core.reshape(core.shape[0], -1, 2), axis=1)


def smooth_path(path: np.ndarray, sigma: float = 5.0) -> np.ndarray:
    """Gaussian low-pass of an [N, 2] cumulative trajectory (host;
    odd-reflect padding extrapolates the end slopes, so a steady pan
    passes through unchanged instead of flattening at the clip ends)."""
    r = max(1, int(3 * sigma))
    t = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (t / sigma) ** 2)
    k /= k.sum()
    padded = np.pad(path.astype(np.float64), ((r, r), (0, 0)),
                    mode="reflect", reflect_type="odd")
    out = np.stack(
        [np.convolve(padded[:, i], k, mode="valid") for i in range(2)], axis=1
    )
    return out.astype(np.float32)


def stabilize_clip(
    frames: np.ndarray,
    *,
    sigma: float = 5.0,
    levels: int = 3,
    iters: int = 3,
) -> Tuple[np.ndarray, np.ndarray]:
    """Stabilize an [N, H, W] (or [N, H, W, C]) clip.

    Returns ``(stabilized, correction)`` where ``correction`` is the
    [N, 2] per-frame (dx, dy) that was applied. Deliberate motion
    (smooth pans) survives; jitter with period ≲ ``sigma`` frames is
    removed. Frame borders exposed by the correction are clamp-padded
    (callers wanting a clean crop can use ``correction.max(0)``).
    """
    frames = np.asarray(frames)
    luma = frames if frames.ndim == 3 else frames.mean(axis=-1)
    steps = np.asarray(global_translations(luma, levels=levels, iters=iters))
    # flow measures where frame i's content sits in frame i+1 (shifted
    # by −step), so the camera moved BY +step: integrate to a path
    path = np.concatenate(
        [np.zeros((1, 2), np.float32), np.cumsum(-steps, axis=0)]
    )
    desired = smooth_path(path, sigma=sigma)
    correction = desired - path  # camera-position fix per frame
    # moving the camera by `correction` shifts content by −correction,
    # i.e. out(x) = img(x + correction): the backward-warp field IS the
    # correction, constant over each frame
    flow = np.broadcast_to(
        correction[:, None, None, :].astype(np.float32),
        (frames.shape[0], frames.shape[1], frames.shape[2], 2),
    )
    out = np.asarray(warp_image(frames, jnp.asarray(flow)))
    return out, correction.astype(np.float32)
