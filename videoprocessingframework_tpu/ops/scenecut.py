"""Shot-boundary (scene-cut) detection as a batched device op.

No reference analog (VPF stops at decode/convert); this is framework
infrastructure for the training loaders — clip sampling that respects
shot boundaries — and for serving-side video segmentation. The scoring
runs on device over a whole batch of consecutive luma frames in one
jitted program; only the tiny per-pair score vector returns to the
host, where a robust threshold picks the cuts.

Score design (classic two-feature detector):

* **structure**: 1 − SSIM between consecutive frames (ops/metrics.py) —
  catches hard cuts even between similarly-exposed shots;
* **intensity**: L1 distance between coarse luma histograms (soft-binned
  so the op is one matmul-like reduction, not a scatter) — catches
  exposure/content jumps that local SSIM windows under-report.

Both are in [0, 1]; the score is their mean. Motion inside a shot moves
SSIM smoothly, a cut spikes it — hence the robust median+MAD threshold
rather than a fixed constant.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .metrics import ssim

__all__ = ["scene_cut_scores", "detect_cuts", "segment_shots"]


def _soft_histogram(x: jnp.ndarray, bins: int) -> jnp.ndarray:
    """[N, H, W] luma (0-255 f32) → [N, bins] normalized soft histogram.

    Each pixel contributes linearly to its two nearest bin centers.
    TPU-friendly shape: no scatter (data-dependent addressing) AND no
    [N, H·W, bins] broadcast (gigabytes at 1080p batches) — instead a
    sequential ``lax.map`` over the bins, each one a fused
    elementwise+reduce pass, on a 4× decimated plane (histograms are
    statistics; 1/16 of the pixels estimates them to well under the
    detector's threshold scale).
    """
    n = x.shape[0]
    centers = jnp.linspace(0.0, 255.0, bins, dtype=jnp.float32)
    width = 255.0 / (bins - 1)
    flat = x[:, ::4, ::4].reshape(n, -1)

    def one(c):
        return jnp.maximum(0.0, 1.0 - jnp.abs(flat - c) / width).sum(axis=1)

    h = jax.lax.map(one, centers).T  # [N, bins]
    return h / jnp.maximum(h.sum(axis=-1, keepdims=True), 1.0)


@partial(jax.jit, static_argnames=("bins", "window"))
def scene_cut_scores(
    frames: jnp.ndarray, *, bins: int = 32, window: int = 8
) -> jnp.ndarray:
    """Per-adjacent-pair cut scores for ``[N, H, W]`` consecutive luma
    frames (u8 or float, 0-255) → ``[N-1]`` f32 in [0, 1].

    One compiled program; feed decoded batches straight from the pool.
    """
    f = frames.astype(jnp.float32)
    if f.ndim != 3:
        raise ValueError(f"expected [N, H, W] luma frames, got {f.shape}")
    a, b = f[:-1], f[1:]
    structure = 1.0 - jnp.clip(ssim(a, b, window=window), 0.0, 1.0)
    ha = _soft_histogram(a, bins)
    hb = _soft_histogram(b, bins)
    intensity = 0.5 * jnp.abs(ha - hb).sum(axis=-1)  # total variation
    return 0.5 * (structure + intensity)


def detect_cuts(
    scores: np.ndarray, *, min_score: float = 0.18, k_mad: float = 8.0
) -> List[int]:
    """Cut indices from a score vector: a cut at ``i`` separates frame
    ``i`` from ``i+1``.

    Robust rule: score must exceed BOTH ``min_score`` (absolute floor —
    an all-static clip has near-zero MAD, where a pure z-score fires on
    noise) and ``median + k_mad · MAD`` (adaptive — fast-motion shots
    raise the whole score baseline).
    """
    s = np.asarray(scores, np.float64)
    if s.size == 0:
        return []
    med = float(np.median(s))
    mad = float(np.median(np.abs(s - med)))
    thresh = max(min_score, med + k_mad * max(mad, 1e-6))
    return [int(i) for i in np.nonzero(s > thresh)[0]]


def segment_shots(
    source: str,
    *,
    batch: int = 32,
    max_frames: Optional[int] = None,
    min_score: float = 0.18,
    k_mad: float = 8.0,
) -> List[tuple]:
    """Decode ``source`` and return shot spans ``[(start, end), …]``
    (end exclusive, in decode order).

    Host decode feeds device scoring in ``batch``-frame windows with a
    one-frame overlap so every adjacent pair is scored exactly once.
    """
    from ..core.enums import PixelFormat
    from ..io.decoder import VideoReader

    reader = VideoReader(source)
    reader.decoder.output_format = PixelFormat.YUV420
    h, w = reader.height(), reader.width()
    buf = np.empty((h * 3 // 2, w), np.uint8)

    scores: List[float] = []
    carry: Optional[np.ndarray] = None
    window: List[np.ndarray] = []
    n = 0
    while max_frames is None or n < max_frames:
        if reader.decode(out=buf) is None:
            break
        window.append(buf[:h].copy())
        n += 1
        if len(window) + (carry is not None) == batch:
            frames = ([carry] if carry is not None else []) + window
            s = np.asarray(scene_cut_scores(np.stack(frames)))
            scores.extend(float(v) for v in s)
            carry = window[-1]
            window = []
    if window:
        frames = ([carry] if carry is not None else []) + window
        if len(frames) >= 2:
            s = np.asarray(scene_cut_scores(np.stack(frames)))
            scores.extend(float(v) for v in s)
    if n == 0:
        return []
    cuts = detect_cuts(np.asarray(scores), min_score=min_score, k_mad=k_mad)
    bounds = [0] + [c + 1 for c in cuts] + [n]
    return [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]
