"""Dense optical flow on device: pyramidal Lucas-Kanade + flow warping.

Beyond-parity extension of the reference's motion-vector export
(`FfmpegSwDecoder.cpp:307-330` side data → `PyFfmpegDecoder.GetMotionVectors`,
`src/PyNvCodec/src/PyFFMpegDecoder.cpp:28-140`): the reference only
surfaces the codec's block motion vectors; here the TPU computes a dense
per-pixel field from the decoded frames themselves, plus helpers to
densify codec MVs into the same representation and to warp frames along
a field (frame interpolation / motion-compensated filtering — the
NVIDIA Optical Flow SDK use cases, which VPF itself never wrapped).

TPU-first design notes:

* The whole pyramid solve is ONE jitted program: fixed level/iteration
  counts (static python loops — shapes differ per level), batched
  ``[B, H, W]`` luma planes end to end.
* Warping is 4 ``take_along_axis`` gathers + a lerp (same recipe as
  ops/remap.py, generalized to per-batch per-pixel maps).
* Blur/box aggregation are separable 1-D convolutions
  (``lax.conv_general_dilated``) — MXU/VPU-friendly, XLA fuses the
  elementwise structure-tensor products into them.
* The per-pixel 2x2 solve is closed form (no linalg), vectorized over
  every pixel of every frame.

The compute cost is O(B·H·W·(window + iters)) — negligible next to the
fused decode-postproc path and far from any host bottleneck, so this is
deliberately plain XLA (no Pallas).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "lucas_kanade_flow",
    "warp_image",
    "interpolate_midpoint",
    "mv_to_dense_flow",
]


def _as_f32_luma(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W] (luma) or [B, H, W, C] (mean over C) → f32 in [0, 1]."""
    if x.ndim == 4:
        x = x.astype(jnp.float32).mean(axis=-1)
    else:
        x = x.astype(jnp.float32)
    return x * (1.0 / 255.0)


def _sep_conv(img: jnp.ndarray, k: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """Separable 2-D convolution of [B, H, W] with 1-D kernel k (SAME)."""
    b, h, w = img.shape
    x = img[:, None, :, :]  # NCHW
    kh = k[None, None, :, None]
    kw = k[None, None, None, :]
    dn = ("NCHW", "OIHW", "NCHW")
    pad = len(k) // 2
    x = jax.lax.conv_general_dilated(
        x, kh, (stride, 1), [(pad, pad), (0, 0)], dimension_numbers=dn
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, stride), [(0, 0), (pad, pad)], dimension_numbers=dn
    )
    return x[:, 0]


_GAUSS5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


def _pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """Gaussian blur + 2x decimation (classic image pyramid level)."""
    return _sep_conv(img, jnp.asarray(_GAUSS5), stride=2)


def _sample_bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Per-batch per-pixel bilinear lookup.

    img [B, H, W]; x/y [B, Ho, Wo] absolute f32 source coordinates
    (clamped to the border, like ops/remap.py) → [B, Ho, Wo].
    """
    b, h, w = img.shape
    x = jnp.clip(x, 0.0, w - 1.0)
    y = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = x - x0.astype(jnp.float32)
    fy = y - y0.astype(jnp.float32)
    flat = img.reshape(b, h * w)
    ho, wo = x.shape[1], x.shape[2]

    def at(yi, xi):
        idx = (yi * w + xi).reshape(b, ho * wo)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(b, ho, wo)

    top = at(y0, x0) * (1.0 - fx) + at(y0, x1) * fx
    bot = at(y1, x0) * (1.0 - fx) + at(y1, x1) * fx
    return top * (1.0 - fy) + bot * fy


def _grid(b: int, h: int, w: int):
    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    return (
        jnp.broadcast_to(gx, (b, h, w)),
        jnp.broadcast_to(gy, (b, h, w)),
    )


def _lk_refine(prev, nxt, flow, iters: int, window: int, eps: float):
    """`iters` Lucas-Kanade updates of `flow` at one pyramid level."""
    b, h, w = prev.shape
    box = jnp.full((window,), 1.0 / window, jnp.float32)
    gx, gy = _grid(b, h, w)
    for _ in range(iters):
        u, v = flow[..., 0], flow[..., 1]
        warped = _sample_bilinear(nxt, gx + u, gy + v)

        # symmetric central-difference gradients (mean of prev and the
        # warped next) — halves the linearization bias on large shifts
        def grad(im):
            ix_ = 0.5 * (jnp.roll(im, -1, axis=2) - jnp.roll(im, 1, axis=2))
            iy_ = 0.5 * (jnp.roll(im, -1, axis=1) - jnp.roll(im, 1, axis=1))
            return ix_, iy_

        ixw, iyw = grad(warped)
        ixp, iyp = grad(prev)
        ix, iy = 0.5 * (ixw + ixp), 0.5 * (iyw + iyp)
        it = warped - prev
        # window-aggregated structure tensor (separable box filter; XLA
        # fuses the products into the convs)
        sxx = _sep_conv(ix * ix, box) + eps
        syy = _sep_conv(iy * iy, box) + eps
        sxy = _sep_conv(ix * iy, box)
        sxt = _sep_conv(ix * it, box)
        syt = _sep_conv(iy * it, box)
        det = sxx * syy - sxy * sxy
        du = (sxy * syt - syy * sxt) / det
        dv = (sxy * sxt - sxx * syt) / det
        # bound the per-iteration step: ill-conditioned (flat) windows
        # otherwise shoot to huge values the next warp can't recover from
        du = jnp.clip(du, -float(window), float(window))
        dv = jnp.clip(dv, -float(window), float(window))
        flow = flow + jnp.stack([du, dv], axis=-1)
    return flow


@partial(jax.jit, static_argnames=("levels", "iters", "window"))
def lucas_kanade_flow(
    prev: jnp.ndarray,
    nxt: jnp.ndarray,
    *,
    levels: int = 3,
    iters: int = 3,
    window: int = 9,
    eps: float = 1e-4,
) -> jnp.ndarray:
    """Dense flow prev→next: ``prev(x) ≈ next(x + flow(x))``.

    prev/nxt: ``[B, H, W]`` luma (u8 or float, 0-255 scale) or
    ``[B, H, W, C]`` (channel-averaged). Returns ``[B, H, W, 2]`` f32 —
    ``flow[..., 0]`` = dx, ``flow[..., 1]`` = dy, in pixels at full
    resolution.

    ``levels`` coarse-to-fine pyramid levels handle motion up to about
    ``window · 2**levels`` pixels; ``iters`` LK updates run per level.
    All counts are static so the whole solve is one compiled program.
    """
    p = _as_f32_luma(prev)
    n = _as_f32_luma(nxt)
    if p.shape != n.shape:
        raise ValueError(f"frame shapes differ: {p.shape} vs {n.shape}")
    pyr = [(p, n)]
    for _ in range(levels - 1):
        p, n = pyr[-1]
        if min(p.shape[1] // 2, p.shape[2] // 2) < max(8, window):
            break  # don't shrink below the aggregation window
        pyr.append((_pyr_down(p), _pyr_down(n)))

    pc, nc = pyr[-1]
    flow = jnp.zeros(pc.shape + (2,), jnp.float32)
    for lvl in range(len(pyr) - 1, -1, -1):
        pl, nl = pyr[lvl]
        if flow.shape[1:3] != pl.shape[1:3]:
            # upsample the coarser flow to this level (and scale values)
            flow = 2.0 * jax.image.resize(
                flow, (pl.shape[0],) + pl.shape[1:3] + (2,), "linear"
            )
        flow = _lk_refine(pl, nl, flow, iters, window, eps)
    return flow


@partial(jax.jit, static_argnames=("scale",))
def warp_image(
    img: jnp.ndarray, flow: jnp.ndarray, *, scale: float = 1.0
) -> jnp.ndarray:
    """Backward-warp ``img`` along ``scale * flow``.

    img: ``[B, H, W]`` or ``[B, H, W, C]``; flow: ``[B, H, W, 2]`` with
    the :func:`lucas_kanade_flow` convention — so
    ``warp_image(next, flow) ≈ prev``. Output dtype matches the input
    (integer inputs are rounded and clipped).
    """
    chans = img.ndim == 4
    planes = jnp.moveaxis(img, -1, 0) if chans else img[None]
    gx, gy = _grid(img.shape[0], img.shape[1], img.shape[2])
    x = gx + scale * flow[..., 0]
    y = gy + scale * flow[..., 1]
    out = jnp.stack(
        [_sample_bilinear(p.astype(jnp.float32), x, y) for p in planes]
    )
    out = jnp.moveaxis(out, 0, -1) if chans else out[0]
    if jnp.issubdtype(img.dtype, jnp.integer):
        info = jnp.iinfo(img.dtype)
        return jnp.clip(jnp.rint(out), info.min, info.max).astype(img.dtype)
    return out.astype(img.dtype)


@partial(jax.jit, static_argnames=("levels", "iters", "window"))
def interpolate_midpoint(
    prev: jnp.ndarray,
    nxt: jnp.ndarray,
    *,
    levels: int = 3,
    iters: int = 3,
    window: int = 9,
) -> jnp.ndarray:
    """Synthesize the temporal midpoint frame between prev and next.

    Computes dense flow both ways, pulls each endpoint halfway along its
    own field, and blends — the standard symmetric motion-compensated
    interpolation. Input ``[B, H, W]`` or ``[B, H, W, C]``; output same
    shape/dtype. (Frame-rate upconversion demo:
    samples/sample_flow_interp.py.)
    """
    fwd = lucas_kanade_flow(
        prev, nxt, levels=levels, iters=iters, window=window
    )
    bwd = lucas_kanade_flow(
        nxt, prev, levels=levels, iters=iters, window=window
    )
    # prev(x) ≈ next(x + fwd): the midpoint pulled from next sits half
    # way along fwd from the prev-anchored grid (and vice versa)
    a = warp_image(nxt.astype(jnp.float32), fwd, scale=0.5)
    c = warp_image(prev.astype(jnp.float32), bwd, scale=0.5)
    out = 0.5 * (a + c)
    if jnp.issubdtype(prev.dtype, jnp.integer):
        info = jnp.iinfo(prev.dtype)
        return jnp.clip(jnp.rint(out), info.min, info.max).astype(prev.dtype)
    return out.astype(prev.dtype)


def mv_to_dense_flow(mvs: np.ndarray, width: int, height: int) -> np.ndarray:
    """Densify decoder motion vectors into a ``[H, W, 2]`` f32 field.

    ``mvs`` is the structured array returned by
    ``PyFfmpegDecoder.GetMotionVectors()`` (fields ``source, w, h,
    src_x, src_y, dst_x, dst_y, motion_x, motion_y, motion_scale`` —
    the reference's ``MotionVector`` struct, PyNvCodec.hpp:48-55).
    Each block around (dst_x, dst_y) is filled with its subpel motion,
    sign-normalized to the prev→next convention of
    :func:`lucas_kanade_flow`: FFmpeg defines ``src = dst +
    motion/motion_scale`` (motion points TOWARD the reference frame),
    so for past references (``source < 0``) the prev→next displacement
    is ``-(motion/scale)`` (negated here), while future references
    (``source > 0``) already point along prev→next and keep their sign.
    The field is anchored at the block's *dst* (current/next-frame)
    coordinates, which approximates the prev-anchored LK field.
    Host-side numpy (runs once per frame on block-level data — no
    device round trip).
    """
    flow = np.zeros((height, width, 2), np.float32)
    if mvs is None or len(mvs) == 0:
        return flow
    for mv in mvs:
        scale = float(mv["motion_scale"]) or 1.0
        dx = float(mv["motion_x"]) / scale
        dy = float(mv["motion_y"]) / scale
        if int(mv["source"]) < 0:
            dx, dy = -dx, -dy
        bw, bh = int(mv["w"]), int(mv["h"])
        x0 = int(mv["dst_x"]) - bw // 2
        y0 = int(mv["dst_y"]) - bh // 2
        x1 = max(min(x0 + bw, width), 0)
        y1 = max(min(y0 + bh, height), 0)
        x0 = min(max(x0, 0), width)
        y0 = min(max(y0, 0), height)
        flow[y0:y1, x0:x1, 0] = dx
        flow[y0:y1, x0:x1, 1] = dy
    return flow
