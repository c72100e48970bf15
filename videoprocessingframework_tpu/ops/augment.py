"""Device-fused training augmentations: crop/flip/jitter INSIDE the
fused postproc program.

TPU-first design: every geometric augmentation is expressed in the same
linear algebra the fused pipeline already runs on the MXU —

* **random resized crop** — a per-clip interpolation matrix built
  in-graph over the crop window (same dst-pixel-center / edge-clamp /
  row-normalize construction as ``ops.resize.resize_matrix``, just
  vectorized over the batch), so crop+resize is ONE batched matmul per
  axis instead of a gather + resize chain;
* **horizontal flip** — reversing the output axis of the column matrix
  (free: the matrix is built in-graph anyway);
* **color jitter** — per-clip affine color math fused after the CSC:
  brightness/contrast/saturation as blends against gray, hue as a
  linear YIQ-space rotation (the MXU-fusable definition of hue shift;
  NOT torchvision's HSV wraparound — documented deviation).

Everything samples from a counter-based key ``fold_in(fold_in(
PRNGKey(seed), epoch), batch_index)`` built *inside* the program from a
tiny uint32 operand, so augmentation is a pure function of
(seed, epoch, batch index): deterministic across runs, worker counts,
and mid-epoch checkpoint/resume — and the host never dispatches
separate key-derivation ops through the (40 ms RTT) device link.

Params are sampled per CLIP and broadcast across its frames: temporal
consistency is what video training wants (per-frame jitter reads as
flicker to the model).

The reference has no augmentation at all (its ML samples feed raw
decoded frames — samples/SampleTorchResnet.py:1095-1151); this module
is a beyond-parity extension of the training data path.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.enums import ColorRange, ColorSpace, PixelFormat
from . import colorspace as cs
from .convert import _round_u8
from .fused import unpack_yuv_planes
from .normalize import IMAGENET_MEAN, IMAGENET_STD

F = PixelFormat

# Rec.601 luma weights: the gray axis for saturation/contrast blends
# (torchvision's rgb_to_grayscale convention).
_GRAY_W = (0.299, 0.587, 0.114)

# RGB -> YIQ (NTSC) for the linear hue rotation.
_RGB2YIQ = np.array(
    [
        [0.299, 0.587, 0.114],
        [0.595716, -0.274453, -0.321263],
        [0.211456, -0.522591, 0.311135],
    ],
    dtype=np.float64,
)
_YIQ2RGB = np.linalg.inv(_RGB2YIQ)


@dataclass(frozen=True)
class AugmentSpec:
    """Per-clip augmentation configuration (hashable: jit-static).

    crop        — random resized crop. Area fraction ~ U(crop_scale),
                  aspect ~ logU(crop_ratio) (torchvision semantics,
                  except infeasible samples are clamped to the frame
                  instead of re-drawn — rejection loops don't compile).
    hflip       — probability of a horizontal flip.
    brightness  — factor ~ U(max(0, 1-b), 1+b); 0 disables.
    contrast    — factor ~ U(max(0, 1-c), 1+c) blended against the
                  clip's mean gray level (per-clip, not per-frame:
                  flicker-free). 0 disables.
    saturation  — factor ~ U(max(0, 1-s), 1+s) blended against gray.
    hue         — rotation ~ U(-h, h) in turns of the YIQ chroma plane
                  (h ≤ 0.5, torchvision's range convention). 0 disables.
    time_reverse — probability of playing the clip backwards (frame
                  order reversed along T; a video-specific augmentation
                  with no image analog). 0 disables.

    Jitter applies in the fixed order brightness → contrast →
    saturation → hue (torchvision randomizes the order per sample; a
    fixed order keeps the program static and the math testable).
    """

    crop: bool = True
    crop_scale: Tuple[float, float] = (0.3, 1.0)
    crop_ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0)
    hflip: float = 0.5
    brightness: float = 0.0
    contrast: float = 0.0
    saturation: float = 0.0
    hue: float = 0.0
    time_reverse: float = 0.0

    def __post_init__(self):
        lo, hi = self.crop_scale
        if not (0.0 < lo <= hi <= 1.0):
            raise ValueError(f"crop_scale must be 0 < lo <= hi <= 1: {self.crop_scale}")
        rlo, rhi = self.crop_ratio
        if not (0.0 < rlo <= rhi):
            raise ValueError(f"crop_ratio must be 0 < lo <= hi: {self.crop_ratio}")
        if not (0.0 <= self.hflip <= 1.0):
            raise ValueError(f"hflip must be a probability: {self.hflip}")
        for name in ("brightness", "contrast", "saturation"):
            if getattr(self, name) < 0.0:
                raise ValueError(f"{name} must be >= 0")
        if not (0.0 <= self.hue <= 0.5):
            raise ValueError(f"hue must be in [0, 0.5] turns: {self.hue}")
        if not (0.0 <= self.time_reverse <= 1.0):
            raise ValueError(
                f"time_reverse must be a probability: {self.time_reverse}"
            )

    @property
    def any_jitter(self) -> bool:
        return bool(self.brightness or self.contrast or self.saturation or self.hue)


def sample_augment_params(key, batch: int, in_h: int, in_w: int, spec: AugmentSpec):
    """Per-clip params: crop boxes [B] (y0, x0, ch, cw in luma pixels,
    f32), flip mask [B], jitter factors [B]. Pure function of the key."""
    kc, ka, kx, ky, kf, kb, kn, ks, kh, kt = jax.random.split(key, 10)
    B = batch
    if spec.crop:
        area = jax.random.uniform(
            kc, (B,), minval=spec.crop_scale[0], maxval=spec.crop_scale[1]
        ) * (in_h * in_w)
        log_r = jax.random.uniform(
            ka,
            (B,),
            minval=float(np.log(spec.crop_ratio[0])),
            maxval=float(np.log(spec.crop_ratio[1])),
        )
        ratio = jnp.exp(log_r)
        cw = jnp.minimum(jnp.sqrt(area * ratio), float(in_w))
        ch = jnp.minimum(jnp.sqrt(area / ratio), float(in_h))
        x0 = jax.random.uniform(kx, (B,)) * (in_w - cw)
        y0 = jax.random.uniform(ky, (B,)) * (in_h - ch)
    else:
        ch = jnp.full((B,), float(in_h))
        cw = jnp.full((B,), float(in_w))
        y0 = jnp.zeros((B,))
        x0 = jnp.zeros((B,))
    flip = (
        jax.random.uniform(kf, (B,)) < spec.hflip
        if spec.hflip > 0.0
        else jnp.zeros((B,), bool)
    )

    def factor(k, amt):
        if not amt:
            return jnp.ones((B,), jnp.float32)
        return jax.random.uniform(
            k, (B,), minval=max(0.0, 1.0 - amt), maxval=1.0 + amt
        )

    theta = (
        jax.random.uniform(kh, (B,), minval=-spec.hue, maxval=spec.hue)
        * (2.0 * np.pi)
        if spec.hue
        else jnp.zeros((B,), jnp.float32)
    )
    trev = (
        jax.random.uniform(kt, (B,)) < spec.time_reverse
        if spec.time_reverse > 0.0
        else jnp.zeros((B,), bool)
    )
    return {
        "y0": y0,
        "x0": x0,
        "ch": ch,
        "cw": cw,
        "flip": flip,
        "brightness": factor(kb, spec.brightness),
        "contrast": factor(kn, spec.contrast),
        "saturation": factor(ks, spec.saturation),
        "hue": theta,
        "time_reverse": trev,
    }


def _kernel_weights(d, method: str):
    if method == "lanczos":
        w = jnp.sinc(d) * jnp.sinc(d / 3.0)
        return jnp.where(jnp.abs(d) < 3.0, w, 0.0)
    if method == "bilinear":
        return jnp.maximum(0.0, 1.0 - jnp.abs(d))
    raise ValueError(f"augment supports lanczos|bilinear, got {method!r}")


def window_matrices(start, length, n_in: int, n_out: int, method: str):
    """Batched crop+resize interpolation matrices, built in-graph.

    start/length: [B] window origin/extent in source pixels. Returns
    [B, n_out, n_in] f32 with the same construction as
    ``ops.resize.resize_matrix`` (dst-pixel-center mapping, taps
    clamped into the frame, rows normalized to 1) — the static host
    matrix is the special case start=0, length=n_in, which the
    equality tests pin.
    """
    a = 3 if method == "lanczos" else 1
    i = jnp.arange(n_out, dtype=jnp.float32)
    scale = (length / n_out)[:, None]  # [B, 1]
    src = start[:, None] + (i[None, :] + 0.5) * scale - 0.5  # [B, n_out]
    k = jnp.arange(n_in, dtype=jnp.float32)
    w = _kernel_weights(src[:, :, None] - k[None, None, :], method)
    # taps the host construction clamps into the edge pixels: the tap
    # range is [floor(src)-a+1, floor(src)+a] and src ∈ (-0.5, n_in-0.5),
    # so up to `a` taps can fall off each side
    left = jnp.zeros_like(src)
    right = jnp.zeros_like(src)
    for e in range(1, a + 1):
        left = left + _kernel_weights(src - (-float(e)), method)
        right = right + _kernel_weights(src - float(n_in - 1 + e), method)
    w = w.at[:, :, 0].add(left).at[:, :, -1].add(right)
    return w / w.sum(-1, keepdims=True)


def _hue_matrices(theta):
    """[B, 3, 3] linear hue rotation: RGB → YIQ → rotate chroma → RGB."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    rot = jnp.stack(
        [
            jnp.stack([o, z, z], -1),
            jnp.stack([z, c, -s], -1),
            jnp.stack([z, s, c], -1),
        ],
        -2,
    )  # [B, 3, 3]
    t = jnp.asarray(_RGB2YIQ, jnp.float32)
    tinv = jnp.asarray(_YIQ2RGB, jnp.float32)
    return jnp.einsum("ij,bjk,kl->bil", tinv, rot, t, precision="highest")


def _color_jitter(rgb, params, spec: AugmentSpec):
    """Jitter on [B, T, h, w, 3] f32 RGB in [0, 255]; clamps after each
    enabled stage (torchvision float-image semantics, scaled x255)."""
    def bparam(name):
        return params[name][:, None, None, None, None]

    if spec.brightness:
        rgb = jnp.clip(rgb * bparam("brightness"), 0.0, 255.0)
    gray_w = jnp.asarray(_GRAY_W, jnp.float32)
    if spec.contrast:
        gray_mean = jnp.einsum(
            "bthwc,c->bt", rgb, gray_w, precision="highest"
        ).mean(-1) / (rgb.shape[-3] * rgb.shape[-2])
        gm = gray_mean[:, None, None, None, None]
        rgb = jnp.clip((rgb - gm) * bparam("contrast") + gm, 0.0, 255.0)
    if spec.saturation:
        gray = jnp.einsum("bthwc,c->bthw", rgb, gray_w, precision="highest")[
            ..., None
        ]
        rgb = jnp.clip(gray + (rgb - gray) * bparam("saturation"), 0.0, 255.0)
    if spec.hue:
        hm = _hue_matrices(params["hue"])  # [B, 3, 3]
        rgb = jnp.clip(
            jnp.einsum("bdc,bthwc->bthwd", hm, rgb, precision="highest"),
            0.0,
            255.0,
        )
    return rgb


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
        "spec",
        "clip_len",
    ),
)
def augment_postproc(
    *planes_and_ctr,
    src_format: PixelFormat,
    space: ColorSpace,
    rng: ColorRange,
    out_h: int,
    out_w: int,
    method: str = "lanczos",
    output: str = "normalized",
    mean: Sequence[float] = tuple(IMAGENET_MEAN),
    std: Sequence[float] = tuple(IMAGENET_STD),
    spec: AugmentSpec = AugmentSpec(),
    clip_len: int = 1,
):
    """Fused decode postproc WITH augmentation: one compiled program.

    planes_and_ctr: the decode_postproc plane layout(s) followed by a
    uint32 counter array ``[seed, epoch, batch_index]`` — the PRNG key
    derives in-graph (`fold_in` chain), so epoch/batch changes never
    recompile and the host never runs per-batch key ops on-device.

    Input planes are flat ``[B·clip_len, ...]``; params are sampled per
    clip and broadcast across its frames. Output is flat like
    ``decode_postproc``'s (the loader reshapes to [B, T, ...]).
    """
    *planes, ctr = planes_and_ctr
    if method == "nearest":
        raise ValueError("augment supports lanczos|bilinear, got 'nearest'")
    key = jax.random.fold_in(
        jax.random.fold_in(jax.random.PRNGKey(ctr[0]), ctr[1]), ctr[2]
    )
    fmt = PixelFormat(src_format)
    y, u, v, subsampled, sub_h = unpack_yuv_planes(fmt, planes)
    gray = u is None
    n = y.shape[0]
    T = int(clip_len)
    if n % T:
        raise ValueError(f"flat batch of {n} frames is not divisible by clip_len={T}")
    B = n // T
    in_h, in_w = y.shape[-2], y.shape[-1]

    p = sample_augment_params(key, B, in_h, in_w, spec)

    rmat = window_matrices(p["y0"], p["ch"], in_h, out_h, method)
    cmat = window_matrices(p["x0"], p["cw"], in_w, out_w, method)
    # horizontal flip = reverse the OUTPUT axis of the column matrix
    # (crop-then-flip, torchvision order); free — the matrix is data
    cmat = jnp.where(p["flip"][:, None, None], cmat[:, ::-1, :], cmat)

    def bt(x):  # flat [B·T, h, w] → [B, T, h, w]
        return x.reshape(B, T, *x.shape[1:])

    def resize(x, rm, cm):
        t = jnp.einsum(
            "bpw,bthw->bthp", cm, x.astype(jnp.float32), precision="highest"
        )
        return jnp.einsum("boh,bthp->btop", rm, t, precision="highest")

    yb = resize(bt(y), rmat, cmat)
    if gray:
        ub = vb = jnp.full(yb.shape, 128.0, jnp.float32)
    elif subsampled:
        ub = resize(bt(u), _chroma_collapse_b(rmat), _chroma_collapse_b(cmat))
        vb = resize(bt(v), _chroma_collapse_b(rmat), _chroma_collapse_b(cmat))
    elif sub_h:
        ub = resize(bt(u), rmat, _chroma_collapse_b(cmat))
        vb = resize(bt(v), rmat, _chroma_collapse_b(cmat))
    else:
        ub = resize(bt(u), rmat, cmat)
        vb = resize(bt(v), rmat, cmat)

    m, off = cs.rgb_from_ycbcr_matrix(space, rng)
    ycc = jnp.stack([yb, ub, vb], axis=-1) - jnp.asarray(off, jnp.float32)
    rgb = jnp.einsum(
        "bthwc,dc->bthwd", ycc, jnp.asarray(m, jnp.float32), precision="highest"
    )
    rgb = jnp.clip(rgb, 0.0, 255.0)
    if spec.any_jitter:
        rgb = _color_jitter(rgb, p, spec)
    if spec.time_reverse and T > 1:
        rgb = jnp.where(
            p["time_reverse"][:, None, None, None, None],
            rgb[:, ::-1], rgb,
        )
    rgb = rgb.reshape(n, out_h, out_w, 3)

    if output == "rgb_u8":
        return _round_u8(rgb)
    if output == "rgb_f32":
        return jnp.clip(rgb * (1.0 / 255.0), 0.0, 1.0)
    x = jnp.clip(rgb * (1.0 / 255.0), 0.0, 1.0)
    x = (x - jnp.asarray(mean, jnp.float32)) * (1.0 / jnp.asarray(std, jnp.float32))
    if output == "normalized_nchw":
        return jnp.moveaxis(x, -1, 1)
    if output == "normalized":
        return x
    raise ValueError(f"unknown output mode {output!r}")


def _chroma_collapse_b(mat):
    """Batched ``fused._chroma_collapse``: [B, o, n] → [B, o, n/2]."""
    b, o, n = mat.shape
    return mat.reshape(b, o, n // 2, 2).sum(-1)


@partial(
    jax.jit,
    static_argnames=(
        "num_classes", "mixup_alpha", "cutmix_alpha", "switch_prob",
        "prob",
    ),
)
def mixup_cutmix(
    x,
    labels,
    key,
    *,
    num_classes: int,
    mixup_alpha: float = 0.2,
    cutmix_alpha: float = 1.0,
    switch_prob: float = 0.5,
    prob: float = 1.0,
):
    """Batch-level MixUp/CutMix on device: one fused program.

    x: float batch, channels-last — [B, H, W, C] images or
    [B, T, H, W, C] clips (a clip mixes with the same partner/λ/box in
    every frame: temporal consistency).
    labels: int [B] — returned as soft targets [B, num_classes].
    key: a jax PRNG key; pairing is with the reversed batch (the
    standard cheap permutation), λ ~ Beta(α, α) per sample, and each
    sample independently runs CutMix (with probability ``switch_prob``)
    or MixUp. ``prob`` gates the whole op per sample. For CutMix the
    pasted box has exact area 1−λ (λ re-derived from the integer box so
    the soft label matches the pixels).

    Train-time only; returns (mixed_x, soft_labels). The reference has
    no training-side anything — this extends the beyond-parity training
    path (use after the loader's augmented postproc, e.g. on
    ``output='normalized'`` batches).
    """
    if x.ndim not in (4, 5):
        raise ValueError(
            f"mixup_cutmix expects [B,H,W,C] or [B,T,H,W,C], got {x.shape}"
        )
    if not jnp.issubdtype(x.dtype, jnp.floating):
        # blending u8 then casting back would floor-truncate every pixel
        # (systematic dark bias) and break the exact-area label contract
        raise ValueError(
            f"mixup_cutmix needs a float batch (e.g. the loader's "
            f"'normalized'/'rgb_f32' outputs), got dtype {x.dtype}"
        )
    if mixup_alpha <= 0 and cutmix_alpha <= 0:
        raise ValueError("need mixup_alpha > 0 or cutmix_alpha > 0")
    B = x.shape[0]
    H, W = x.shape[-3], x.shape[-2]
    kl, kc, kg, kx, ky = jax.random.split(key, 5)
    xf = x.astype(jnp.float32)
    x2 = xf[::-1]
    y1 = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    y2 = y1[::-1]

    use_cut = (
        jax.random.uniform(kc, (B,)) < switch_prob
        if cutmix_alpha > 0 and mixup_alpha > 0
        else jnp.full((B,), cutmix_alpha > 0)
    )
    gate = jax.random.uniform(kg, (B,)) < prob

    def beta(k, a):
        if a <= 0:
            return jnp.ones((B,), jnp.float32)
        return jax.random.beta(k, a, a, (B,)).astype(jnp.float32)

    lam = jnp.where(
        use_cut, beta(kl, cutmix_alpha), beta(kl, mixup_alpha)
    )

    # -- CutMix: per-sample box of area (1-λ), clamped inside the frame;
    # λ re-derived from the INTEGER box so labels match pixels exactly
    cut = jnp.sqrt(jnp.maximum(1.0 - lam, 0.0))
    bh = jnp.round(cut * H)
    bw = jnp.round(cut * W)
    cy = jnp.round(jax.random.uniform(ky, (B,)) * H)
    cx = jnp.round(jax.random.uniform(kx, (B,)) * W)
    t0 = jnp.clip(cy - bh / 2, 0, H)
    t1 = jnp.clip(cy + bh / 2, 0, H)
    l0 = jnp.clip(cx - bw / 2, 0, W)
    l1 = jnp.clip(cx + bw / 2, 0, W)
    rows = jnp.arange(H, dtype=jnp.float32)
    cols = jnp.arange(W, dtype=jnp.float32)
    in_rows = (rows[None, :] >= t0[:, None]) & (rows[None, :] < t1[:, None])
    in_cols = (cols[None, :] >= l0[:, None]) & (cols[None, :] < l1[:, None])
    box = in_rows[:, :, None] & in_cols[:, None, :]  # [B, H, W]
    box_frac = box.mean(axis=(1, 2))  # exact pasted-area fraction
    lam_cut = 1.0 - box_frac

    shape = (B,) + (1,) * (x.ndim - 1)
    lam_mix = lam.reshape(shape)
    boxb = box[:, None, :, :, None] if x.ndim == 5 else box[:, :, :, None]
    mixed_mix = lam_mix * xf + (1.0 - lam_mix) * x2
    mixed_cut = jnp.where(boxb, x2, xf)
    use_cutb = use_cut.reshape(shape)
    mixed = jnp.where(use_cutb, mixed_cut, mixed_mix)
    lam_eff = jnp.where(use_cut, lam_cut, lam)
    gateb = gate.reshape(shape)
    mixed = jnp.where(gateb, mixed, xf)
    lam_eff = jnp.where(gate, lam_eff, 1.0)
    soft = lam_eff[:, None] * y1 + (1.0 - lam_eff)[:, None] * y2
    return mixed.astype(x.dtype), soft


class AugmentPipeline:
    """Configured augmenting pipeline: the :class:`~videoprocessing
    framework_tpu.ops.fused.FusedPipeline` analog with an
    :class:`AugmentSpec` bound in.

    Call with the same batched plane layouts plus a counter:
    ``pipe(*planes, ctr=(seed, epoch, batch_index))`` (any uint32-able
    triple; also accepts a ready ``jnp.uint32[3]``). Per-clip
    randomness is a pure function of that counter.

    Per-clip interpolation matrices rule the Pallas kernels out (they
    bind matrices at trace time); the batched-matmul XLA path is MXU
    work of the same order, and augmentation is a training-path feature
    where the postproc kernel has ~100x headroom over host decode
    (docs/performance.md).
    """

    def __init__(
        self,
        src_format: PixelFormat,
        color_space: ColorSpace,
        color_range: ColorRange,
        out_size: Tuple[int, int],  # (width, height)
        spec: AugmentSpec,
        clip_len: int = 1,
        method: str = "lanczos",
        output: str = "normalized",
        mean: Sequence[float] = tuple(IMAGENET_MEAN),
        std: Sequence[float] = tuple(IMAGENET_STD),
        seed: int = 0,
    ):
        if method not in ("lanczos", "bilinear"):
            raise ValueError(f"augment supports lanczos|bilinear, got {method!r}")
        self.src_format = PixelFormat(src_format)
        self.space = ColorSpace(color_space)
        self.range = ColorRange(color_range)
        self.out_w, self.out_h = out_size
        self.spec = spec
        self.clip_len = int(clip_len)
        self.method = method
        self.output = output
        self.mean = tuple(mean)
        self.std = tuple(std)
        self.seed = int(seed) & 0xFFFFFFFF

    def __call__(self, *planes, ctr=None, epoch: int = 0, batch_index: int = 0):
        if ctr is None:
            ctr = np.asarray(
                [self.seed, epoch & 0xFFFFFFFF, batch_index & 0xFFFFFFFF],
                np.uint32,
            )
        else:
            ctr = jnp.asarray(ctr, jnp.uint32)
            if ctr.shape != (3,):
                raise ValueError("ctr must be (seed, epoch, batch_index)")
        return augment_postproc(
            *planes,
            ctr,
            src_format=self.src_format,
            space=self.space,
            rng=self.range,
            out_h=self.out_h,
            out_w=self.out_w,
            method=self.method,
            output=self.output,
            mean=self.mean,
            std=self.std,
            spec=self.spec,
            clip_len=self.clip_len,
        )
