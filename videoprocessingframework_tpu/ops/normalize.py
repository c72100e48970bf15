"""Normalization ops for model-input preparation.

The reference does this stage in torch after export
(samples/SampleTorchResnet.py: tensor/255 → torchvision Normalize); here it
is a jit-fused elementwise op that composes with CSC/resize in one kernel
(see ops/fused.py).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

#: torchvision ImageNet constants, as used by the reference's ResNet sample
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@partial(jax.jit, static_argnames=("mean", "std", "scale", "channels_first"))
def normalize(
    img: jnp.ndarray,
    *,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    scale: float = 1.0 / 255.0,
    channels_first: bool = False,
) -> jnp.ndarray:
    """(N, H, W, C) uint8/float → normalized float32; optionally NCHW out.

    out = (img·scale − mean) / std.
    """
    x = img.astype(jnp.float32) * jnp.float32(scale)
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    x = (x - m) * (1.0 / s)
    if channels_first:
        x = jnp.moveaxis(x, -1, 1)
    return x
