"""ResNet family in Flax — the framework's bundled inference models.

The reference demonstrates decoded-frame → model handoff with torchvision
ResNet-50 (samples/SampleTorchResnet.py:1060-1160); this is the JAX/Flax
equivalent the framework ships so the decode→CSC→resize→normalize→model
chain is a single-device program end to end. Written bfloat16-first for
the MXU (params/activations bf16, batch-norm statistics and logits f32).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ModuleDef = Any


class BottleneckBlock(nn.Module):
    filters: int
    strides: Tuple[int, int] = (1, 1)
    norm: ModuleDef = nn.BatchNorm
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(self.norm, dtype=self.dtype)
        residual = x
        y = conv(self.filters, (1, 1), name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.filters, (3, 3), self.strides, name="conv2")(y)
        y = norm(name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.filters * 4, (1, 1), name="conv3")(y)
        y = norm(name="bn3", scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = conv(
                self.filters * 4, (1, 1), self.strides, name="proj_conv"
            )(residual)
            residual = norm(name="proj_bn")(residual)
        return nn.relu(residual + y)


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    num_classes: int = 1000
    width: int = 64
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Under jit+GSPMD the batch statistics are global automatically
        # (XLA reduces over the full sharded batch); no axis_name needed.
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
        )
        x = x.astype(self.dtype)
        x = nn.Conv(
            self.width, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="stem_conv",
        )(x)
        x = norm(dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, n_blocks in enumerate(self.stage_sizes):
            for j in range(n_blocks):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                x = BottleneckBlock(
                    filters=self.width * 2**i,
                    strides=strides,
                    norm=norm,
                    dtype=self.dtype,
                    name=f"stage{i + 1}_block{j + 1}",
                )(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=jnp.float32, name="classifier")(x)
        return x.astype(jnp.float32)


def resnet50(num_classes: int = 1000, dtype=jnp.bfloat16) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), num_classes=num_classes, dtype=dtype)


def resnet18_like(num_classes: int = 1000, dtype=jnp.bfloat16) -> ResNet:
    """Small bottleneck variant for tests / dry runs."""
    return ResNet(
        stage_sizes=(2, 2, 2, 2), num_classes=num_classes, width=16, dtype=dtype
    )


def init_params(model: ResNet, input_shape, rng=None):
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = model.init(
        rng, jnp.zeros(input_shape, jnp.float32), train=False
    )
    return variables
