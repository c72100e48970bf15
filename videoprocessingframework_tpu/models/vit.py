"""Vision Transformer family — an MXU-dense alternative backbone for the
decode→model serving path (beyond the reference's CNN-only samples).

bf16-first: attention and MLP matmuls in bfloat16, layer norms and logits
in float32.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class ViTBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=jnp.float32)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="attn"
        )(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=jnp.float32)(x)
        y = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        return x + y


class ViT(nn.Module):
    num_classes: int = 1000
    patch: int = 16
    dim: int = 384
    depth: int = 6
    heads: int = 6
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        x = nn.Conv(
            self.dim, (self.patch, self.patch), (self.patch, self.patch),
            dtype=self.dtype, name="patchify",
        )(x.astype(self.dtype))
        x = x.reshape(n, -1, self.dim)
        cls = self.param(
            "cls", nn.initializers.zeros, (1, 1, self.dim), jnp.float32
        )
        x = jnp.concatenate([jnp.tile(cls.astype(self.dtype), (n, 1, 1)), x], 1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, x.shape[1], self.dim), jnp.float32,
        )
        x = x + pos.astype(self.dtype)
        for i in range(self.depth):
            x = ViTBlock(self.dim, self.heads, dtype=self.dtype,
                         name=f"block{i}")(x)
        x = nn.LayerNorm(dtype=jnp.float32)(x[:, 0])
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        name="classifier")(x)


def vit_small(num_classes: int = 1000) -> ViT:
    return ViT(num_classes=num_classes)


def vit_tiny(num_classes: int = 1000) -> ViT:
    return ViT(num_classes=num_classes, dim=192, depth=4, heads=3)


def init_params(model: ViT, input_shape, rng=None):
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    return model.init(rng, jnp.zeros(input_shape, jnp.float32), train=False)
