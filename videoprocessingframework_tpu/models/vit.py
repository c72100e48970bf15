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
    head: bool = True  # False ⇒ return the normed CLS features

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
        if not self.head:
            return x  # [N, dim] CLS features (backbone mode)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        name="classifier")(x)


def vit_small(num_classes: int = 1000) -> ViT:
    return ViT(num_classes=num_classes)


def vit_tiny(num_classes: int = 1000) -> ViT:
    return ViT(num_classes=num_classes, dim=192, depth=4, heads=3)


def init_params(model: ViT, input_shape, rng=None):
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    return model.init(rng, jnp.zeros(input_shape, jnp.float32), train=False)


class VideoViT(nn.Module):
    """Factorized space-time video transformer (ViViT "model 2" shape).

    ``[B, T, H, W, C]`` clips: per-frame spatial encoder runs as ONE
    flat ``[B·T]`` batch (same TPU-first flattening as
    :class:`~videoprocessingframework_tpu.models.video.VideoClassifier`
    — the MXU sees one big batch), then a small temporal transformer
    over the T per-frame CLS features. Attention cost factorizes to
    O(T·S²) + O(T²) instead of joint space-time O((T·S)²), and the
    spatial half's parameter tree matches the image :class:`ViT`
    (under ``spatial/``) so image-pretrained weights can be grafted.

    bf16-first like ViT: matmuls in bfloat16, layer norms + logits f32.
    The temporal positional table bakes in the clip length T seen at
    init (train and serve at one clip length — the standard regime).
    """

    num_classes: int = 400
    patch: int = 16
    dim: int = 384
    depth: int = 6
    heads: int = 6
    temporal_depth: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, h, w, c = x.shape
        feats = ViT(
            patch=self.patch, dim=self.dim, depth=self.depth,
            heads=self.heads, dtype=self.dtype, head=False,
            name="spatial",
        )(x.reshape(b * t, h, w, c), train=train)
        z = feats.reshape(b, t, self.dim).astype(self.dtype)
        tpos = self.param(
            "time_pos", nn.initializers.normal(0.02),
            (1, t, self.dim), jnp.float32,
        )
        z = z + tpos.astype(self.dtype)
        tcls = self.param(
            "time_cls", nn.initializers.zeros, (1, 1, self.dim), jnp.float32
        )
        z = jnp.concatenate(
            [jnp.tile(tcls.astype(self.dtype), (b, 1, 1)), z], 1
        )
        for i in range(self.temporal_depth):
            z = ViTBlock(self.dim, self.heads, dtype=self.dtype,
                         name=f"tblock{i}")(z)
        z = nn.LayerNorm(dtype=jnp.float32)(z[:, 0])
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        name="classifier")(z)


def video_vit_tiny(num_classes: int = 400, temporal_depth: int = 2) -> VideoViT:
    return VideoViT(num_classes=num_classes, dim=192, depth=4, heads=3,
                    temporal_depth=temporal_depth)


def video_vit_small(num_classes: int = 400) -> VideoViT:
    return VideoViT(num_classes=num_classes)
