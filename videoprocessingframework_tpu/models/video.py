"""Video (clip) models: temporal heads over the bundled 2-D backbones.

Completes the training story around the clip loaders (data/): a
``[B, T, H, W, C]`` batch runs the per-frame backbone as ONE flat
``[B·T]`` forward (the MXU sees one big batch — no per-frame dispatch),
then a temporal head aggregates the T per-frame features. TPU-first
choices:

* frame-flattening instead of 3-D convolutions — XLA tiles big 2-D
  convs onto the MXU far better than thin depth-3 kernels, and the
  backbone's parameter tree matches the image ResNet's (under
  ``backbone/``, classifier re-initialized), so torch-imported trunk
  weights (models/weights.py) can be grafted in;
* the temporal stage operates on [B, T, F] features — tiny next to the
  frame stage, so attention there costs ~nothing;
* everything under one jit, dp×tp shardable exactly like the image
  models (batch on 'data'; the backbone's wide layers on 'model').

The reference has no video models at all (its ML samples classify one
frame at a time — samples/SampleTorchResnet.py:1095-1151); this is the
beyond-parity layer a video-training user needs.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .resnet import ResNet

__all__ = ["VideoClassifier", "video_resnet50", "video_resnet18_like"]


class VideoClassifier(nn.Module):
    """Per-frame 2-D backbone + temporal head over ``[B, T, H, W, C]``.

    ``temporal``: ``"mean"`` (average the T frame features — the strong
    simple baseline), ``"attention"`` (single-layer self-attention over
    time with a learned CLS query), or ``"last"``.

    Note: the ``"attention"`` head learns per-timestep positions, so its
    parameters bake in the clip length T seen at ``init`` — apply with a
    different T raises a flax shape error (train and serve at one clip
    length, the standard video-model regime). ``"mean"``/``"last"``
    generalize over T.
    """

    stage_sizes: tuple
    num_classes: int = 400
    width: int = 64
    temporal: str = "attention"
    heads: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, clips, train: bool = False):
        if clips.ndim != 5:
            raise ValueError(
                f"VideoClassifier wants [B, T, H, W, C], got {clips.shape}"
            )
        b, t = clips.shape[0], clips.shape[1]
        frames = clips.reshape((b * t,) + clips.shape[2:])

        # frame backbone: the bundled ResNet minus its classifier —
        # features are its global-average-pooled stage-4 output. Using
        # ResNet directly with num_classes=features would waste a dense;
        # instead instantiate it headless via feature_dim classifier and
        # treat that projection as the embedding layer.
        feat_dim = self.width * 8 * 4  # stage4 channels (bottleneck x4)
        backbone = ResNet(
            stage_sizes=self.stage_sizes,
            num_classes=feat_dim,  # acts as a learned embedding proj
            width=self.width,
            dtype=self.dtype,
            name="backbone",
        )
        f = backbone(frames, train=train)  # [B·T, F] float32
        f = f.reshape(b, t, -1).astype(self.dtype)

        if self.temporal == "mean":
            z = f.mean(axis=1)
        elif self.temporal == "last":
            z = f[:, -1]
        elif self.temporal == "attention":
            # learned positional phase + CLS query attending over time
            pos = self.param(
                "time_pos", nn.initializers.normal(0.02),
                (1, t, f.shape[-1]), self.dtype,
            )
            h = f + pos
            cls = self.param(
                "cls_query", nn.initializers.normal(0.02),
                (1, 1, f.shape[-1]), self.dtype,
            )
            q = jnp.tile(cls, (b, 1, 1))
            z = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, dtype=self.dtype,
                name="temporal_attn",
            )(q, h)[:, 0]
            z = z + q[:, 0]  # residual query
            z = nn.LayerNorm(dtype=self.dtype, name="temporal_ln")(z)
        else:
            raise ValueError(f"unknown temporal head {self.temporal!r}")
        z = nn.relu(z)
        out = nn.Dense(
            self.num_classes, dtype=jnp.float32, name="classifier"
        )(z.astype(jnp.float32))
        return out.astype(jnp.float32)


def video_resnet50(num_classes: int = 400, temporal: str = "attention",
                   dtype=jnp.bfloat16) -> VideoClassifier:
    return VideoClassifier(
        stage_sizes=(3, 4, 6, 3), num_classes=num_classes,
        temporal=temporal, dtype=dtype,
    )


def video_resnet18_like(num_classes: int = 8, temporal: str = "attention",
                        dtype=jnp.bfloat16) -> VideoClassifier:
    """Small variant for tests / dry runs."""
    return VideoClassifier(
        stage_sizes=(2, 2, 2, 2), num_classes=num_classes, width=16,
        temporal=temporal, dtype=dtype,
    )
