"""Semantic segmentation model family: FCN heads over the ResNet backbone.

The analog of the torchvision FCN-ResNet pipeline the reference
demonstrates (samples/SampleTorchSegmentation.py). The backbone reuses
:mod:`.resnet` stages; the head is a 1×1 classifier + bilinear upsample
(computed with the framework's own MXU resize matrices, so the whole
model stays one XLA program).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize_matrix
from .resnet import BottleneckBlock


class FCNResNet(nn.Module):
    """Fully-convolutional segmentation net with a ResNet-style encoder."""

    num_classes: int = 21
    stage_sizes: Sequence[int] = (2, 2, 2)
    width: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, _ = x.shape
        norm_kw = dict(use_running_average=not train, momentum=0.9)
        x = x.astype(self.dtype)
        x = nn.Conv(self.width, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="stem")(x)
        x = nn.BatchNorm(dtype=self.dtype, name="stem_bn", **norm_kw)(x)
        x = nn.relu(x)
        for i, n_blocks in enumerate(self.stage_sizes):
            for j in range(n_blocks):
                strides = (2, 2) if i > 0 and j == 0 else (1, 1)
                x = BottleneckBlock(
                    filters=self.width * 2**i,
                    strides=strides,
                    norm=lambda **kw: nn.BatchNorm(**norm_kw, **kw),
                    dtype=self.dtype,
                    name=f"stage{i + 1}_block{j + 1}",
                )(x)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                         name="classifier")(x.astype(jnp.float32))
        # bilinear upsample back to input resolution via resize matmuls
        hr = jnp.asarray(resize_matrix(logits.shape[1], h, "bilinear"))
        wr = jnp.asarray(resize_matrix(logits.shape[2], w, "bilinear"))
        t = jnp.einsum("oh,nhwc->nowc", hr, logits, precision="highest")
        return jnp.einsum("pw,nhwc->nhpc", wr, t, precision="highest")


def fcn_resnet(num_classes: int = 21) -> FCNResNet:
    return FCNResNet(num_classes=num_classes)


def init_params(model: FCNResNet, input_shape, rng=None):
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    return model.init(rng, jnp.zeros(input_shape, jnp.float32), train=False)
