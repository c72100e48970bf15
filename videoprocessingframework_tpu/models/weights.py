"""Pretrained-weight loading for the bundled models.

The reference samples run *pretrained* torchvision ResNet-50
(samples/SampleTorchResnet.py:1060-1160). Two loading paths here:

* :func:`load_torch_resnet50` — convert a torchvision-format ResNet-50
  ``state_dict`` (from ``torch.load`` of a downloaded checkpoint, or a
  live ``torchvision.models.resnet50().state_dict()``) into this
  package's Flax variable tree. NCHW→HWIO transposes for convs, running
  statistics into ``batch_stats``.
* :func:`save_checkpoint` / :func:`load_checkpoint` — orbax round trip of
  the Flax variables (models/checkpoint.py), the native format.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np


def _t(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _conv(w) -> jnp.ndarray:
    # torch conv weight OIHW → flax HWIO
    return jnp.asarray(_t(w).transpose(2, 3, 1, 0))


def load_torch_resnet50(
    state_dict: Mapping[str, object],
    num_classes: int = 1000,
    dtype=jnp.bfloat16,
) -> Dict:
    """torchvision ResNet-50 ``state_dict`` → Flax variables for
    :func:`~videoprocessingframework_tpu.models.resnet50`.

    Name mapping (torchvision → this package):
      ``conv1/bn1``             → ``stem_conv`` / ``stem_bn``
      ``layer{i}.{j}.convK/bnK``→ ``stage{i}_block{j+1}.convK/bnK``
      ``layer{i}.{j}.downsample.{0,1}`` → ``proj_conv`` / ``proj_bn``
      ``fc``                    → ``classifier``
    """
    sd = {k: v for k, v in state_dict.items()}
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def bn(dst, src):
        put(params, dst + ("scale",), jnp.asarray(_t(sd[src + ".weight"]), dtype))
        put(params, dst + ("bias",), jnp.asarray(_t(sd[src + ".bias"]), dtype))
        put(stats, dst + ("mean",),
            jnp.asarray(_t(sd[src + ".running_mean"]), jnp.float32))
        put(stats, dst + ("var",),
            jnp.asarray(_t(sd[src + ".running_var"]), jnp.float32))

    put(params, ("stem_conv", "kernel"), _conv(sd["conv1.weight"]).astype(dtype))
    bn(("stem_bn",), "bn1")

    stage_sizes = (3, 4, 6, 3)
    for i, n_blocks in enumerate(stage_sizes):
        for j in range(n_blocks):
            t_pfx = f"layer{i + 1}.{j}"
            f_blk = f"stage{i + 1}_block{j + 1}"
            for k in (1, 2, 3):
                put(
                    params, (f_blk, f"conv{k}", "kernel"),
                    _conv(sd[f"{t_pfx}.conv{k}.weight"]).astype(dtype),
                )
                bn((f_blk, f"bn{k}"), f"{t_pfx}.bn{k}")
            if f"{t_pfx}.downsample.0.weight" in sd:
                put(
                    params, (f_blk, "proj_conv", "kernel"),
                    _conv(sd[f"{t_pfx}.downsample.0.weight"]).astype(dtype),
                )
                bn((f_blk, "proj_bn"), f"{t_pfx}.downsample.1")

    fc_w = _t(sd["fc.weight"])
    if fc_w.shape[0] != num_classes:
        raise ValueError(
            f"state_dict has {fc_w.shape[0]} classes, wanted {num_classes}"
        )
    put(params, ("classifier", "kernel"), jnp.asarray(fc_w.T, jnp.float32))
    put(params, ("classifier", "bias"),
        jnp.asarray(_t(sd["fc.bias"]), jnp.float32))

    return {"params": params, "batch_stats": stats}
