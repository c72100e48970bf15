"""Bundled model family tests (ResNet / FCN segmentation / ViT)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from videoprocessingframework_tpu import models


def test_resnet50_forward_shape():
    m = models.resnet50(num_classes=10)
    variables = models.init_params(m, (1, 64, 64, 3))
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(
        variables, jnp.zeros((2, 64, 64, 3))
    )
    assert out.shape == (2, 10)
    assert out.dtype == jnp.float32


def test_fcn_segmentation_shapes():
    from videoprocessingframework_tpu.models import segmentation

    m = models.fcn_resnet(num_classes=5)
    variables = segmentation.init_params(m, (1, 64, 96, 3))
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(
        variables, jnp.zeros((2, 64, 96, 3))
    )
    assert out.shape == (2, 64, 96, 5)  # per-pixel logits at input res


def test_vit_forward():
    from videoprocessingframework_tpu.models import vit

    m = models.vit_tiny(num_classes=7)
    variables = vit.init_params(m, (1, 32, 32, 3))
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(
        variables, jnp.zeros((2, 32, 32, 3))
    )
    assert out.shape == (2, 7)
    assert np.isfinite(np.asarray(out)).all()


def test_checkpoint_roundtrip(tmp_path):
    from videoprocessingframework_tpu.models import checkpoint

    m = models.resnet18_like(num_classes=3)
    variables = models.init_params(m, (1, 32, 32, 3))
    path = str(tmp_path / "ckpt")
    checkpoint.save_checkpoint(path, variables)
    restored = checkpoint.load_checkpoint(path)
    a = jax.tree_util.tree_leaves(variables)
    b = jax.tree_util.tree_leaves(restored)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
