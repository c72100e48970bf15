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


def test_torchvision_weight_converter_roundtrip():
    """load_torch_resnet50: a torchvision-format state_dict (synthesized
    from a live flax tree via the exact reverse mapping) converts back to
    an identical variable tree, and the model runs with it."""
    import jax
    import jax.numpy as jnp
    import torch

    from videoprocessingframework_tpu.models import init_params, resnet50
    from videoprocessingframework_tpu.models.weights import (
        load_torch_resnet50,
    )

    model = resnet50()
    variables = init_params(model, (1, 224, 224, 3))
    params, stats = variables["params"], variables["batch_stats"]

    sd = {}

    def conv_back(k):
        return torch.from_numpy(
            np.asarray(k, np.float32).transpose(3, 2, 0, 1).copy()
        )

    def bn_back(prefix, p, s):
        sd[prefix + ".weight"] = torch.from_numpy(
            np.asarray(p["scale"], np.float32).copy())
        sd[prefix + ".bias"] = torch.from_numpy(
            np.asarray(p["bias"], np.float32).copy())
        sd[prefix + ".running_mean"] = torch.from_numpy(
            np.asarray(s["mean"], np.float32).copy())
        sd[prefix + ".running_var"] = torch.from_numpy(
            np.asarray(s["var"], np.float32).copy())

    sd["conv1.weight"] = conv_back(params["stem_conv"]["kernel"])
    bn_back("bn1", params["stem_bn"], stats["stem_bn"])
    for i, n in enumerate((3, 4, 6, 3)):
        for j in range(n):
            blk = f"stage{i + 1}_block{j + 1}"
            for k in (1, 2, 3):
                sd[f"layer{i + 1}.{j}.conv{k}.weight"] = conv_back(
                    params[blk][f"conv{k}"]["kernel"])
                bn_back(f"layer{i + 1}.{j}.bn{k}", params[blk][f"bn{k}"],
                        stats[blk][f"bn{k}"])
            if "proj_conv" in params[blk]:
                sd[f"layer{i + 1}.{j}.downsample.0.weight"] = conv_back(
                    params[blk]["proj_conv"]["kernel"])
                bn_back(f"layer{i + 1}.{j}.downsample.1",
                        params[blk]["proj_bn"], stats[blk]["proj_bn"])
    sd["fc.weight"] = torch.from_numpy(
        np.asarray(params["classifier"]["kernel"], np.float32).T.copy())
    sd["fc.bias"] = torch.from_numpy(
        np.asarray(params["classifier"]["bias"], np.float32).copy())

    converted = load_torch_resnet50(sd)

    # identical tree structure and values
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = jax.tree_util.tree_leaves_with_path(converted)
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (pa, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-2, atol=1e-2, err_msg=str(pa),
        )

    x = np.random.default_rng(0).random((1, 224, 224, 3), np.float32)
    out = model.apply(converted, x, train=False)
    assert out.shape == (1, 1000) and np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("temporal", ["mean", "attention", "last"])
def test_video_classifier_forward(temporal):
    m = models.video_resnet18_like(num_classes=6, temporal=temporal)
    variables = models.init_params(m, (1, 4, 32, 32, 3))
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(
        variables, jnp.zeros((2, 4, 32, 32, 3))
    )
    assert out.shape == (2, 6)
    assert out.dtype == jnp.float32


def test_video_classifier_trains_and_backbone_tree():
    import optax

    m = models.video_resnet18_like(num_classes=4)
    variables = models.init_params(m, (1, 2, 32, 32, 3))
    # backbone param tree mirrors the image ResNet's (graftable trunk)
    img = models.resnet18_like(num_classes=4)
    img_vars = models.init_params(img, (1, 32, 32, 3))
    bb = variables["params"]["backbone"]
    for key in img_vars["params"]:
        if key == "classifier":
            continue  # embedding projection differs by design
        assert key in bb, f"backbone missing {key}"
        a = jax.tree_util.tree_map(lambda x: x.shape, img_vars["params"][key])
        b = jax.tree_util.tree_map(lambda x: x.shape, bb[key])
        assert a == b

    # one SGD step decreases loss on a tiny overfit batch
    opt = optax.sgd(0.1, momentum=0.9)
    opt_state = opt.init(variables["params"])
    x = np.random.default_rng(0).random((2, 2, 32, 32, 3)).astype(np.float32)
    y = np.array([0, 1], np.int32)

    @jax.jit
    def step(variables, opt_state):
        def loss_fn(p, bs):
            logits, new = m.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"],
            )
            l = optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()
            return l, new["batch_stats"]

        (l, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"], variables["batch_stats"]
        )
        upd, opt_state = opt.update(g, opt_state, variables["params"])
        p = optax.apply_updates(variables["params"], upd)
        return {"params": p, "batch_stats": bs}, opt_state, l

    losses = []
    for _ in range(4):
        variables, opt_state, l = step(variables, opt_state)
        losses.append(float(l))
    assert losses[-1] < losses[0]


def test_video_classifier_from_clip_loader(test_mp4):
    from videoprocessingframework_tpu.data import VideoClipLoader

    ld = VideoClipLoader(
        [test_mp4], clip_len=2, batch_size=2, out_size=(32, 32),
        output="rgb_f32", drop_last=True, workers=1,
    )
    batch = next(iter(ld.epoch(0)))
    m = models.video_resnet18_like(num_classes=3)
    variables = models.init_params(m, (1, 2, 32, 32, 3))
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(
        variables, batch
    )
    assert out.shape == (2, 3)


def test_video_vit_forward_and_grafting():
    """Factorized space-time VideoViT: forward shape, image-ViT param
    grafting into the spatial half, and a train step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from videoprocessingframework_tpu.models import (
        video_vit_tiny, vit_tiny,
    )
    from videoprocessingframework_tpu.models.vit import init_params

    m = video_vit_tiny(num_classes=5)
    x = np.random.default_rng(0).random((2, 3, 32, 32, 3)).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros_like(x), train=False)
    out = m.apply(variables, x, train=False)
    assert out.shape == (2, 5)
    assert out.dtype == jnp.float32

    # the spatial half's tree matches the image ViT minus its classifier
    img = vit_tiny(num_classes=9)
    iv = init_params(img, (1, 32, 32, 3))
    spatial = variables["params"]["spatial"]
    img_p = {k: v for k, v in iv["params"].items() if k != "classifier"}
    assert set(spatial.keys()) == set(img_p.keys())
    import flax

    grafted = flax.core.unfreeze(variables)
    grafted["params"]["spatial"] = img_p
    out2 = m.apply(grafted, x, train=False)
    assert out2.shape == (2, 5) and np.isfinite(np.asarray(out2)).all()

    # one SGD step decreases loss on a tiny overfit batch
    labels = jnp.asarray([1, 3])
    opt = optax.sgd(0.1)
    state = opt.init(variables["params"])

    def loss_fn(p):
        logits = m.apply({"params": p}, x, train=True)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()

    l0, g = jax.value_and_grad(loss_fn)(variables["params"])
    up, state = opt.update(g, state)
    p1 = optax.apply_updates(variables["params"], up)
    l1 = loss_fn(p1)
    assert float(l1) < float(l0)
