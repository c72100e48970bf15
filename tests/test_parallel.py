"""Parallel layer tests: multi-stream pipeline, mesh sharding, dp×tp train
step on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import optax

from videoprocessingframework_tpu.core.enums import (
    ColorRange,
    ColorSpace,
    PixelFormat,
)
from videoprocessingframework_tpu.models import init_params, resnet18_like
from videoprocessingframework_tpu.ops.fused import FusedPipeline
from videoprocessingframework_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    shard_batch,
)
from videoprocessingframework_tpu.parallel.streams import MultiStreamPipeline
from videoprocessingframework_tpu.parallel.train import (
    make_infer_step,
    make_train_step,
    shard_variables,
)


def test_multistream_pipeline_counts(test_mp4, gt):
    pipe = MultiStreamPipeline(
        [test_mp4, test_mp4], batch_size=8,
        postproc=FusedPipeline(
            PixelFormat.NV12, ColorSpace.BT_709, ColorRange.MPEG,
            out_size=(112, 64),
        ),
    )
    total = 0
    for batch in pipe.batches():
        arr = np.asarray(batch)
        assert arr.shape[1:] == (64, 112, 3)
        assert arr.dtype == np.uint8
        total += arr.shape[0]
    assert total == 2 * gt["num_frames"]
    assert pipe.stats.frames_decoded == total
    assert pipe.stats.fps > 0


def test_multistream_max_frames(test_mp4):
    pipe = MultiStreamPipeline(
        [test_mp4], batch_size=4, max_frames_per_stream=10,
    )
    # with no postproc, each yielded batch is the packed (B, rows, W) array
    total = sum(np.asarray(b).shape[0] for b in pipe.batches())
    assert total == 10


def test_mesh_and_batch_sharding():
    mesh = make_mesh(8, ("data", "model"), shape=(4, 2))
    assert mesh.shape == {"data": 4, "model": 2}
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    sharded = shard_batch({"x": x}, mesh)["x"]
    assert sharded.sharding == batch_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(sharded), x)


def test_dp_tp_train_step_runs_and_improves():
    mesh = make_mesh(8, ("data", "model"), shape=(4, 2))
    model = resnet18_like(num_classes=4)
    variables = shard_variables(mesh, init_params(model, (2, 32, 32, 3)))
    opt = optax.sgd(0.05, momentum=0.9)
    opt_state = opt.init(variables["params"])
    step = make_train_step(model, mesh, opt)

    rng = np.random.default_rng(0)
    # learnable toy task: label = quadrant brightness
    images = rng.random((16, 32, 32, 3)).astype(np.float32)
    labels = rng.integers(0, 4, (16,))
    batch = shard_batch(
        {"image": images[:8], "label": labels[:8].astype(np.int32)}, mesh
    )
    losses = []
    for _ in range(3):
        variables, opt_state, metrics = step(variables, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # optimizer is actually stepping

    infer = make_infer_step(model, mesh)
    logits = infer(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        batch["image"],
    )
    assert logits.shape == (8, 4)


def test_tp_sharding_applied():
    mesh = make_mesh(8, ("data", "model"), shape=(4, 2))
    model = resnet18_like(num_classes=8)
    variables = shard_variables(mesh, init_params(model, (1, 32, 32, 3)))
    kernel = variables["params"]["classifier"]["kernel"]
    # classifier kernel (cin, num_classes) is sharded over 'model'
    spec = kernel.sharding.spec
    assert tuple(spec)[-1] == "model"


def test_multistream_gated_mode(test_mp4, gt):
    """Explicit gated-alternation threading policy (few-core hosts)."""
    pipe = MultiStreamPipeline(
        [test_mp4, test_mp4], batch_size=8, serial=False, gate_decode=True,
    )
    total = sum(np.asarray(b).shape[0] for b in pipe.batches())
    assert total == 2 * gt["num_frames"]


def test_multistream_overlapped_mode(test_mp4, gt):
    """Explicit fully-overlapped policy (many-core hosts)."""
    pipe = MultiStreamPipeline(
        [test_mp4], batch_size=8, serial=False, gate_decode=False, inflight=2,
    )
    total = sum(np.asarray(b).shape[0] for b in pipe.batches())
    assert total == gt["num_frames"]


# ---- multi-device VIDEO pipeline (VERDICT r1 item 2) -----------------------


def _packed420(n, h, w, seed=0):
    r = np.random.default_rng(seed)
    y = r.integers(0, 256, (n, h, w), np.uint8)
    u = r.integers(0, 256, (n, h // 2, w // 2), np.uint8)
    v = r.integers(0, 256, (n, h // 2, w // 2), np.uint8)
    return np.concatenate(
        [y.reshape(n, -1), u.reshape(n, -1), v.reshape(n, -1)], 1
    ).reshape(n, h * 3 // 2, w)


def test_sharded_video_pipeline_bit_exact():
    """One packed batch sharded over all 8 devices must produce BIT-EXACT
    results vs the single-device fused path (per-frame math; XLA inserts
    no collectives)."""
    from videoprocessingframework_tpu.parallel.multidevice import (
        ShardedVideoPipeline,
        sharded_batch_matches_single_device,
    )

    post = FusedPipeline(
        PixelFormat.YUV420, ColorSpace.BT_709, ColorRange.MPEG,
        out_size=(64, 32),
    )
    ndev = len(jax.devices())
    packed = _packed420(2 * ndev, 64, 96)
    assert sharded_batch_matches_single_device(post, packed)
    pipe = ShardedVideoPipeline(post)
    out = pipe(packed)
    # output really is sharded over all devices
    assert len(out.sharding.device_set) == ndev
    with pytest.raises(ValueError):
        pipe(packed[: ndev + 1])


def test_multidevice_stream_pipeline(test_mp4, gt):
    """Round-robin stream fan-out across all devices: full frame count,
    outputs identical to the single-device pipeline."""
    from videoprocessingframework_tpu.parallel.multidevice import (
        MultiDeviceStreamPipeline,
    )

    post = FusedPipeline(
        PixelFormat.YUV420, ColorSpace.BT_709, ColorRange.MPEG,
        out_size=(64, 32),
    )
    pipe = MultiDeviceStreamPipeline(
        [test_mp4], post, batch_size=8,
    )
    outs = [np.asarray(o) for o in pipe.batches()]
    pipe.close()
    total = sum(o.shape[0] for o in outs)
    assert total == gt["num_frames"]

    # same frames through the single-device pool path, same bytes
    from videoprocessingframework_tpu.io import NativeDecodePool

    ref_pool = NativeDecodePool(
        [test_mp4], batch_size=8, out_format=PixelFormat.YUV420
    )
    ref = [np.asarray(o) for o in ref_pool.batches(post)]
    ref_pool.close()
    np.testing.assert_array_equal(
        np.concatenate(outs), np.concatenate(ref)
    )


def test_multihost_video_pipeline_single_process(test_mp4, gt):
    """MultiHostVideoPipeline on the single-process 8-device CPU mesh:
    globally-sharded output, bit-identical to the single-device path,
    ragged tail dropped for SPMD lockstep."""
    from videoprocessingframework_tpu.parallel.multihost import (
        MultiHostVideoPipeline,
    )

    post = FusedPipeline(
        PixelFormat.YUV420, ColorSpace.BT_709, ColorRange.MPEG,
        out_size=(64, 32), kernel="xla",
    )
    pipe = MultiHostVideoPipeline([test_mp4], post, batch_size_per_host=8)
    outs = [np.asarray(o) for o in pipe.batches()]
    pipe.close()
    full_batches = gt["num_frames"] // 8
    assert len(outs) == full_batches  # ragged tail dropped
    assert pipe.frames_local == full_batches * 8

    from videoprocessingframework_tpu.io import NativeDecodePool

    ref_pool = NativeDecodePool(
        [test_mp4], batch_size=8, out_format=PixelFormat.YUV420
    )
    ref = []
    for o in ref_pool.batches(post):
        a = np.asarray(o)
        if a.shape[0] == 8:
            ref.append(a)
    ref_pool.close()
    np.testing.assert_array_equal(np.concatenate(outs), np.concatenate(ref))


def test_encode_feed_sharded_matches_single_device():
    """Outbound fused encoder feed sharded over the data mesh must be
    bit-identical to the single-device result (per-frame math, no
    collectives)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from videoprocessingframework_tpu.ops.fused import encode_feed

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, ("data",))
    r = np.random.default_rng(17)
    rgb = r.integers(0, 256, (2 * n_dev, 48, 64, 3), np.uint8)

    single = tuple(
        np.asarray(p) for p in encode_feed(rgb, out_h=24, out_w=32)
    )
    rgb_sharded = jax.device_put(rgb, NamedSharding(mesh, P("data")))
    sharded = encode_feed(rgb_sharded, out_h=24, out_w=32)
    assert len(sharded[0].sharding.device_set) == n_dev
    for s, g in zip(sharded, single):
        np.testing.assert_array_equal(np.asarray(s), g)


def test_train_step_soft_labels_and_statless_model():
    """make_train_step generalizations: soft [B, C] targets (MixUp/
    CutMix output) and stat-less models (VideoViT — no batch_stats)."""
    import jax

    from videoprocessingframework_tpu.models import video_vit_tiny
    from videoprocessingframework_tpu.ops.augment import mixup_cutmix

    mesh = make_mesh(4, ("data", "model"), shape=(2, 2))
    model = video_vit_tiny(num_classes=4)
    variables = shard_variables(
        mesh,
        model.init(jax.random.PRNGKey(0),
                   np.zeros((1, 2, 32, 32, 3), np.float32), train=False),
    )
    assert "batch_stats" not in variables
    # adam at a small lr: 3 SGD steps on a fresh transformer can
    # overshoot (observed), which isn't what this test is about
    opt = optax.adam(1e-3)
    opt_state = opt.init(variables["params"])
    step = make_train_step(model, mesh, opt)

    rng = np.random.default_rng(0)
    x = rng.random((4, 2, 32, 32, 3)).astype(np.float32)
    labels = np.arange(4, dtype=np.int32)
    mixed, soft = mixup_cutmix(
        x, labels, jax.random.PRNGKey(1), num_classes=4
    )
    batch = shard_batch(
        {"image": np.asarray(mixed), "label": np.asarray(soft)}, mesh
    )
    losses = []
    for _ in range(15):  # fresh transformers bump before converging
        variables, opt_state, metrics = step(variables, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert "batch_stats" not in variables
