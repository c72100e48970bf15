"""Dynamic-batching inference server: correctness vs direct calls under
concurrent submitters, bucket padding (no recompiles), exception
propagation, stats, and the decode→preprocess→model serving
composition."""

import threading

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from videoprocessingframework_tpu.serving import InferenceServer

SHAPE = (8, 12, 3)


def _model():
    """A tiny deterministic 'model': per-item checksum map."""
    w = jnp.asarray(
        np.random.default_rng(0).random((np.prod(SHAPE), 16), np.float32)
    )

    @jax.jit
    def fn(batch):
        x = batch.reshape(batch.shape[0], -1).astype(jnp.float32)
        return x @ w

    return fn


def test_serving_matches_direct_and_batches():
    fn = _model()
    items = [
        np.random.default_rng(i).integers(0, 256, SHAPE, np.uint8)
        for i in range(23)
    ]
    want = np.asarray(fn(np.stack(items)))
    with InferenceServer(fn, SHAPE, max_batch=8, max_wait_ms=20.0) as srv:
        srv.warmup()
        futs = srv.submit_many(items)
        got = np.stack([np.asarray(f.result(timeout=60)) for f in futs])
    assert np.allclose(got, want, atol=1e-5)
    snap = srv.snapshot()
    assert snap["requests"] == 23
    # batching actually happened (23 requests in far fewer batches)
    assert snap["batches"] < 23
    assert "latency_ms_p50" in snap
    # split stats: queue wait + dispatch decompose the E2E latency
    # (queue wait is where max_wait_ms batching delay shows up; dispatch
    # is staging+upload+compute+materialize). Each part is bounded by
    # the end-to-end number it decomposes.
    assert "queue_wait_ms_p50" in snap and "dispatch_ms_p50" in snap
    assert snap["queue_wait_ms_p50"] <= snap["latency_ms_p99"] + 1e-6
    assert snap["dispatch_ms_p50"] <= snap["latency_ms_p99"] + 1e-6
    assert snap["queue_wait_ms_p99"] >= 0.0
    assert snap["dispatch_ms_p99"] > 0.0  # compute is never free


def test_serving_concurrent_submitters():
    fn = _model()
    rng = np.random.default_rng(7)
    items = [rng.integers(0, 256, SHAPE, np.uint8) for _ in range(40)]
    want = np.asarray(fn(np.stack(items)))
    results: dict = {}
    with InferenceServer(fn, SHAPE, max_batch=16, max_wait_ms=5.0) as srv:
        srv.warmup()

        def client(lo, hi):
            for i in range(lo, hi):
                results[i] = np.asarray(srv.infer(items[i], timeout=60))

        threads = [
            threading.Thread(target=client, args=(i * 10, (i + 1) * 10))
            for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    got = np.stack([results[i] for i in range(40)])
    assert np.allclose(got, want, atol=1e-5)


def test_serving_validation_and_errors():
    fn = _model()
    with InferenceServer(fn, SHAPE, max_batch=4) as srv:
        with pytest.raises(ValueError, match="item shape"):
            srv.submit(np.zeros((3, 3), np.uint8))

    calls = {"n": 0}

    def broken(batch):
        calls["n"] += 1
        raise RuntimeError("boom")

    with InferenceServer(broken, SHAPE, max_batch=4) as srv:
        fut = srv.submit(np.zeros(SHAPE, np.uint8))
        with pytest.raises(RuntimeError, match="boom"):
            fut.result(timeout=30)
    with pytest.raises(RuntimeError, match="closed"):
        srv.submit(np.zeros(SHAPE, np.uint8))


def test_serving_tuple_outputs_and_buckets():
    @jax.jit
    def fn(batch):
        x = batch.astype(jnp.float32)
        return x.sum(axis=(1, 2, 3)), x.reshape(x.shape[0], -1)[:, :4]

    with InferenceServer(
        fn, SHAPE, buckets=[2, 4], max_wait_ms=0.0
    ) as srv:
        a = np.full(SHAPE, 2, np.uint8)
        s, head = srv.infer(a, timeout=60)
        assert float(s) == 2.0 * np.prod(SHAPE)
        assert np.asarray(head).shape == (4,)


def test_serving_video_pipeline_composition(test_mp4):
    """decode → fused preprocess → model as ONE served function."""
    from videoprocessingframework_tpu.core.enums import (
        ColorRange,
        ColorSpace,
        PixelFormat,
    )
    from videoprocessingframework_tpu.io.decoder import VideoReader
    from videoprocessingframework_tpu.models import (
        init_params,
        resnet18_like,
    )
    from videoprocessingframework_tpu.ops.fused import decode_postproc

    model = resnet18_like(num_classes=5)
    variables = init_params(model, (1, 32, 32, 3))

    @jax.jit
    def serve_fn(packed):
        x = decode_postproc(
            packed,
            src_format=PixelFormat.YUV420,
            space=ColorSpace.BT_709,
            rng=ColorRange.MPEG,
            out_h=32, out_w=32, output="rgb_f32",
        )
        return model.apply(variables, x, train=False)

    rd = VideoReader(test_mp4)
    rd.decoder.output_format = PixelFormat.YUV420
    h, w = 464, 848
    frames = []
    for f in rd.frames():
        frames.append(f.data.reshape(h * 3 // 2, w).copy())
        if len(frames) == 6:
            break

    want = np.asarray(serve_fn(np.stack(frames)))
    with InferenceServer(
        serve_fn, (h * 3 // 2, w), max_batch=4, max_wait_ms=10.0
    ) as srv:
        futs = srv.submit_many(frames)
        got = np.stack([np.asarray(f.result(timeout=120)) for f in futs])
    assert np.allclose(got, want, atol=1e-4)


def test_serving_sharded_infer_fn():
    """Mesh-sharded infer_fn: buckets are multiples of the data axis."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from videoprocessingframework_tpu.parallel import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs the multi-device CPU mesh")
    mesh = make_mesh(4, ("data",))
    sharding = NamedSharding(mesh, P("data"))

    @jax.jit
    def fn(batch):
        x = jax.device_put(batch, sharding)
        return x.astype(jnp.float32).sum(axis=(1, 2, 3))

    items = [np.full(SHAPE, i, np.uint8) for i in range(10)]
    with InferenceServer(
        fn, SHAPE, buckets=[4, 8], max_wait_ms=10.0
    ) as srv:
        srv.warmup()
        futs = srv.submit_many(items)
        got = [float(f.result(timeout=60)) for f in futs]
    want = [float(i) * np.prod(SHAPE) for i in range(10)]
    assert got == want


def test_serving_backpressure():
    import time

    release = threading.Event()

    def slow(batch):
        release.wait(timeout=30)
        return batch.astype(jnp.float32).sum(axis=(1, 2, 3))

    srv = InferenceServer(slow, SHAPE, buckets=[1], max_wait_ms=0.0,
                          max_queue=2)
    try:
        futs = [srv.submit(np.zeros(SHAPE, np.uint8))]
        time.sleep(0.2)  # worker picks up the first, blocks in slow()
        futs += [srv.submit(np.zeros(SHAPE, np.uint8)) for _ in range(2)]
        with pytest.raises(RuntimeError, match="queue full"):
            srv.submit(np.zeros(SHAPE, np.uint8))
        release.set()
        for f in futs:
            f.result(timeout=30)
    finally:
        release.set()
        srv.close()
