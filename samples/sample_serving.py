#!/usr/bin/env python
"""Dynamic-batching inference serving: decoded frames submitted from
concurrent client threads, batched server-side into padded static-shape
buckets, one fused preprocess+ResNet program per batch.

Beyond-parity: the reference's samples loop one frame at a time through
pybind calls; this is the deployment-shaped layer (submit → Future,
dynamic batching, p50/p99 latency stats)."""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse
import threading
import time

import numpy as np

from utils import default_input, get_logger  # noqa: E402

log = get_logger("sample_serving")

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=default_input())
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--wait-ms", type=float, default=5.0)
    args = ap.parse_args()

    import jax

    from videoprocessingframework_tpu.core.enums import (
        ColorRange,
        ColorSpace,
        PixelFormat,
    )
    from videoprocessingframework_tpu.io.decoder import VideoReader
    from videoprocessingframework_tpu.models import init_params, resnet18_like
    from videoprocessingframework_tpu.ops.fused import decode_postproc
    from videoprocessingframework_tpu.serving import InferenceServer

    rd = VideoReader(args.input)
    rd.decoder.output_format = PixelFormat.YUV420
    h, w = rd.height(), rd.width()
    space, rng_ = rd.color_space(), rd.color_range()
    if space == ColorSpace.UNSPEC:
        space = ColorSpace.BT_601
    if rng_ == ColorRange.UDEF:
        rng_ = ColorRange.MPEG
    frames = []
    for f in rd.frames():
        frames.append(f.data.reshape(h * 3 // 2, w).copy())
        if len(frames) >= args.frames:
            break
    log.info("decoded %d frames %dx%d", len(frames), w, h)

    model = resnet18_like(num_classes=10)
    variables = init_params(model, (1, 64, 64, 3))

    @jax.jit
    def serve_fn(packed):
        x = decode_postproc(
            packed,
            src_format=PixelFormat.YUV420,
            space=space, rng=rng_,
            out_h=64, out_w=64, output="rgb_f32",
        )
        return model.apply(variables, x, train=False)

    with InferenceServer(
        serve_fn, (h * 3 // 2, w), max_batch=args.max_batch,
        max_wait_ms=args.wait_ms,
    ) as srv:
        srv.warmup()
        log.info("server warm (%s buckets compiled)", srv.buckets)

        per = (len(frames) + args.clients - 1) // args.clients
        t0 = time.perf_counter()

        def client(cid):
            for i in range(cid * per, min((cid + 1) * per, len(frames))):
                srv.infer(frames[i], timeout=120)

        threads = [
            threading.Thread(target=client, args=(c,))
            for c in range(args.clients)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        snap = srv.snapshot()
    log.info(
        "served %d requests from %d clients in %.2fs (%.1f qps) — "
        "%d batches (mean %.1f), p50 %.1f ms p99 %.1f ms",
        snap["requests"], args.clients, dt, snap["requests"] / dt,
        snap["batches"], snap["mean_batch"],
        snap.get("latency_ms_p50", -1), snap.get("latency_ms_p99", -1),
    )
