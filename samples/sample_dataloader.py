#!/usr/bin/env python
"""Training data loader: shuffled clip sampling over a video corpus,
decoded + fused-preprocessed into [B, T, H, W, C] device batches.

Beyond-parity vs the reference (its ML samples decode one stream
sequentially, samples/SampleTorchResnet.py:1095-1151): this is the
DALI-shaped layer a training job actually consumes — deterministic
per-epoch shuffling, frame-accurate seeks, worker-thread decode, and
optional mesh-sharded placement for data-parallel steps."""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse
import time

import numpy as np

from videoprocessingframework_tpu.data import VideoClipLoader

from utils import default_input, get_logger  # noqa: E402

log = get_logger("sample_dataloader")

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="*", default=None)
    ap.add_argument("--clip-len", type=int, default=8)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--workers", type=int, default=0)
    ap.add_argument("--sharded", action="store_true",
                    help="place batches sharded over a data mesh")
    ap.add_argument("--mjpeg", action="store_true",
                    help="MJPEG corpus via the split codec "
                    "(host entropy decode, device pixel path); with no "
                    "inputs a synthetic MJPEG clip is written")
    args = ap.parse_args()
    sources = args.inputs or [default_input()]

    sharding = None
    if args.sharded:
        import jax

        from videoprocessingframework_tpu.parallel import make_mesh
        from videoprocessingframework_tpu.parallel.mesh import batch_sharding

        n = len(jax.devices())
        mesh = make_mesh(n, ("data",))
        sharding = batch_sharding(mesh)
        log.info("sharding batches over %d devices", n)

    cls = VideoClipLoader
    if args.mjpeg:
        from videoprocessingframework_tpu.data import MjpegClipLoader

        cls = MjpegClipLoader
        if not args.inputs:
            import tempfile

            import numpy as np

            from videoprocessingframework_tpu.io import MjpegWriter

            w, h, n = 640, 360, 48
            path = _pathlib.Path(tempfile.mkdtemp()) / "synth.avi"
            rng = np.random.default_rng(0)
            with MjpegWriter(str(path), w, h, container="avi") as wr:
                y = rng.integers(0, 256, (n, h, w), np.uint8)
                u = np.full((n, h // 2, w // 2), 110, np.uint8)
                v = np.full((n, h // 2, w // 2), 140, np.uint8)
                wr.write_planes(y, u, v)
            sources = [str(path)]
            log.info("synthesized MJPEG corpus: %s", path)

    loader = cls(
        sources,
        clip_len=args.clip_len,
        frame_stride=args.stride,
        batch_size=args.batch,
        out_size=(args.size, args.size),
        output="normalized",
        workers=args.workers,
        drop_last=args.sharded,  # sharded batches must stay full
        sharding=sharding,
        seed=0,
    )
    log.info(
        "corpus: %d file(s) %dx%d, %d clips/epoch, %d batches/epoch",
        len(loader.corpus), loader.corpus.width, loader.corpus.height,
        loader.clips_per_epoch, len(loader),
    )
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        frames = 0
        for batch in loader.epoch(epoch):
            arr = batch  # [B, T, H, W, C] on device
            frames += int(np.prod(arr.shape[:2]))
        dt = time.perf_counter() - t0
        log.info(
            "epoch %d: %d frames as %s batches in %.2fs (%.1f frames/s)",
            epoch, frames, tuple(batch.shape), dt, frames / dt,
        )
