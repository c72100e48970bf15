#!/usr/bin/env python
"""Compiled batched inference serving path (analog of
samples/SampleTensorRTResnet.py — TensorRT engine building maps to XLA
ahead-of-time compilation under jit; the multi-stream pipeline feeds the
compiled model)."""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse
import sys
import time

import jax
import numpy as np

import PyNvCodec as nvc
from videoprocessingframework_tpu.models import init_params, resnet50
from videoprocessingframework_tpu.ops.fused import FusedPipeline
from videoprocessingframework_tpu.parallel.streams import MultiStreamPipeline

from utils import default_input, get_logger  # noqa: E402

log = get_logger("sample_batch_inference")

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=default_input())
    ap.add_argument("--streams", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    probe = nvc.PyFFmpegDemuxer(args.input)
    model = resnet50()
    variables = init_params(model, (1, 224, 224, 3))
    infer = jax.jit(lambda v, x: model.apply(v, x, train=False))

    pre = FusedPipeline(
        probe.Format(), probe.ColorSpace(), probe.ColorRange(),
        out_size=(224, 224), output="normalized",
    )
    pipe = MultiStreamPipeline(
        [args.input] * args.streams, batch_size=args.batch, postproc=pre,
    )
    t0 = time.perf_counter()
    n = 0
    for batch in pipe.batches():
        logits = infer(variables, batch)
        n += int(batch.shape[0])
    dt = time.perf_counter() - t0
    log.info("classified %d frames end-to-end in %.2fs (%.1f fps)", n, dt, n / dt)
