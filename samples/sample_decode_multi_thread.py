#!/usr/bin/env python
"""Parallel multi-stream decode with batched device post-processing
(analog of samples/SampleDecodeMultiThread.py — thread-per-stream with a
CUDA stream each becomes decode workers feeding ONE fused batched TPU
kernel; see videoprocessingframework_tpu/parallel/streams.py)."""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse
import sys

import PyNvCodec as nvc
from videoprocessingframework_tpu.ops.fused import FusedPipeline
from videoprocessingframework_tpu.parallel.streams import MultiStreamPipeline

from utils import default_input, get_logger  # noqa: E402

log = get_logger("sample_decode_multi_thread")

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=default_input())
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--width", type=int, default=424)
    ap.add_argument("--height", type=int, default=232)
    args = ap.parse_args()

    probe = nvc.PyFFmpegDemuxer(args.input)
    pipe = MultiStreamPipeline(
        [args.input] * args.streams,
        batch_size=args.batch,
        postproc=FusedPipeline(
            probe.Format(),
            probe.ColorSpace(),
            probe.ColorRange(),
            out_size=(args.width, args.height),
            output="rgb_u8",
        ),
    )
    stats = pipe.run()
    log.info(
        "%d streams: %d frames in %.2fs = %.1f aggregate fps",
        args.streams, stats.frames_decoded, stats.wall_s, stats.fps,
    )
