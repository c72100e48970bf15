#!/usr/bin/env python
"""Dense optical flow + motion-compensated frame interpolation on TPU.

Beyond-parity demo (the reference stops at exporting codec motion
vectors, samples/SampleDecodeSw.py + PyFfmpegDecoder.GetMotionVectors):
decode frames on the host, compute dense pyramidal Lucas-Kanade flow
between consecutive luma frames ON DEVICE (ops/flow.py, one jitted
program), synthesize each temporal midpoint, and score it against the
real middle frame (frame-rate-upconversion quality) and against the
zero-motion baseline (frame repeat).

Optionally (--mv) also densifies the decoder's own motion vectors via
mv_to_dense_flow and reports how the codec's block field compares.
"""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse

import numpy as np

from utils import default_input, get_logger  # noqa: E402

log = get_logger("sample_flow_interp")


def psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=default_input())
    ap.add_argument("--triplets", type=int, default=4,
                    help="number of (prev, mid, next) frame triplets")
    ap.add_argument("--levels", type=int, default=3)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--mv", action="store_true",
                    help="also densify decoder motion vectors")
    args = ap.parse_args()

    from videoprocessingframework_tpu.core.enums import PixelFormat
    from videoprocessingframework_tpu.io.decoder import VideoReader
    from videoprocessingframework_tpu.ops.flow import (
        interpolate_midpoint,
        lucas_kanade_flow,
        mv_to_dense_flow,
    )

    reader = VideoReader(args.input, export_mvs=args.mv)
    reader.decoder.output_format = PixelFormat.YUV420
    w, h = reader.width(), reader.height()
    buf = np.empty((h * 3 // 2, w), np.uint8)

    def next_luma():
        if reader.decode(out=buf) is None:
            return None
        return buf[:h].copy()

    log.info("input: %s (%dx%d), %d triplet(s), levels=%d iters=%d",
             args.input, w, h, args.triplets, args.levels, args.iters)

    gains, synth_psnrs = [], []
    frames = [next_luma(), next_luma(), next_luma()]
    t = 0
    while all(f is not None for f in frames) and t < args.triplets:
        prev, mid, nxt = frames
        flow = np.asarray(lucas_kanade_flow(
            prev[None], nxt[None], levels=args.levels, iters=args.iters))
        synth = np.asarray(interpolate_midpoint(
            prev[None], nxt[None], levels=args.levels, iters=args.iters))[0]
        p_synth = psnr(synth, mid)
        p_repeat = psnr(prev, mid)  # zero-motion baseline
        mag = float(np.median(np.hypot(flow[..., 0], flow[..., 1])))
        log.info("triplet %d: median |flow| %.2f px — midpoint PSNR "
                 "%.2f dB vs frame-repeat %.2f dB (%+.2f dB)",
                 t, mag, p_synth, p_repeat, p_synth - p_repeat)
        synth_psnrs.append(p_synth)
        gains.append(p_synth - p_repeat)
        if args.mv:
            mvs = reader.motion_vectors()
            dense = mv_to_dense_flow(mvs, w, h)
            nz = float(np.mean(np.any(dense != 0, axis=-1)))
            log.info("  codec MVs: %d vectors, %.0f%% coverage",
                     0 if mvs is None else len(mvs), 100 * nz)
        frames = [frames[1], frames[2], next_luma()]
        t += 1

    if not synth_psnrs:
        log.error("no frame triplets decoded")
        return 1
    log.info("interpolated %d midpoint(s): mean PSNR %.2f dB, mean gain "
             "over frame-repeat %+.2f dB", len(synth_psnrs),
             float(np.mean(synth_psnrs)), float(np.mean(gains)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
