#!/usr/bin/env python
"""Flow-based video stabilization (ops/stabilize.py).

Beyond-parity demo of the full device arc: host decode → batched dense
flow (pyramidal LK, one jitted program for ALL frame pairs) → robust
global trajectory → Gaussian-smoothed camera path → per-frame warp on
device. Reports the residual frame-to-frame shake before and after.
"""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse

import numpy as np

from utils import default_input, get_logger  # noqa: E402

log = get_logger("sample_stabilize")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=default_input())
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--sigma", type=float, default=5.0,
                    help="camera-path smoothing, in frames")
    ap.add_argument("--jitter", type=float, default=0.0,
                    help="inject synthetic shake of this amplitude (px) "
                         "before stabilizing — demo mode for smooth "
                         "source footage")
    ap.add_argument("--out", help="write stabilized luma as raw .y file")
    args = ap.parse_args()

    from videoprocessingframework_tpu.core.enums import PixelFormat
    from videoprocessingframework_tpu.io.decoder import VideoReader
    from videoprocessingframework_tpu.ops.stabilize import (
        global_translations,
        stabilize_clip,
    )

    reader = VideoReader(args.input)
    reader.decoder.output_format = PixelFormat.YUV420
    h, w = reader.height(), reader.width()
    buf = np.empty((h * 3 // 2, w), np.uint8)
    frames = []
    while len(frames) < args.frames and reader.decode(out=buf) is not None:
        frames.append(buf[:h].copy())
    if len(frames) < 3:
        log.error("need at least 3 frames, decoded %d", len(frames))
        return 1
    clip = np.stack(frames)

    if args.jitter > 0:
        rng = np.random.default_rng(0)
        m = int(np.ceil(args.jitter)) + 1
        jit = rng.integers(-m + 1, m, (len(clip), 2))
        jit[0] = 0
        clip = np.stack([
            np.roll(np.roll(f, jy, axis=0), jx, axis=1)
            for f, (jx, jy) in zip(clip, jit)
        ])
        log.info("injected synthetic jitter ±%d px", m - 1)

    out, corr = stabilize_clip(clip, sigma=args.sigma)
    raw = np.abs(np.asarray(global_translations(clip))).mean()
    res = np.abs(np.asarray(global_translations(out))).mean()
    log.info("%d frames %dx%d: mean |frame-to-frame motion| %.2f px → "
             "%.2f px after stabilization (sigma=%.1f, max correction "
             "%.1f px)", len(clip), w, h, raw, res, args.sigma,
             float(np.abs(corr).max()))
    if args.out:
        with open(args.out, "wb") as fh:
            fh.write(out.astype(np.uint8).tobytes())
        log.info("wrote %s (%d raw luma frames)", args.out, len(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
