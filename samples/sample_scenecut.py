#!/usr/bin/env python
"""Shot-boundary detection over a video file (ops/scenecut.py).

Beyond-parity demo: host decode feeds batched luma windows to the
device scorer (SSIM + soft-histogram distance in one jitted program);
a robust median+MAD threshold turns scores into shot spans. Useful as
the segmentation step in front of the clip-sampling training loaders.
"""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse

import numpy as np

from utils import default_input, get_logger  # noqa: E402

log = get_logger("sample_scenecut")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=default_input())
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--min-score", type=float, default=0.18)
    args = ap.parse_args()

    from videoprocessingframework_tpu.ops.scenecut import segment_shots

    shots = segment_shots(
        args.input, batch=args.batch, max_frames=args.frames,
        min_score=args.min_score,
    )
    if not shots:
        log.error("no frames decoded")
        return 1
    log.info("%s: %d frame(s) → %d shot(s)", args.input, shots[-1][1],
             len(shots))
    for i, (s, e) in enumerate(shots):
        log.info("  shot %d: frames [%d, %d) — %d frames", i, s, e, e - s)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
