#!/usr/bin/env python
"""Decode → convert → on-screen display via OpenCV (analog of
samples/SampleOpenGL.py and the cv2 display in
SampleTorchSegmentation.py; CUDA-GL interop has no TPU analog, so frames
are downloaded and shown with cv2). Skips gracefully without a DISPLAY."""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse
import os
import sys

import numpy as np

import PyNvCodec as nvc

from utils import default_input, get_logger  # noqa: E402

log = get_logger("sample_display")

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=default_input())
    ap.add_argument("--frames", type=int, default=96)
    args = ap.parse_args()

    if not os.environ.get("DISPLAY"):
        log.warning("no DISPLAY — decoding without showing")
    try:
        import cv2
    except ImportError:
        log.error("cv2 not available")
        sys.exit(1)

    dec = nvc.PyNvDecoder(args.input, 0)
    w, h = dec.Width(), dec.Height()
    cc = nvc.ColorspaceConversionContext(dec.ColorSpace(), dec.ColorRange())
    to_bgr = nvc.PySurfaceConverter(
        w, h, nvc.PixelFormat.NV12, nvc.PixelFormat.BGR, 0
    )
    down = nvc.PySurfaceDownloader(w, h, nvc.PixelFormat.BGR, 0)
    frame = np.ndarray(shape=(0,), dtype=np.uint8)
    shown = 0
    for _ in range(args.frames):
        surf = dec.DecodeSingleSurface()
        if surf.Empty():
            break
        bgr = to_bgr.Execute(surf, cc)
        if bgr.Empty() or not down.DownloadSingleSurface(bgr, frame):
            continue
        img = frame.reshape(h, w, 3)
        if os.environ.get("DISPLAY"):
            cv2.imshow("vpf-tpu", img)
            if cv2.waitKey(1) & 0xFF == ord("q"):
                break
        shown += 1
    log.info("processed %d frames", shown)
