#!/usr/bin/env python
"""Pure-CPU decode via PyFfmpegDecoder → raw YUV file (analog of
samples/SampleDecodeSw.py)."""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse
import sys

import numpy as np

import PyNvCodec as nvc

from utils import default_input, get_logger  # noqa: E402

log = get_logger("sample_decode_sw")

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=default_input())
    ap.add_argument("output", nargs="?", default="/tmp/out_sw.yuv")
    args = ap.parse_args()

    dec = nvc.PyFfmpegDecoder(args.input, {})
    frame = np.ndarray(shape=(0,), dtype=np.uint8)
    n = 0
    with open(args.output, "wb") as out:
        while dec.DecodeSingleFrame(frame):
            out.write(frame.tobytes())
            n += 1
    log.info("decoded %d frames (%dx%d) -> %s", n, dec.Width(), dec.Height(),
             args.output)
