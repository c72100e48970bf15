#!/usr/bin/env python
"""Thread-per-stream encode (analog of samples/SampleEncodeMultiThread.py).
Each thread owns one encoder session; the native encode calls run GIL-free
so N sessions scale across host cores."""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse
import sys
import threading
import time

import numpy as np

import PyNvCodec as nvc

from utils import get_logger  # noqa: E402

log = get_logger("sample_encode_multi_thread")


def worker(wid, width, height, frames, results):
    enc = nvc.PyNvEncoder(
        {"codec": "h264", "preset": "P1", "s": f"{width}x{height}",
         "bitrate": "2M"},
        0,
    )
    rng = np.random.default_rng(wid)
    packet = np.ndarray(shape=(0,), dtype=np.uint8)
    n = 0
    for i in range(frames):
        frame = rng.integers(0, 255, (width * height * 3 // 2,), dtype=np.uint8)
        if enc.EncodeSingleFrame(frame, packet):
            n += 1
    while enc.FlushSinglePacket(packet):
        n += 1
    results[wid] = n


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", type=int, default=2)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--size", default="320x240")
    args = ap.parse_args()
    w, h = map(int, args.size.split("x"))
    results = {}
    t0 = time.perf_counter()
    threads = [
        threading.Thread(target=worker, args=(i, w, h, args.frames, results))
        for i in range(args.threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    total = sum(results.values())
    log.info("%d threads encoded %d packets in %.2fs (%.1f fps aggregate)",
             args.threads, total, dt, args.threads * args.frames / dt)
