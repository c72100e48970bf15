#!/usr/bin/env python
"""Multi-process network-stream decode (analog of
samples/SampleDecodeRTSP.py): one process per camera URL, each feeding
chunked Annex.B into a standalone packet decoder. Works with rtsp:// /
http:// URLs (libavformat handles the transport; pass FFmpeg options like
{'rtsp_transport': 'tcp'})."""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse
import multiprocessing as mp
import sys
import time

import numpy as np

from utils import get_logger  # noqa: E402

log = get_logger("sample_decode_rtsp")


def camera_worker(url: str, seconds: float, opts: dict, q: mp.Queue):
    import PyNvCodec as nvc

    dmx = nvc.PyFFmpegDemuxer(url, opts)
    dec = nvc.PyNvDecoder(dmx.Width(), dmx.Height(), dmx.Format(),
                          dmx.Codec(), 0)
    packet = np.ndarray(shape=(0,), dtype=np.uint8)
    pdata = nvc.PacketData()
    frames = 0
    t_end = time.time() + seconds
    while time.time() < t_end and dmx.DemuxSinglePacket(packet):
        dmx.LastPacketData(pdata)
        surf = dec.DecodeSurfaceFromPacket(pdata, packet)
        if not surf.Empty():
            frames += 1
    q.put((url, frames))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("urls", nargs="+", help="rtsp:// or file URLs")
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--tcp", action="store_true", help="force TCP transport")
    args = ap.parse_args()

    opts = {"rtsp_transport": "tcp"} if args.tcp else {}
    q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=camera_worker, args=(u, args.seconds, opts, q))
        for u in args.urls
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
    while not q.empty():
        url, frames = q.get()
        log.info("%s: %d frames in %.0fs", url, frames, args.seconds)
