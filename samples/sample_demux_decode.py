#!/usr/bin/env python
"""Standalone demuxer + packet-fed decoder with packet metadata (analog of
samples/SampleDemuxDecode.py — the pycuda ctx/stream there maps to plain
device placement here)."""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse
import sys

import numpy as np

import PyNvCodec as nvc

from utils import default_input, get_logger  # noqa: E402

log = get_logger("sample_demux_decode")

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=default_input())
    args = ap.parse_args()

    dmx = nvc.PyFFmpegDemuxer(args.input)
    dec = nvc.PyNvDecoder(dmx.Width(), dmx.Height(), dmx.Format(),
                          dmx.Codec(), 0)
    packet = np.ndarray(shape=(0,), dtype=np.uint8)
    pdata = nvc.PacketData()
    n = 0
    while dmx.DemuxSinglePacket(packet):
        dmx.LastPacketData(pdata)
        surf = dec.DecodeSurfaceFromPacket(pdata, packet)
        if not surf.Empty():
            n += 1
    while True:
        surf = dec.FlushSingleSurface()
        if surf.Empty():
            break
        n += 1
    log.info("decoded %d surfaces of %dx%d", n, dmx.Width(), dmx.Height())
