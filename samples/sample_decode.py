#!/usr/bin/env python
"""Decode sample: built-in vs standalone demux modes, seek, and decoder
error recovery (analog of the reference's samples/SampleDecode.py).

Usage: python sample_decode.py [input.mp4] [output.nv12] [--mode builtin|standalone|seek]
"""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse
import sys

import numpy as np

import PyNvCodec as nvc

from utils import default_input, get_logger  # noqa: E402

log = get_logger("sample_decode")


def decode_builtin(src: str, dst: str, max_frames=None) -> int:
    dec = nvc.PyNvDecoder(src, 0)
    frame = np.ndarray(shape=(0,), dtype=np.uint8)
    n = 0
    with open(dst, "wb") as out:
        while True:
            try:
                if not dec.DecodeSingleFrame(frame):
                    break
            except nvc.HwResetException:
                log.warning("decoder reset — continuing")
                continue
            except nvc.CuvidParserException:
                log.warning("parser error — stopping")
                break
            out.write(frame.tobytes())
            n += 1
            if max_frames and n >= max_frames:
                break
    return n


def decode_standalone(src: str, dst: str) -> int:
    dmx = nvc.PyFFmpegDemuxer(src)
    dec = nvc.PyNvDecoder(dmx.Width(), dmx.Height(), dmx.Format(), dmx.Codec(), 0)
    packet = np.ndarray(shape=(0,), dtype=np.uint8)
    frame = np.ndarray(shape=(0,), dtype=np.uint8)
    n = 0
    with open(dst, "wb") as out:
        while dmx.DemuxSinglePacket(packet):
            if dec.DecodeFrameFromPacket(frame, packet):
                out.write(frame.tobytes())
                n += 1
        while dec.FlushSingleFrame(frame):
            out.write(frame.tobytes())
            n += 1
    return n


def decode_with_seek(src: str, dst: str, seek_frame: int) -> int:
    dec = nvc.PyNvDecoder(src, 0)
    frame = np.ndarray(shape=(0,), dtype=np.uint8)
    sc = nvc.SeekContext(seek_frame=seek_frame)
    n = 0
    with open(dst, "wb") as out:
        if dec.DecodeSingleFrame(frame, sc):
            out.write(frame.tobytes())
            n += 1
            log.info(
                "seek to frame %d decoded %d frames along the way",
                seek_frame,
                sc.num_frames_decoded,
            )
        while dec.DecodeSingleFrame(frame):
            out.write(frame.tobytes())
            n += 1
    return n


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=default_input())
    ap.add_argument("output", nargs="?", default="/tmp/out.nv12")
    ap.add_argument("--mode", default="builtin",
                    choices=["builtin", "standalone", "seek"])
    ap.add_argument("--seek-frame", type=int, default=10)
    args = ap.parse_args()
    if args.mode == "builtin":
        n = decode_builtin(args.input, args.output)
    elif args.mode == "standalone":
        n = decode_standalone(args.input, args.output)
    else:
        n = decode_with_seek(args.input, args.output, args.seek_frame)
    log.info("decoded %d frames -> %s", n, args.output)
