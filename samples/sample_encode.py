#!/usr/bin/env python
"""Encode raw NV12 frames into an H.264/HEVC elementary stream (analog of
samples/SampleEncode.py)."""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse
import sys

import numpy as np

import PyNvCodec as nvc

from utils import get_logger  # noqa: E402

log = get_logger("sample_encode")


def encode_file(raw_path, out_path, width, height, codec="h264",
                preset="P4", bitrate="5M"):
    enc = nvc.PyNvEncoder(
        {"codec": codec, "preset": preset, "s": f"{width}x{height}",
         "bitrate": bitrate},
        0,
    )
    fsize = enc.GetFrameSizeInBytes()
    packet = np.ndarray(shape=(0,), dtype=np.uint8)
    sent = recv = 0
    with open(raw_path, "rb") as f, open(out_path, "wb") as out:
        while True:
            chunk = f.read(fsize)
            if len(chunk) != fsize:
                break
            frame = np.frombuffer(chunk, dtype=np.uint8)
            if enc.EncodeSingleFrame(frame, packet):
                out.write(packet.tobytes())
                recv += 1
            sent += 1
        while enc.FlushSinglePacket(packet):
            out.write(packet.tobytes())
            recv += 1
    return sent, recv


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="raw NV12 file")
    ap.add_argument("output", help="elementary stream output")
    ap.add_argument("width", type=int)
    ap.add_argument("height", type=int)
    ap.add_argument("--codec", default="h264")
    ap.add_argument("--preset", default="P4")
    ap.add_argument("--bitrate", default="5M")
    args = ap.parse_args()
    sent, recv = encode_file(args.input, args.output, args.width, args.height,
                             args.codec, args.preset, args.bitrate)
    log.info("sent %d frames, wrote %d packets -> %s", sent, recv, args.output)
