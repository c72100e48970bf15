#!/usr/bin/env python
"""Surface ↔ torch tensor round trip including re-encode (analog of
samples/SamplePyTorch.py — makefromDevicePtrUint8/TensorToDptr become
DLPack handoffs)."""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse
import sys

import numpy as np

import PyNvCodec as nvc
from videoprocessingframework_tpu.interop import (
    surface_to_torch,
    torch_to_surface,
)

from utils import default_input, get_logger  # noqa: E402

log = get_logger("sample_torch")

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=default_input())
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    dec = nvc.PyNvDecoder(args.input, 0)
    w, h = dec.Width(), dec.Height()
    enc = nvc.PyNvEncoder(
        {"codec": "h264", "preset": "P1", "s": f"{w}x{h}", "bitrate": "3M"}, 0
    )
    packet = np.ndarray(shape=(0,), dtype=np.uint8)
    n = 0
    for _ in range(args.frames):
        surf = dec.DecodeSingleSurface()
        if surf.Empty():
            break
        # Surface → torch (luma plane), tweak in torch, → Surface → encode
        t = surface_to_torch(surf.core, 0)
        t = (t.float() * 0.9).clamp(0, 255).byte()
        uv = surface_to_torch(surf.core, 1)
        import torch

        packed = torch.cat([t.reshape(-1), uv.reshape(-1)])
        s2 = torch_to_surface(packed, nvc.PixelFormat.NV12, w, h)
        if enc.EncodeSingleSurface(nvc.Surface(s2), packet, sync=True):
            n += 1
    log.info("round-tripped %d frames through torch and re-encoded", n)
