#!/usr/bin/env python
"""Fisheye-style undistort via SurfaceRemaper with x/y maps (analog of
samples/SampleRemap.py — there the maps come from an .npz; here a synthetic
barrel-distortion map is generated when none is given)."""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse
import sys

import numpy as np

import PyNvCodec as nvc

from utils import default_input, get_logger  # noqa: E402

log = get_logger("sample_remap")


def barrel_maps(w: int, h: int, k: float = 0.18):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    cx, cy = w / 2, h / 2
    nx, ny = (xs - cx) / cx, (ys - cy) / cy
    r2 = nx * nx + ny * ny
    scale = 1.0 + k * r2
    return (cx + nx * scale * cx).astype(np.float32), (
        cy + ny * scale * cy
    ).astype(np.float32)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=default_input())
    ap.add_argument("--maps", help=".npz with arrays 'xmap'/'ymap'")
    ap.add_argument("--frames", type=int, default=4)
    args = ap.parse_args()

    dec = nvc.PyNvDecoder(args.input, 0)
    w, h = dec.Width(), dec.Height()
    if args.maps:
        data = np.load(args.maps)
        xmap, ymap = data["xmap"], data["ymap"]
    else:
        xmap, ymap = barrel_maps(w, h)

    cc = nvc.ColorspaceConversionContext(dec.ColorSpace(), dec.ColorRange())
    to_rgb = nvc.PySurfaceConverter(
        w, h, nvc.PixelFormat.NV12, nvc.PixelFormat.RGB, 0
    )
    remap = nvc.PySurfaceRemaper(xmap, ymap, nvc.PixelFormat.RGB, 0)
    n = 0
    for _ in range(args.frames):
        surf = dec.DecodeSingleSurface()
        if surf.Empty():
            break
        rgb = to_rgb.Execute(surf, cc)
        out = remap.Execute(rgb)
        assert not out.Empty() and out.Width() == xmap.shape[1]
        n += 1
    log.info("remapped %d frames to %dx%d", n, xmap.shape[1], xmap.shape[0])
