#!/usr/bin/env python
"""Zero-copy array interop for decoded surfaces (analog of
samples/SampleCupy.py and SampleTypeConversionTest.py — cupy /
__cuda_array_interface__ become DLPack / jax arrays)."""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse
import sys

import jax.numpy as jnp
import numpy as np

import PyNvCodec as nvc
from videoprocessingframework_tpu.interop import (
    jax_to_torch,
    surface_planes_to_jax,
)

from utils import default_input, get_logger  # noqa: E402

log = get_logger("sample_dlpack")

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=default_input())
    args = ap.parse_args()

    dec = nvc.PyNvDecoder(args.input, 0)
    surf = dec.DecodeSingleSurface()
    y, uv = surface_planes_to_jax(surf.core)
    log.info("luma plane as jax array: shape=%s dtype=%s mean=%.2f",
             y.shape, y.dtype, float(jnp.mean(y.astype(jnp.float32))))
    t = jax_to_torch(y)
    log.info("as torch tensor: shape=%s dtype=%s", tuple(t.shape), t.dtype)
