#!/usr/bin/env python
"""Decode → fused preproc → semantic segmentation (analog of
samples/SampleTorchSegmentation.py, with a compiled JAX model in place of
torchvision's FCN — a small fully-convolutional head over the framework's
ResNet backbone, randomly initialized for demonstration)."""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

import PyNvCodec as nvc
from videoprocessingframework_tpu.ops.fused import decode_postproc

from utils import default_input, get_logger  # noqa: E402

log = get_logger("sample_segmentation")




if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=default_input())
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    from videoprocessingframework_tpu.models import fcn_resnet
    from videoprocessingframework_tpu.models.segmentation import init_params

    dmx = nvc.PyFFmpegDemuxer(args.input)
    dec = nvc.PyNvDecoder(args.input, 0)
    model = fcn_resnet()
    params = init_params(model, (1, 224, 224, 3))

    @jax.jit
    def segment(p, y, uv):
        x = decode_postproc(
            y, uv,
            src_format=nvc.PixelFormat.NV12,
            space=dmx.ColorSpace(), rng=dmx.ColorRange(),
            out_h=224, out_w=224, output="normalized",
        )
        return model.apply(p, x, train=False).argmax(-1)

    w, h = dmx.Width(), dmx.Height()
    frame = np.ndarray(shape=(0,), dtype=np.uint8)
    n = 0
    while dec.DecodeSingleFrame(frame) and n < args.frames:
        packed = frame.reshape(h * 3 // 2, w)
        mask = segment(params, packed[None, :h], packed[None, h:])
        n += 1
    log.info("segmented %d frames; mask shape %s", n, tuple(mask.shape))
