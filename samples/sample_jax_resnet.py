#!/usr/bin/env python
"""Decode → fused CSC/resize/normalize → Flax ResNet-50 inference
(analog of samples/SampleTorchResnet.py:1060-1160).

Where the reference runs five device stages plus a DtoD tensor export per
frame, here the whole post-decode chain plus the model forward is one
compiled program per batch, fed zero-copy (the Surface planes already are
jax arrays in HBM)."""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse
import sys

import jax
import numpy as np

import PyNvCodec as nvc
from videoprocessingframework_tpu.models import init_params, resnet50
from videoprocessingframework_tpu.ops.fused import decode_postproc

from utils import default_input, get_logger  # noqa: E402

log = get_logger("sample_jax_resnet")


def main(src: str, batch: int, max_frames: int):
    dmx = nvc.PyFFmpegDemuxer(src)
    dec = nvc.PyNvDecoder(src, 0)
    model = resnet50()
    variables = init_params(model, (1, 224, 224, 3))

    @jax.jit
    def forward(vars_, y, uv):
        x = decode_postproc(
            y, uv,
            src_format=nvc.PixelFormat.NV12,
            space=dmx.ColorSpace(),
            rng=dmx.ColorRange(),
            out_h=224, out_w=224,
            output="normalized",
        )
        return model.apply(vars_, x, train=False)

    frame = np.ndarray(shape=(0,), dtype=np.uint8)
    w, h = dmx.Width(), dmx.Height()
    ys, uvs, n = [], [], 0
    top1 = []
    while dec.DecodeSingleFrame(frame) and n < max_frames:
        packed = frame.reshape(h * 3 // 2, w)
        ys.append(packed[:h].copy())
        uvs.append(packed[h:].copy())
        n += 1
        if len(ys) == batch:
            logits = forward(variables, np.stack(ys), np.stack(uvs))
            top1.extend(np.asarray(logits.argmax(-1)).tolist())
            ys, uvs = [], []
    if ys:
        logits = forward(variables, np.stack(ys), np.stack(uvs))
        top1.extend(np.asarray(logits.argmax(-1)).tolist())
    log.info("classified %d frames; first top-1 class ids: %s",
             len(top1), top1[:8])
    return top1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=default_input())
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=32)
    args = ap.parse_args()
    main(args.input, args.batch, args.frames)
