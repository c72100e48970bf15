#!/usr/bin/env python
"""Device-side transcode: decode → fused YUV→RGB on the TPU → an
RGB-space device op (overlay band) → fused RGB→YUV420 encoder feed
(ops.fused.encode_feed) → re-encode.

This is the outbound counterpart of the model-feed chain: where
SampleTorchResnet turns decoded frames INTO model input, this sample
turns device-resident RGB (e.g. a model/overlay output) back into an
encoder feed — the whole scale + color-space conversion runs as compiled
device programs, mirroring the reference transcode chain
(Tasks.cpp ResizeSurface + TasksColorCvt.cpp rgb→yuv420) in two fused
programs instead of per-stage NPP kernels.
"""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse

import numpy as np

from utils import default_input, get_logger  # noqa: E402

log = get_logger("sample_device_transcode")


def main(src, dst, out_w, out_h, frames):
    import jax.numpy as jnp

    from videoprocessingframework_tpu.core.enums import (
        ColorRange, ColorSpace, PixelFormat,
    )
    from videoprocessingframework_tpu.io import NativeDecodePool, VideoEncoder
    from videoprocessingframework_tpu.ops import encode_feed, FusedPipeline
    from videoprocessingframework_tpu.ops.fused import planes_to_host_packed

    pool = NativeDecodePool(
        [src], batch_size=4, out_format=PixelFormat.YUV420,
        max_frames_per_stream=frames,
    )
    space, rng = pool.color_space, pool.color_range
    to_rgb = FusedPipeline(
        PixelFormat.YUV420, space, rng,
        out_size=(pool.width, pool.height), output="rgb_f32",
    )
    enc = VideoEncoder(
        {"codec": "h264", "preset": "P1", "fmt": "YUV420",
         "s": f"{out_w}x{out_h}", "bitrate": "4M", "gop": "30"}
    )

    stream = bytearray()
    n = 0
    for rgb in pool.batches(to_rgb):
        # device-side RGB op: darken a horizontal band (overlay stand-in)
        rgb = rgb.at[:, rgb.shape[1] // 3: rgb.shape[1] // 2].multiply(0.5)
        planes = encode_feed(
            jnp.clip(rgb, 0.0, 1.0), out_h=out_h, out_w=out_w,
            space=ColorSpace(space), rng=ColorRange(rng),
        )
        for frame in planes_to_host_packed(*planes):
            out = enc.encode(frame)
            if out is not None:
                stream += out[0].tobytes()
            n += 1
    for pkt, _ in enc.flush():
        stream += pkt.tobytes()
    pool.close()
    _pathlib.Path(dst).write_bytes(bytes(stream))
    log.info("device-transcoded %d frames -> %s (%d bytes)", n, dst,
             len(stream))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=default_input())
    ap.add_argument("output", nargs="?", default="out_device.h264")
    ap.add_argument("--size", default="640x360")
    ap.add_argument("--frames", type=int, default=0)
    a = ap.parse_args()
    w, h = (int(x) for x in a.size.split("x"))
    main(a.input, a.output, w, h, a.frames)
