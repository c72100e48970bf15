#!/usr/bin/env python
"""Transcode quality measurement: encode→decode round trip scored with
device-side PSNR/SSIM (analog of samples/SampleMeasureVideoQuality.py,
with SSIM added and the scoring running as one batched XLA program)."""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse
import sys

import numpy as np

import PyNvCodec as nvc
from videoprocessingframework_tpu.ops.metrics import ms_ssim, psnr, ssim

from utils import default_input, get_logger  # noqa: E402

log = get_logger("sample_measure_video_quality")


def measure(src: str, bitrate: str = "2M", max_frames: int = 48):
    dec = nvc.PyNvDecoder(src, 0)
    w, h = dec.Width(), dec.Height()
    enc = nvc.PyNvEncoder(
        {"codec": "h264", "preset": "P4", "s": f"{w}x{h}", "bitrate": bitrate},
        0,
    )
    # encode the decoded ground truth
    originals = []
    stream = np.ndarray(shape=(0,), dtype=np.uint8)
    frame = np.ndarray(shape=(0,), dtype=np.uint8)
    n = 0
    while dec.DecodeSingleFrame(frame) and n < max_frames:
        originals.append(frame.copy())
        enc.EncodeSingleFrame(frame, stream, sync=False, append=True)
        n += 1
    enc.Flush(stream)

    # decode the re-encoded stream
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".h264") as tmp:
        tmp.write(stream.tobytes())
        tmp.flush()
        dec2 = nvc.PyNvDecoder(tmp.name, 0)
        recon = []
        out = np.ndarray(shape=(0,), dtype=np.uint8)
        while dec2.DecodeSingleFrame(out) and len(recon) < len(originals):
            recon.append(out.copy())

    k = min(len(originals), len(recon))
    a = np.stack(originals[:k]).reshape(k, h * 3 // 2, w)
    b = np.stack(recon[:k]).reshape(k, h * 3 // 2, w)
    p = np.asarray(psnr(a, b))
    s = np.asarray(ssim(a, b))
    # MS-SSIM on the luma plane only (the packed YUV420 layout stacks
    # chroma rows below luma; multi-scale pooling must not mix them)
    ms = np.asarray(ms_ssim(a[:, :h, :], b[:, :h, :]))
    return p, s, ms, k


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=default_input())
    ap.add_argument("--bitrate", default="2M")
    ap.add_argument("--frames", type=int, default=48)
    args = ap.parse_args()
    p, s, ms, k = measure(args.input, args.bitrate, args.frames)
    log.info("%d frames @ %s: PSNR avg %.2f dB (min %.2f), SSIM avg "
             "%.4f, MS-SSIM (luma) avg %.4f",
             k, args.bitrate, p.mean(), p.min(), s.mean(), ms.mean())
