#!/usr/bin/env python
"""Split MJPEG→MJPEG transcode: the whole pixel path on the TPU.

Host work is entropy coding only — packets entropy-decode to DCT
coefficients, ONE XLA program per batch runs dequant/IDCT → optional
pixel-domain YUV resize → fDCT/requant on the MXU, and the output
coefficients Huffman-pack back to baseline JFIF. Reference analog: the
serial decode→encode loop of samples/SampleMeasureVideoQuality.py,
collapsed to one device dispatch; quality is verified the same way
(PSNR of a decode of the output vs a decode of the input).

If no input is given, a synthetic MJPEG clip is generated first with the
split *encoder* (MjpegWriter).
"""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse

import numpy as np

from utils import get_logger  # noqa: E402

log = get_logger("sample_mjpeg_transcode")


def make_clip(path, w, h, n, quality=90):
    from videoprocessingframework_tpu.io import MjpegWriter

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        (yy * 255 / h)[..., None] * np.array([1.0, 0.6, 0.3])
        + (xx * 255 / w)[..., None] * np.array([0.0, 0.4, 0.7])
    ) / 2
    with MjpegWriter(str(path), w, h, quality=quality) as wr:
        frames = np.clip(
            base[None] + rng.normal(0, 4, (n, h, w, 3)), 0, 255
        ).astype(np.uint8)
        wr.write_rgb(frames)
    return str(path)


def psnr_vs_source(src, dst):
    from videoprocessingframework_tpu.io import MjpegReader

    a = np.concatenate(
        [np.asarray(b) for b in MjpegReader(src, output="rgb_u8").batches()]
    )
    rd = MjpegReader(dst, output="rgb_u8", out_size=a.shape[1:3])
    b = np.concatenate([np.asarray(x) for x in rd.batches()])
    n = min(len(a), len(b))
    err = a[:n].astype(np.float64) - b[:n].astype(np.float64)
    return 10 * np.log10(255.0**2 / (err**2).mean())


def main(src, dst, quality, out_size, frames, batch):
    from videoprocessingframework_tpu.io import MjpegTranscoder

    if src in (None, "synth"):
        src = make_clip("/tmp/sample_mjpeg_src.mjpeg", 320, 240, 8)
        log.info("generated source clip %s", src)

    with MjpegTranscoder(
        src, dst, quality=quality, out_size=out_size,
        batch=batch, max_frames=frames,
    ) as t:
        st = t.run()
    log.info(
        "transcoded %d frames -> %s (%.1f KB/frame) at %.1f fps",
        st.frames, dst, st.out_bytes / max(st.frames, 1) / 1024, st.fps,
    )
    log.info("PSNR vs source decode: %.2f dB", psnr_vs_source(src, dst))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=None,
                    help="MJPEG source ('synth' or omitted: generate one)")
    ap.add_argument("output", nargs="?", default="out_transcoded.mjpeg")
    ap.add_argument("--quality", type=int, default=90)
    ap.add_argument("--size", default=None, help="WxH device resize")
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--batch", type=int, default=8)
    a = ap.parse_args()
    out_size = None
    if a.size:
        w, h = (int(x) for x in a.size.split("x"))
        out_size = (h, w)
    main(a.input, a.output, a.quality, out_size, a.frames, a.batch)
