#!/usr/bin/env python
"""Full transcode: decode → (optional resize) → re-encode, preserving the
transcode API shape of the reference (decode/convert/encode task chain)."""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse
import sys

import numpy as np

import PyNvCodec as nvc

from utils import default_input, get_logger  # noqa: E402

log = get_logger("sample_transcode")


def transcode_fast(src, dst, preset="P1", bitrate="3M"):
    """Overlapped native pipeline (io/transcode.py): decode in the pool's
    C++ worker, encode on this thread — ~5.9x the serial per-frame chain
    at 1080p (docs/performance.md). Same-geometry only (scaling goes
    through the device path, sample_device_transcode.py)."""
    from videoprocessingframework_tpu.io import Transcoder

    t = Transcoder(src, {"preset": preset, "bitrate": bitrate})
    n_pkts = 0

    def write(data, meta):
        nonlocal n_pkts
        f.write(data.tobytes())
        n_pkts += 1

    with open(dst, "wb") as f:
        st = t.run(write)
    log.info(
        "fast transcode: %d frames in %.2fs = %.1f fps (stages: %s)",
        st.frames, st.wall_s, st.fps,
        {k: round(v["mean_ms"], 2)
         for k, v in t.timer.summary().items()},
    )
    return st.frames, n_pkts


def transcode(src, dst, codec="h264", bitrate="3M", scale=None):
    from videoprocessingframework_tpu.core.enums import CodecId
    from videoprocessingframework_tpu.io import StreamMuxer

    dec = nvc.PyNvDecoder(src, 0)
    w, h = dec.Width(), dec.Height()
    ow, oh = (w, h) if not scale else scale
    fps = dec.Framerate()
    enc = nvc.PyNvEncoder(
        {"codec": codec, "preset": "P2", "s": f"{ow}x{oh}",
         "bitrate": bitrate, "fps": str(int(fps))}, 0
    )
    resizer = None
    if (ow, oh) != (w, h):
        resizer = nvc.PySurfaceResizer(ow, oh, nvc.PixelFormat.NV12, 0)
    # container output (mp4/ts) when the extension asks for it, else raw ES
    mux = None
    if dst.endswith((".mp4", ".ts")):
        mux = StreamMuxer(
            dst, CodecId.H264 if codec == "h264" else CodecId.HEVC,
            ow, oh, fps=fps,
        )
    packet = np.ndarray(shape=(0,), dtype=np.uint8)
    pdata = nvc.PacketData()
    n_in = n_out = 0
    raw = None if mux else open(dst, "wb")
    try:
        while True:
            surf = dec.DecodeSingleSurface()
            if surf.Empty():
                break
            n_in += 1
            if resizer:
                surf = resizer.Execute(surf)
            if enc.EncodeSingleSurface(surf, packet):
                if mux:
                    enc.LastPacketData(pdata)
                    mux.write(packet, pdata)
                else:
                    raw.write(packet.tobytes())
                n_out += 1
        while enc.FlushSinglePacket(packet):
            if mux:
                enc.LastPacketData(pdata)
                mux.write(packet, pdata)
            else:
                raw.write(packet.tobytes())
            n_out += 1
    finally:
        if mux:
            mux.close()
        if raw:
            raw.close()
    return n_in, n_out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=default_input())
    ap.add_argument("output", nargs="?", default="/tmp/transcoded.h264")
    ap.add_argument("--codec", default="h264")
    ap.add_argument("--bitrate", default="3M")
    ap.add_argument("--scale", help="WxH", default=None)
    ap.add_argument(
        "--fast", action="store_true",
        help="overlapped native pipeline (same geometry, h264 ES out)",
    )
    args = ap.parse_args()
    scale = tuple(map(int, args.scale.split("x"))) if args.scale else None
    if args.fast:
        if scale or args.codec != "h264":
            ap.error("--fast supports same-geometry h264 output")
        n_in, n_out = transcode_fast(args.input, args.output,
                                     bitrate=args.bitrate)
    else:
        n_in, n_out = transcode(args.input, args.output, args.codec,
                                args.bitrate, scale)
    log.info("transcoded %d frames -> %d packets -> %s", n_in, n_out,
             args.output)
