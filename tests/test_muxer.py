"""Muxer tests: transcode to mp4/mkv and read the result back with the
framework's own demuxer (full container→container round trip)."""

import numpy as np
import pytest

from videoprocessingframework_tpu.core.enums import CodecId, PixelFormat
from videoprocessingframework_tpu.io import (
    FFmpegDemuxer,
    StreamMuxer,
    VideoEncoder,
    VideoReader,
)

W, H, N = 128, 96, 12


def _frame(i):
    y = ((np.arange(H)[:, None] * 2 + np.arange(W)[None, :] + 5 * i) % 256)
    uv = np.full((H // 2, W), 128, np.uint8)
    return np.concatenate([y.astype(np.uint8).ravel(), uv.ravel()])


# mp4 auto-converts Annex.B via its bitstream filter; mpeg-ts takes
# Annex.B natively. (matroska would need avcC extradata — see muxer.py.)
@pytest.mark.parametrize("container", ["mp4", "ts"])
def test_encode_mux_demux_roundtrip(tmp_path, container):
    enc = VideoEncoder(
        {"codec": "h264", "preset": "P1", "s": f"{W}x{H}", "fps": "30",
         "bitrate": "1M"}
    )
    out = tmp_path / f"out.{container}"
    mux = StreamMuxer(str(out), CodecId.H264, W, H, fps=30)
    written = 0
    for i in range(N):
        r = enc.encode(_frame(i), sync=True)
        if r is not None:
            mux.write(r[0], r[1])
            written += 1
    for pkt, meta in enc.flush():
        mux.write(pkt, meta)
        written += 1
    mux.close()
    assert written == N
    assert out.stat().st_size > 0

    # read back with the framework demuxer + decoder
    d = FFmpegDemuxer(str(out))
    assert d.width == W and d.height == H
    assert d.codec == CodecId.H264
    r = VideoReader(str(out))
    frames = sum(1 for _ in r.frames())
    assert frames == N


def test_transcode_mp4_to_mp4(test_mp4, tmp_path):
    """Container-to-container transcode: mp4 in → decode → encode → mp4."""
    reader = VideoReader(test_mp4)
    w, h = reader.width(), reader.height()
    fps = reader.framerate()
    enc = VideoEncoder(
        {"codec": "h264", "preset": "P1", "s": f"{w}x{h}", "bitrate": "2M",
         "fps": str(int(fps))}
    )
    out = tmp_path / "transcoded.mp4"
    mux = StreamMuxer(str(out), CodecId.H264, w, h, fps=fps)
    n_in = n_out = 0
    for i, frame in enumerate(reader.frames()):
        if i >= 24:
            break
        n_in += 1
        r = enc.encode(frame.data, sync=True)
        if r is not None:
            mux.write(r[0], r[1])
            n_out += 1
    mux.close()
    assert n_out == n_in == 24
    back = VideoReader(str(out))
    assert sum(1 for _ in back.frames()) == 24
