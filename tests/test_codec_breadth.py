"""Codec breadth: VP8/VP9/AV1/MPEG4/MJPEG encode→decode round trips via
direct packet feeding (elementary VP9/AV1 has no raw container format, so
packets go straight into a standalone decoder session)."""

import numpy as np
import pytest

from videoprocessingframework_tpu.core.enums import CodecId, PixelFormat
from videoprocessingframework_tpu.io import VideoDecoder, VideoEncoder

W, H = 128, 96
N_FRAMES = 5


def _frame(i: int) -> np.ndarray:
    y = ((np.arange(H)[:, None] * 3 + np.arange(W)[None, :] + i * 9) % 256)
    uv = np.full((H // 2, W), 128, np.uint8)
    return np.concatenate([y.astype(np.uint8).ravel(), uv.ravel()])


@pytest.mark.parametrize(
    "codec_name,codec_id",
    [
        ("vp9", CodecId.VP9),
        ("vp8", CodecId.VP8),
        ("av1", CodecId.AV1),
        ("mpeg4", CodecId.MPEG4),
        ("mjpeg", CodecId.MJPEG),
    ],
)
def test_packet_round_trip(codec_name, codec_id):
    try:
        enc = VideoEncoder(
            {"codec": codec_name, "s": f"{W}x{H}", "bitrate": "2M"}
        )
        packets = []
        for i in range(N_FRAMES):
            out = enc.encode(_frame(i), sync=True)
            if out is not None:
                packets.append(out[0])
        packets.extend(p for p, _ in enc.flush())
    except Exception as e:
        pytest.skip(f"{codec_name} encoder unavailable: {e}")
    assert packets, f"{codec_name}: no packets produced"

    dec = VideoDecoder(codec_id, threads=1)
    frames = 0
    for pkt in packets:
        if dec.decode_packet(pkt) is not None:
            frames += 1
    while dec.flush_frame() is not None:
        frames += 1
    assert frames == N_FRAMES
