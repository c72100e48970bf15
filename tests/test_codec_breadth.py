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


def test_av1_encoder_does_not_leak_realtime_scheduling():
    """SVT-AV1 promotes the calling thread to SCHED_FIFO during init; the
    native encoder must restore the caller's policy (a leaked RT policy
    starves every subprocess of the embedding process — observed as
    600s sample-test timeouts — and can livelock process exit)."""
    os_sched = pytest.importorskip("os")
    if not hasattr(os_sched, "sched_getscheduler"):
        pytest.skip("no sched introspection on this platform")
    before = os_sched.sched_getscheduler(0)
    try:
        enc = VideoEncoder(
            {"codec": "av1", "s": f"{W}x{H}", "bitrate": "2M"}
        )
        enc.encode(_frame(0), sync=True)
        list(enc.flush())
    except Exception as e:
        pytest.skip(f"av1 encoder unavailable: {e}")
    assert os_sched.sched_getscheduler(0) == before
