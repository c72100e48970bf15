"""Encoder tests — mirrors the reference's tests/test_PyNvEncoder.py:
frames_sent == frames_received after flush, option validation contract,
Reconfigure with resolution change + force_idr + re-decode round trip,
SEI injection round trip."""

import numpy as np
import pytest

from videoprocessingframework_tpu.core.enums import CodecId, PixelFormat
from videoprocessingframework_tpu.io import (
    FFmpegDemuxer,
    VideoEncoder,
    VideoReader,
    get_encoder_params,
)

W, H = 320, 240


def _gradient_frame(i: int, w: int = W, h: int = H) -> np.ndarray:
    """Deterministic NV12 test frame."""
    y = (np.arange(h)[:, None] + np.arange(w)[None, :] + 3 * i) % 256
    uv = np.full((h // 2, w), 128, np.uint8)
    return np.concatenate([y.astype(np.uint8).ravel(), uv.ravel()])


def test_option_vocabulary():
    params = get_encoder_params()
    assert "codec" in params and "preset" in params and len(params) == 29


def test_invalid_option_name():
    with pytest.raises(ValueError, match='Invalid parameter name"codecc"'):
        VideoEncoder({"codecc": "h264", "s": "320x240"})


def test_missing_size():
    with pytest.raises(ValueError, match="'s'"):
        VideoEncoder({"codec": "h264"})


def test_encode_all_frames_received(tmp_path):
    """frames_sent == frames_recv after flush (reference :67-105)."""
    enc = VideoEncoder(
        {"codec": "h264", "preset": "P1", "s": f"{W}x{H}", "bitrate": "1M"}
    )
    assert enc.width == W and enc.height == H
    assert enc.frame_size_in_bytes() == W * H * 3 // 2
    sent, received = 0, 0
    stream = bytearray()
    for i in range(25):
        out = enc.encode(_gradient_frame(i))
        sent += 1
        if out is not None:
            stream += out[0].tobytes()
            received += 1
    for pkt, meta in enc.flush():
        stream += pkt.tobytes()
        received += 1
    assert received == sent == 25

    # round-trip: decode the elementary stream back
    path = tmp_path / "out.h264"
    path.write_bytes(bytes(stream))
    r = VideoReader(str(path))
    frames = sum(1 for _ in r.frames())
    assert frames == 25


def test_sync_mode_zero_delay():
    enc = VideoEncoder(
        {"codec": "h264", "preset": "P1", "s": f"{W}x{H}", "bitrate": "1M"}
    )
    for i in range(5):
        out = enc.encode(_gradient_frame(i), sync=True)
        assert out is not None  # zero output delay in sync mode
        pkt, meta = out
        assert pkt.nbytes == meta.bsl > 0


def test_sei_round_trip(tmp_path):
    payload = b"vpf-tpu sei payload 123"
    enc = VideoEncoder(
        {"codec": "h264", "preset": "P1", "s": f"{W}x{H}", "bitrate": "1M"}
    )
    stream = bytearray()
    for i in range(5):
        out = enc.encode(_gradient_frame(i), sei=payload if i == 0 else None, sync=True)
        stream += out[0].tobytes()
    path = tmp_path / "sei.h264"
    path.write_bytes(bytes(stream))
    d = FFmpegDemuxer(str(path))
    res = d.demux(need_sei=True)
    assert res.sei is not None
    assert payload in res.sei.tobytes()


def test_reconfigure_resolution_change(tmp_path):
    """Reconfigure to a new size with reset + force_idr; both segments must
    re-decode at their own geometry (reference :107-162)."""
    enc = VideoEncoder(
        {"codec": "h264", "preset": "P1", "s": f"{W}x{H}", "bitrate": "1M"}
    )
    seg1 = bytearray()
    for i in range(8):
        out = enc.encode(_gradient_frame(i), sync=True)
        seg1 += out[0].tobytes()
    w2, h2 = W // 2, H // 2
    assert enc.reconfigure({"s": f"{w2}x{h2}"}, force_idr=True, reset_encoder=True)
    assert enc.width == w2 and enc.height == h2
    seg2 = bytearray()
    for i in range(8):
        out = enc.encode(_gradient_frame(i, w2, h2), sync=True)
        seg2 += out[0].tobytes()

    path = tmp_path / "res_change.h264"
    path.write_bytes(bytes(seg1 + seg2))
    r = VideoReader(str(path))
    sizes = [(f.width, f.height) for f in r.frames()]
    assert len(sizes) == 16
    assert sizes[0] == (W, H)
    assert sizes[-1] == (w2, h2)


def test_encode_surface_input():
    from videoprocessingframework_tpu.core.surface import Surface

    enc = VideoEncoder(
        {"codec": "h264", "preset": "P1", "s": f"{W}x{H}", "bitrate": "1M"}
    )
    s = Surface.from_host_frame(_gradient_frame(0), PixelFormat.NV12, W, H)
    out = enc.encode(s, sync=True)
    assert out is not None

    bad = Surface.make(PixelFormat.NV12, W * 2, H * 2)
    with pytest.raises(ValueError, match="size"):
        enc.encode(bad)


def test_hevc_encoder_if_available(tmp_path):
    enc = VideoEncoder(
        {"codec": "hevc", "preset": "P1", "s": f"{W}x{H}", "bitrate": "1M"}
    )
    try:
        out = enc.encode(_gradient_frame(0), sync=True)
    except Exception as e:
        pytest.skip(f"hevc encoder unavailable: {e}")
    stream = bytearray(out[0].tobytes() if out else b"")
    for pkt, _ in enc.flush():
        stream += pkt.tobytes()
    assert len(stream) > 0
