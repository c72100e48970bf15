"""VFR (variable frame rate) contract coverage.

The reference rejects seek-by-frame-number on VFR sequences
(FFmpegDemuxer.cpp:276); the same contract lives in
io/native/demuxer.cpp:214-217. The asset is generated with the framework's
own encoder + muxer: H.264 packets with irregular pts gaps muxed into mp4,
which makes libav report r_frame_rate != avg_frame_rate → IsVFR.
"""

import numpy as np
import pytest

import PyNvCodec as nvc
from videoprocessingframework_tpu.core.enums import CodecId
from videoprocessingframework_tpu.io import VideoEncoder
from videoprocessingframework_tpu.io.demuxer import FFmpegDemuxer
from videoprocessingframework_tpu.io.muxer import StreamMuxer

W, H = 320, 240


@pytest.fixture(scope="module")
def vfr_mp4(tmp_path_factory) -> str:
    path = tmp_path_factory.mktemp("vfr") / "vfr.mp4"
    enc = VideoEncoder(
        {"codec": "h264", "preset": "P1", "s": f"{W}x{H}",
         "bitrate": "1M", "gop": "10"}
    )
    ys = np.arange(H, dtype=np.uint16)[:, None]
    xs = np.arange(W, dtype=np.uint16)[None, :]
    # irregular pts: gaps grow every 5 frames → avg fps != nominal fps
    pts, t, gap = [], 0, 1
    for i in range(30):
        pts.append(t)
        t += gap
        if i % 5 == 4:
            gap += 1
    packets = []
    for i in range(30):
        y = ((ys * 2 + xs + i * 9) % 256).astype(np.uint8)
        f = np.concatenate([y.ravel(), np.full(W * H // 2, 128, np.uint8)])
        out = enc.encode(f, pts=pts[i])
        if out is not None:
            packets.append(out)
    packets.extend(enc.flush())
    with StreamMuxer(str(path), CodecId.H264, W, H, fps=30.0) as mux:
        for pkt, meta in packets:
            mux.write(pkt, meta)
    return str(path)


def test_vfr_detected(vfr_mp4):
    d = FFmpegDemuxer(vfr_mp4)
    assert d.is_vfr
    assert d.framerate != d.avg_framerate
    d.close()
    dec = nvc.PyNvDecoder(vfr_mp4, 0)
    assert dec.IsVFR()


def test_vfr_seek_by_number_rejected(vfr_mp4):
    """Pin the reference's exact error contract (FFmpegDemuxer.cpp:276)."""
    dec = nvc.PyNvDecoder(vfr_mp4, 0)
    ctx = nvc.SeekContext(seek_frame=10)
    with pytest.raises(RuntimeError) as ei:
        dec.DecodeSingleSurface(ctx)
    assert "Can't seek by frame number in VFR sequences" in str(ei.value)
    assert "timestamp" in str(ei.value)


def test_vfr_seek_by_timestamp_works(vfr_mp4):
    dec = nvc.PyNvDecoder(vfr_mp4, 0)
    ctx = nvc.SeekContext(
        seek_ts=0.5, mode=nvc.SeekMode.PREV_KEY_FRAME
    )
    surf = dec.DecodeSingleSurface(ctx)
    assert not surf.Empty()
