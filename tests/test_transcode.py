"""Overlapped transcode pipeline: frame counts, stream validity, PSNR,
multi-stream aggregate (SampleMeasureVideoQuality /
SampleDecodeMultiThread analogs)."""

import numpy as np
import pytest

from videoprocessingframework_tpu.core.enums import PixelFormat
from videoprocessingframework_tpu.io import (
    Transcoder,
    VideoReader,
    transcode,
    transcode_many,
)


def _luma_frames(path, n, width, height):
    r = VideoReader(str(path))
    r.decoder.output_format = PixelFormat.YUV420
    out = []
    for f in r.frames():
        out.append(
            f.data[: f.width * f.height].reshape(f.height, f.width).copy()
        )
        if len(out) >= n:
            break
    return out


def test_transcode_counts_and_quality(test_mp4, gt, tmp_path):
    stream, st = transcode(
        test_mp4, {"preset": "P1", "bitrate": "4M", "constqp": "12"}
    )
    assert st.frames == gt["num_frames"]
    assert st.out_bytes == len(stream) > 0
    es = tmp_path / "re.h264"
    es.write_bytes(stream)
    # re-encoded stream decodes to the same frame count
    got = _luma_frames(es, gt["num_frames"], gt["width"], gt["height"])
    want = _luma_frames(test_mp4, 8, gt["width"], gt["height"])
    assert len(got) == gt["num_frames"]
    # quality sanity: near-lossless qp keeps luma PSNR well above 40 dB
    for w, g in zip(want, got[: len(want)]):
        mse = ((w.astype(np.float64) - g.astype(np.float64)) ** 2).mean()
        psnr = 10 * np.log10(255.0**2 / max(mse, 1e-9))
        assert psnr > 40.0, psnr


def test_transcode_max_frames(test_mp4):
    _, st = transcode(test_mp4, {"preset": "P1"}, max_frames=10)
    assert st.frames == 10


def test_transcode_rejects_non_yuv420_fmt(test_mp4):
    with pytest.raises(ValueError, match="YUV420"):
        Transcoder(test_mp4, {"fmt": "YUV444"})


def test_transcode_many_aggregate(test_mp4):
    agg = transcode_many(
        [test_mp4] * 2, {"preset": "P1"}, max_frames=12, keep_streams=True
    )
    assert agg.frames == 24
    assert len(agg.per_stream_fps) == 2
    assert all(len(s) > 0 for s in agg.streams)
