"""Decode tests — mirrors the reference's tests/test_PyNvDecoder.py: frame
count, monotonic pts, seek-vs-continuous bit-exactness, standalone
demux+decode with flush-drain, resolution change, error contracts."""

import pathlib

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

from videoprocessingframework_tpu.core.enums import (
    CodecId,
    ColorRange,
    ColorSpace,
    PixelFormat,
    SeekMode,
)
from videoprocessingframework_tpu.core.packet import SeekContext
from videoprocessingframework_tpu.io import FFmpegDemuxer, VideoReader


def test_metadata_getters(test_mp4, gt):
    r = VideoReader(test_mp4)
    assert r.width() == gt["width"]
    assert r.height() == gt["height"]
    assert r.framerate() == gt["framerate"]
    assert r.avg_framerate() == gt["framerate"]
    assert not r.is_vfr()
    assert r.num_frames() == gt["num_frames"]
    assert r.color_space() == ColorSpace.BT_709
    assert r.color_range() == ColorRange.MPEG
    assert r.format == PixelFormat.NV12
    assert r.frame_size() == gt["width"] * gt["height"] * 3 // 2


def test_decode_all_frames(test_mp4, gt):
    r = VideoReader(test_mp4)
    n = 0
    last_pts = None
    for f in r.frames():
        assert f.width == gt["width"] and f.height == gt["height"]
        assert f.format == PixelFormat.NV12
        assert f.data.nbytes == gt["width"] * gt["height"] * 3 // 2
        if last_pts is not None:
            assert f.pkt_data.pts > last_pts  # display order: monotonic pts
        last_pts = f.pkt_data.pts
        n += 1
    assert n == gt["num_frames"]


def test_decode_with_sei(test_mp4):
    r = VideoReader(test_mp4)
    f = r.decode(need_sei=True)
    assert f is not None
    assert r.last_sei() is not None and r.last_sei().nbytes > 0


def test_standalone_demux_decode_with_drain(test_mp4, gt):
    d = FFmpegDemuxer(test_mp4)
    r = VideoReader(codec=CodecId.H264, width=d.width, height=d.height)
    frames = 0
    bsl_total = 0
    while True:
        res = d.demux()
        if res is None:
            break
        bsl_total += res.pkt_data.bsl
        f = r.decode(packet=res.packet, packet_data=res.pkt_data)
        if f is not None:
            frames += 1
    while True:
        f = r.flush_single_frame()
        if f is None:
            break
        frames += 1
    assert frames == gt["num_frames"]
    assert bsl_total > 0


def test_seek_matches_continuous(test_mp4, gt):
    """Seek to frame N, decode; must be bit-exact vs continuous decode."""
    target = 37
    cont = VideoReader(test_mp4)
    frame_n = None
    for i, f in enumerate(cont.frames()):
        if i == target:
            frame_n = f
            break
    assert frame_n is not None

    seeker = VideoReader(test_mp4)
    sc = SeekContext(seek_frame=target, mode=SeekMode.PREV_KEY_FRAME)
    f2 = seeker.decode(seek_ctx=sc)
    assert f2 is not None
    assert f2.pkt_data.pts == frame_n.pkt_data.pts
    np.testing.assert_array_equal(f2.data, frame_n.data)
    assert sc.num_frames_decoded >= 1
    assert sc.out_frame_pts == frame_n.pkt_data.pts


def test_seek_by_timestamp_decode(test_mp4, gt):
    r = VideoReader(test_mp4)
    sc = SeekContext(seek_tssec=1.5, mode=SeekMode.PREV_KEY_FRAME)
    f = r.decode(seek_ctx=sc)
    assert f is not None
    # landed frame pts corresponds to >= 1.5s
    assert f.pkt_data.pts * r.timebase() >= 1.5 - 1.0 / gt["framerate"]


def test_seek_exact_mode_rejected(test_mp4):
    r = VideoReader(test_mp4)
    sc = SeekContext(seek_frame=10, mode=SeekMode.EXACT_FRAME)
    with pytest.raises(RuntimeError, match="closest previous key frame"):
        r.decode(seek_ctx=sc)


def test_resolution_change(test_res_change, gt):
    """test_res_change.h264 halves resolution at frame 47."""
    r = VideoReader(test_res_change)
    sizes = []
    for f in r.frames():
        sizes.append((f.width, f.height))
    assert len(sizes) > 47
    w0, h0 = sizes[0]
    assert (w0, h0) == (gt["width"], gt["height"])
    assert (w0 // 2, h0 // 2) in sizes  # halved resolution appears
    # data buffer size follows the new geometry
    assert sizes[-1] == (w0 // 2, h0 // 2)


def test_no_demuxer_error_contract(gt):
    """Reference issue #455 error-message contract."""
    r = VideoReader(codec=CodecId.H264, width=256, height=256)
    with pytest.raises(RuntimeError) as ei:
        r.decode()
    assert (
        "Tried to call DecodeSurface/DecodeFrame on a Decoder that has been "
        "initialized without a built-in demuxer. Please use "
        "DecodeSurfaceFromPacket/DecodeFrameFromPacket instead or intialize "
        "the decoder with a demuxer when decoding from a file"
    ) == str(ei.value)
    with pytest.raises(RuntimeError, match="from demuxer instead"):
        r.width()


def test_decode_to_device_surface(test_mp4, gt):
    r = VideoReader(test_mp4)
    s = r.decode_single_surface()
    assert s is not None
    assert s.is_on_device
    assert s.format == PixelFormat.NV12
    assert s.width == gt["width"] and s.height == gt["height"]
    host = s.to_host()
    assert host.planes[0].shape == (gt["height"], gt["width"])


def test_motion_vectors(test_mp4):
    from videoprocessingframework_tpu.io import VideoDecoder

    d = FFmpegDemuxer(test_mp4)
    dec = VideoDecoder(CodecId.H264, threads=1, export_mvs=True)
    got_mvs = False
    for res in d:
        f = dec.decode_packet(res.packet, res.pkt_data)
        if f is not None:
            mvs = dec.motion_vectors()
            if mvs.size > 0:
                got_mvs = True
                assert mvs.dtype.names[:3] == ("source", "w", "h")
                break
    assert got_mvs


def test_decode_stderr_clean_of_sps_warnings(test_mp4):
    """The decoder gets Annex.B-form parameter sets at open (demuxer
    annexb_extradata), so libav never warns "non-existing SPS 0
    referenced in buffering period" — the BSF emits [SEI][SPS][PPS][IDR]
    per access unit and without extradata the buffering-period SEI
    arrives before the SPS (VERDICT r3: the MULTICHIP artifact tail)."""
    import subprocess
    import sys

    code = (
        "import os\n"
        "os.environ['VPF_TPU_FORCE_CPU'] = '1'\n"
        "import sys\n"
        f"sys.path.insert(0, {str(REPO / 'samples')!r})\n"
        "import utils\n"
        "from videoprocessingframework_tpu.io import (NativeDecodePool,\n"
        "    VideoReader)\n"
        "from videoprocessingframework_tpu.core.enums import PixelFormat\n"
        f"r = VideoReader({'PATH'!r})\n"
        "assert sum(1 for _ in r.frames()) > 0\n"
        f"p = NativeDecodePool([{'PATH'!r}], batch_size=4,\n"
        "    out_format=PixelFormat.YUV420, plane_major=True)\n"
        "assert p.acquire_planes() is not None\n"
        "p.release(); p.close()\n"
    ).replace("'PATH'", repr(test_mp4))
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "non-existing SPS" not in out.stderr
    assert "non-existing SPS" not in out.stdout
