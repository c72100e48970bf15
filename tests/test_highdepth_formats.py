"""High-bit-depth and alternate chroma formats: 10-bit HEVC round trip
(encode P10 → decode P10 → convert to NV12), 4:4:4 encode/decode, and the
transfer helpers."""

import numpy as np
import pytest

from videoprocessingframework_tpu.core.enums import CodecId, PixelFormat
from videoprocessingframework_tpu.core.surface import Surface
from videoprocessingframework_tpu.io import VideoEncoder, VideoReader
from videoprocessingframework_tpu.ops import golden
from videoprocessingframework_tpu.ops.convert import SurfaceConverter

W, H = 128, 96
RNG = np.random.default_rng(11)


def _p10_frame(i: int) -> np.ndarray:
    """Packed P010-style frame: 10-bit samples, MSB-aligned in uint16."""
    y = ((np.arange(H)[:, None] * 4 + np.arange(W)[None, :] + i * 11) % 1024)
    uv = np.full((H // 2, W), 512, np.uint16)
    y16 = (y.astype(np.uint16) << 6)
    uv16 = uv << 6
    return np.concatenate([y16.ravel(), uv16.ravel()]).view(np.uint8)


def test_p10_hevc_round_trip(tmp_path):
    enc = VideoEncoder(
        {"codec": "hevc", "preset": "P1", "s": f"{W}x{H}",
         "fmt": "YUV420_10bit", "constqp": "1"}
    )
    assert enc.format == PixelFormat.P10
    assert enc.frame_size_in_bytes() == W * H * 3
    stream = bytearray()
    frames_in = []
    for i in range(4):
        f = _p10_frame(i)
        frames_in.append(f)
        out = enc.encode(f, sync=True)
        if out:
            stream += out[0].tobytes()
    for pkt, _ in enc.flush():
        stream += pkt.tobytes()
    path = tmp_path / "p10.h265"
    path.write_bytes(bytes(stream))

    r = VideoReader(str(path))
    decoded = list(r.frames())
    assert len(decoded) == 4
    f0 = decoded[0]
    assert f0.format == PixelFormat.P10
    assert f0.data.nbytes == W * H * 3
    # near-lossless at qp 1: MSB-aligned 10-bit values round-trip closely
    got_y = f0.data.view(np.uint16)[: W * H].reshape(H, W)
    want_y = frames_in[0].view(np.uint16)[: W * H].reshape(H, W)
    assert np.abs(got_y.astype(int) - want_y.astype(int)).mean() < 256

    # P10 → NV12 conversion on the decoded surface
    s = f0.to_surface()
    conv = SurfaceConverter(W, H, PixelFormat.P10, PixelFormat.NV12)
    nv12 = conv.run(s)
    want8 = golden.p16_to_8bit(np.asarray(s.planes[0]))
    assert np.abs(
        np.asarray(nv12.planes[0]).astype(int) - want8.astype(int)
    ).max() <= 1


def test_yuv444_hevc_round_trip(tmp_path):
    enc = VideoEncoder(
        {"codec": "hevc", "preset": "P1", "s": f"{W}x{H}", "fmt": "YUV444",
         "constqp": "1"}
    )
    frame = RNG.integers(0, 256, (W * H * 3,), dtype=np.uint8)
    stream = bytearray()
    for i in range(3):
        out = enc.encode(frame, sync=True)
        if out:
            stream += out[0].tobytes()
    for pkt, _ in enc.flush():
        stream += pkt.tobytes()
    path = tmp_path / "yuv444.h265"
    path.write_bytes(bytes(stream))

    r = VideoReader(str(path))
    decoded = list(r.frames())
    assert len(decoded) == 3
    assert decoded[0].format == PixelFormat.YUV444
    assert decoded[0].data.nbytes == W * H * 3


def test_10bit_requires_hevc():
    enc = VideoEncoder(
        {"codec": "h264", "preset": "P1", "s": f"{W}x{H}", "fmt": "P10"}
    )
    with pytest.raises(Exception, match="10-bit input requires"):
        enc.encode(_p10_frame(0), sync=True)


def test_transfer_helpers():
    from videoprocessingframework_tpu.interop.transfer import (
        DoubleBufferedUploader,
        FrameUploader,
        SurfaceDownloader,
    )

    frame = RNG.integers(0, 256, (W * H * 3 // 2,), dtype=np.uint8)
    up = FrameUploader(W, H, PixelFormat.NV12)
    surf = up(frame)
    assert surf.is_on_device
    down = SurfaceDownloader(W, H, PixelFormat.NV12)
    out = down(surf)
    np.testing.assert_array_equal(out, frame)

    dbuf = DoubleBufferedUploader(depth=2)
    got = []
    for i in range(5):
        r = dbuf.put(np.full((4, 4), i, np.uint8))
        if r is not None:
            got.append(int(np.asarray(r)[0, 0]))
    got += [int(np.asarray(r)[0, 0]) for r in dbuf.drain()]
    assert got == [0, 1, 2, 3, 4]


def test_gray12_encode_decode_roundtrip():
    """12-bit gray path: MSB-aligned u16 frames → hevc gray12le → decode →
    MSB-aligned u16 (reference GRAY12LE analog, FfmpegSwDecoder.cpp:141-252)."""
    from videoprocessingframework_tpu.core.enums import CodecId, PixelFormat
    from videoprocessingframework_tpu.io import VideoEncoder
    from videoprocessingframework_tpu.io.decoder import VideoDecoder

    W, H, N = 320, 240, 6
    rng = np.random.default_rng(11)
    frames = []
    ys = np.arange(H, dtype=np.uint32)[:, None]
    xs = np.arange(W, dtype=np.uint32)[None, :]
    for i in range(N):
        f12 = ((ys * 16 + xs * 4 + i * 101) % 4096).astype(np.uint16)
        frames.append((f12 << 4).astype(np.uint16))  # MSB-aligned

    enc = VideoEncoder(
        {"codec": "hevc", "fmt": "GRAY12", "s": f"{W}x{H}",
         "preset": "P1", "bitrate": "4M", "gop": "3", "qmin": "1",
         "qmax": "10"}
    )
    packets = []
    for f in frames:
        out = enc.encode(f.view(np.uint8).ravel())
        if out is not None:
            packets.append(out[0])
    packets.extend(p for p, _ in enc.flush())

    dec = VideoDecoder(CodecId.HEVC)
    got = []
    buf = np.empty(W * H * 2, np.uint8)
    for pkt in packets:
        f = dec.decode_packet(pkt, out=buf)
        if f is not None:
            assert f.format == PixelFormat.GRAY12
            got.append(buf.view(np.uint16).reshape(H, W).copy())
    while dec.flush_frame(out=buf) is not None:
        got.append(buf.view(np.uint16).reshape(H, W).copy())
    assert len(got) == N
    for orig, rec in zip(frames, got):
        # lossy codec: check 12-bit PSNR is sane, and the MSB alignment
        err = orig.astype(np.float64) - rec.astype(np.float64)
        psnr = 10 * np.log10(65535.0**2 / max((err ** 2).mean(), 1e-9))
        assert psnr > 40, psnr
        assert (rec & 0xF).max() == 0  # MSB-aligned 12-bit payload


def test_yuv444_10bit_hevc_round_trip(tmp_path):
    """YUV444_10bit encode input (reference PyNvEncoder.cpp:204-221):
    MSB-aligned 16-bit planar 4:4:4 → yuv444p10 hevc → decode back to the
    same packed layout, near-lossless at qp 1."""
    enc = VideoEncoder(
        {"codec": "hevc", "preset": "P1", "s": f"{W}x{H}",
         "fmt": "YUV444_10bit", "constqp": "1"}
    )
    assert enc.format == PixelFormat.YUV444_10bit
    assert enc.frame_size_in_bytes() == W * H * 6
    frames_in = []
    stream = bytearray()
    for i in range(4):
        planes = (
            (np.arange(H * W * 3, dtype=np.uint32).reshape(3, H, W) * 7
             + i * 13) % 1024
        ).astype(np.uint16) << 6
        f = planes.ravel().view(np.uint8)
        frames_in.append(f)
        out = enc.encode(f, sync=True)
        if out:
            stream += out[0].tobytes()
    for pkt, _ in enc.flush():
        stream += pkt.tobytes()
    path = tmp_path / "y444_10.h265"
    path.write_bytes(bytes(stream))

    r = VideoReader(str(path))
    decoded = list(r.frames())
    assert len(decoded) == 4
    f0 = decoded[0]
    assert f0.format == PixelFormat.YUV444_10bit
    assert f0.data.nbytes == W * H * 6
    got = f0.data.view(np.uint16).reshape(3, H, W)
    want = frames_in[0].view(np.uint16).reshape(3, H, W)
    assert np.abs(got.astype(int) - want.astype(int)).mean() < 256


def test_yuv444_10bit_requires_hevc():
    enc = VideoEncoder(
        {"codec": "h264", "preset": "P1", "s": f"{W}x{H}",
         "fmt": "YUV444_10bit"}
    )
    with pytest.raises(Exception, match="hevc"):
        enc.encode(np.zeros(W * H * 6, np.uint8))
