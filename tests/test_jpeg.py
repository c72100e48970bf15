"""TPU MJPEG path: host entropy decode (io/native/jpeg.cpp) + device
dequant/IDCT pipeline (ops/jpeg.py) + MjpegReader end-to-end.

Fidelity anchors: the float64 golden (exact math) and libav's full
software MJPEG decode (integer IDCT — agrees with the real-valued IDCT
to ≤1 in every u8 sample; the reference's GPU engine has the same
class of relationship to the spec IDCT)."""

import numpy as np
import pytest

from videoprocessingframework_tpu.core.enums import CodecId, PixelFormat
from videoprocessingframework_tpu.io import (
    StreamMuxer,
    VideoDecoder,
    VideoEncoder,
)
from videoprocessingframework_tpu.io.jpeg import (
    JpegCoefDecoder,
    JpegStreamError,
    MjpegReader,
)
from videoprocessingframework_tpu.ops import jpeg as J

W, H = 320, 240
N = 4


def _frames(n, w=W, h=H, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        y = rng.integers(0, 256, (h, w), np.uint8)
        u = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
        v = rng.integers(0, 256, (h // 2, w // 2), np.uint8)
        out.append((y, u, v))
    return out


def _encode(frames, w=W, h=H, q="8M"):
    enc = VideoEncoder({"codec": "mjpeg", "s": f"{w}x{h}", "bitrate": q})
    pkts = []
    for y, u, v in frames:
        got = enc.encode(
            np.concatenate([y.ravel(), u.ravel(), v.ravel()]), sync=True
        )
        if got is not None:
            pkts.append(got[0])
    pkts.extend(p for p, _ in enc.flush())
    return pkts


@pytest.fixture(scope="module")
def mjpeg_packets():
    return _encode(_frames(N))


@pytest.fixture(scope="module")
def libav_planes(mjpeg_packets):
    dec = VideoDecoder(CodecId.MJPEG, threads=1)
    out = []
    for pkt in mjpeg_packets:
        f = dec.decode_packet(pkt)
        if f is not None:
            out.append(f)
    while True:
        f = dec.flush_frame()
        if f is None:
            break
        out.append(f)
    planes = []
    for f in out:
        ysz = W * H
        y = f.data[:ysz].reshape(H, W).copy()
        if f.format == PixelFormat.NV12:
            uv = f.data[ysz:].reshape(H // 2, W)
            u, v = uv[:, 0::2].copy(), uv[:, 1::2].copy()
        else:
            csz = (W // 2) * (H // 2)
            u = f.data[ysz:ysz + csz].reshape(H // 2, W // 2).copy()
            v = f.data[ysz + csz:].reshape(H // 2, W // 2).copy()
        planes.append((y, u, v))
    return planes


def test_probe_geometry(mjpeg_packets):
    dec = JpegCoefDecoder()
    info = dec.probe(mjpeg_packets[0])
    assert (info.width, info.height, info.ncomp) == (W, H, 3)
    assert [info.hs[c] for c in range(3)] == [2, 1, 1]
    assert [info.vs[c] for c in range(3)] == [2, 1, 1]
    assert info.bw[0] * 8 >= W and info.bh[0] * 8 >= H
    # quant tables present and plausible
    q = np.array(info.qt[0][:64])
    assert q.min() >= 1 and q.max() <= 255


def test_entropy_decode_matches_libav(mjpeg_packets, libav_planes):
    """Golden (float64 dequant+IDCT of our coefficients) vs libav's full
    decode: ≤1 in every sample, every plane, every frame."""
    dec = JpegCoefDecoder()
    cy, cu, cv = dec.decode_batch(mjpeg_packets)
    info = dec.info
    qts = [np.array(info.qt[c][:64], np.uint16) for c in range(3)]
    geometry = (
        (int(info.bh[0]), int(info.bw[0])),
        (int(info.bh[1]), int(info.bw[1])),
        (H, W),
        True,
    )
    gy, gu, gv = J.golden_decode((cy, cu, cv), qts, geometry)
    for i, (ry, ru, rv) in enumerate(libav_planes):
        assert np.abs(gy[i].astype(int) - ry.astype(int)).max() <= 1
        assert np.abs(gu[i].astype(int) - ru.astype(int)).max() <= 1
        assert np.abs(gv[i].astype(int) - rv.astype(int)).max() <= 1


def test_device_pipeline_matches_golden(mjpeg_packets):
    """Jitted dequant+IDCT (planes mode) is ≤1 ULP from the float64
    golden (f32 MXU accumulation vs f64; rint boundary)."""
    dec = JpegCoefDecoder()
    cy, cu, cv = dec.decode_batch(mjpeg_packets)
    info = dec.info
    pipe = J.JpegDevicePipeline(info, output="planes")
    py, pu, pv = (np.asarray(a) for a in pipe(cy, cu, cv))
    qts = [np.array(info.qt[c][:64], np.uint16) for c in range(3)]
    gy, gu, gv = J.golden_decode((cy, cu, cv), qts, pipe.geometry)
    assert np.abs(py.astype(int) - gy.astype(int)).max() <= 1
    assert np.abs(pu.astype(int) - gu.astype(int)).max() <= 1
    assert np.abs(pv.astype(int) - gv.astype(int)).max() <= 1


def test_fused_rgb_output(mjpeg_packets):
    """Fused coefficients→resized-RGB runs in one program and agrees
    with the two-step path (device planes → decode_postproc)."""
    from videoprocessingframework_tpu.ops.fused import decode_postproc
    from videoprocessingframework_tpu.core.enums import (
        ColorRange,
        ColorSpace,
    )

    dec = JpegCoefDecoder()
    cy, cu, cv = dec.decode_batch(mjpeg_packets)
    info = dec.info
    fused = J.JpegDevicePipeline(
        info, out_size=(112, 112), output="rgb_u8"
    )
    rgb = np.asarray(fused(cy, cu, cv))
    assert rgb.shape == (N, 112, 112, 3) and rgb.dtype == np.uint8

    planes = J.JpegDevicePipeline(info, output="planes")
    y, u, v = planes(cy, cu, cv)
    rgb2 = np.asarray(
        decode_postproc(
            y, u, v,
            src_format=PixelFormat.YUV420,
            space=ColorSpace.BT_601,
            rng=ColorRange.JPEG,
            out_h=112,
            out_w=112,
            method="lanczos",
            output="rgb_u8",
        )
    )
    assert np.abs(rgb.astype(int) - rgb2.astype(int)).max() <= 1


def test_decoder_reuse_and_batch_copy_semantics(mjpeg_packets):
    """decode() returns copies: decoding the next frame must not mutate
    the previous result (internal scratch is reused)."""
    dec = JpegCoefDecoder()
    a0 = dec.decode(mjpeg_packets[0])
    snap = tuple(c.copy() for c in a0)
    dec.decode(mjpeg_packets[1])
    for got, want in zip(a0, snap):
        assert np.array_equal(got, want)


def test_geometry_change_reprobe():
    """A mid-stream geometry change transparently re-probes (growing)
    and slices (shrinking), like the video decoder's res-change path."""
    small = _encode(_frames(1, 160, 112, seed=1), 160, 112)
    big = _encode(_frames(1, 320, 240, seed=2), 320, 240)
    dec = JpegCoefDecoder()
    f_small = dec.decode(small[0])
    assert f_small[0].shape[0] == (160 // 16) * (112 // 16) * 4
    f_big = dec.decode(big[0])  # grows: ERR_DECODE → re-probe → retry
    assert f_big[0].shape[0] == (320 // 16) * (240 // 16) * 4
    f_small2 = dec.decode(small[0])  # shrinks: fits scratch, sliced
    assert np.array_equal(f_small2[0], f_small[0])


def test_unsupported_stream_raises():
    dec = JpegCoefDecoder()
    with pytest.raises(JpegStreamError):
        dec.probe(b"\x00\x01\x02\x03" * 10)
    # truncated-after-SOI stream
    with pytest.raises(JpegStreamError):
        dec.probe(b"\xff\xd8\xff\xdb\x00\x04\x00\x00")


def test_mjpeg_reader_end_to_end(tmp_path, mjpeg_packets, libav_planes):
    """Container → MjpegReader batches == libav planes (±1)."""
    path = str(tmp_path / "clip.avi")
    mux = StreamMuxer(path, CodecId.MJPEG, W, H, fps=30.0)
    for i, pkt in enumerate(mjpeg_packets):
        mux.write(pkt, pts=i)
    mux.close()

    rd = MjpegReader(path, output="planes", batch=3)
    assert (rd.width, rd.height) == (W, H)
    got = []
    for y, u, v in rd.frames():
        got.append((np.asarray(y), np.asarray(u), np.asarray(v)))
    assert len(got) == len(libav_planes)
    for (gy, gu, gv), (ry, ru, rv) in zip(got, libav_planes):
        assert np.abs(gy.astype(int) - ry.astype(int)).max() <= 1
        assert np.abs(gu.astype(int) - ru.astype(int)).max() <= 1
        assert np.abs(gv.astype(int) - rv.astype(int)).max() <= 1


def test_mjpeg_reader_fused_rgb(tmp_path, mjpeg_packets):
    path = str(tmp_path / "clip.avi")
    mux = StreamMuxer(path, CodecId.MJPEG, W, H, fps=30.0)
    for i, pkt in enumerate(mjpeg_packets):
        mux.write(pkt, pts=i)
    mux.close()

    rd = MjpegReader(path, out_size=(64, 64), output="rgb_u8", batch=8)
    batches = list(rd.batches())
    total = sum(b.shape[0] for b in batches)
    assert total == N
    assert batches[0].shape[1:] == (64, 64, 3)


def test_non_mjpeg_source_rejected(test_mp4):
    with pytest.raises(JpegStreamError):
        MjpegReader(test_mp4)
