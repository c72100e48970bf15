"""Grayscale (single-component) JPEG through the whole split MJPEG
stack: device encode (fDCT/quant), host entropy pack, entropy round
trip, libav cross-check, MjpegReader fused decode (Y source in
decode_postproc), and MjpegTranscoder gray→gray. The reference's engine
path decodes grayscale JPEG the same way (cudaVideoCodec_JPEG);
grayscale MJPEG is common in industrial/IR camera streams."""

import numpy as np
import pytest

from videoprocessingframework_tpu.core.enums import CodecId, PixelFormat
from videoprocessingframework_tpu.io import MjpegReader, MjpegTranscoder
from videoprocessingframework_tpu.io.decoder import VideoDecoder
from videoprocessingframework_tpu.io.jpeg import JpegCoefDecoder, JpegCoefEncoder
from videoprocessingframework_tpu.ops import jpeg as J

W, H = 157, 123  # odd both ways: gray has no sampling size constraints
N = 3


def _plane(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, h, w), np.uint8)


def _smooth_plane(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return np.clip(
        (yy + xx) * 255 / (h + w) + rng.normal(0, 3, (n, h, w)), 0, 255
    ).astype(np.uint8)


def _mk_clip(path, n=N, seed=4, quality=88):
    """Raw grayscale MJPEG written via the split encoder."""
    enc = J.JpegDeviceEncoder(H, W, quality=quality, subsampled="gray")
    ce = JpegCoefEncoder(W, H, quant_tables=enc.quant_tables,
                         subsampled="gray")
    y = _smooth_plane(n, H, W, seed)
    (cy,) = (np.asarray(c) for c in enc.encode_planes(y))
    with open(path, "wb") as f:
        for i in range(n):
            f.write(ce.encode(cy[i]))
    return y


def test_gray_geometry():
    g = J.encode_geometry(H, W, "gray")
    (bhy, bwy), chroma, (h, w), sampling = g
    assert sampling == "gray"
    assert (bhy, bwy) == ((H + 7) // 8, (W + 7) // 8)
    assert chroma == (0, 0)
    assert (h, w) == (H, W)


def test_gray_device_forward_matches_golden():
    y = _plane(N, H, W)
    enc = J.JpegDeviceEncoder(H, W, quality=85, subsampled="gray")
    (got,) = (np.asarray(c) for c in enc.encode_planes(y))
    ql, _qc = enc.quant_tables
    (want,) = J.golden_encode((y,), (ql,), enc.geometry)
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1


def test_gray_entropy_roundtrip_and_libav():
    y = _plane(1, H, W, seed=2)
    enc = J.JpegDeviceEncoder(H, W, quality=82, subsampled="gray")
    (cy,) = (np.asarray(c) for c in enc.encode_planes(y))
    ce = JpegCoefEncoder(W, H, quant_tables=enc.quant_tables,
                         subsampled="gray")
    jpg = ce.encode(cy[0])

    # our own entropy decoder: bit-exact coefficients, single component
    dec = JpegCoefDecoder()
    (ry,) = dec.decode(jpg)
    assert np.array_equal(ry, cy[0])
    assert int(dec.info.ncomp) == 1
    assert (dec.info.hs[0], dec.info.vs[0]) == (1, 1)

    # libav independently reconstructs to within 1 of the float64 golden
    vdec = VideoDecoder(CodecId.MJPEG, threads=1)
    frames = []
    f = vdec.decode_packet(np.frombuffer(jpg, np.uint8))
    if f is not None:
        frames.append(f)
    while True:
        f = vdec.flush_frame()
        if f is None:
            break
        frames.append(f)
    assert len(frames) == 1
    f = frames[0]
    assert f.format == PixelFormat.Y
    ly = f.data[: W * H].reshape(H, W)
    ql, _qc = enc.quant_tables
    (gy,) = J.golden_decode((cy[0],), (ql,), enc.geometry)
    assert np.abs(gy.astype(int) - ly.astype(int)).max() <= 1


def test_gray_reader_planes_and_fused_rgb(tmp_path):
    """MjpegReader drives decode_postproc with a Y source — planes mode
    yields the single luma plane; fused RGB replicates it (neutral
    chroma: R=G=B=Y in full-range BT.601)."""
    p = tmp_path / "gray.mjpeg"
    _mk_clip(str(p))
    rd = MjpegReader(str(p), output="planes")
    assert (rd.height, rd.width) == (H, W)
    batch = next(iter(rd.batches()))
    assert len(batch) == 1
    y = np.asarray(batch[0])
    assert y.shape == (N, H, W)

    rd = MjpegReader(str(p), output="rgb_u8")
    rgb = np.concatenate([np.asarray(b) for b in rd.batches()], axis=0)
    assert rgb.shape == (N, H, W, 3)
    # all three channels carry the luma exactly
    assert np.array_equal(rgb[..., 0], y)
    assert np.array_equal(rgb[..., 1], y)
    assert np.array_equal(rgb[..., 2], y)


def test_gray_reader_resize(tmp_path):
    p = tmp_path / "grayr.mjpeg"
    _mk_clip(str(p))
    rd = MjpegReader(str(p), output="rgb_u8", out_size=(64, 96))
    rgb = np.concatenate([np.asarray(b) for b in rd.batches()], axis=0)
    assert rgb.shape == (N, 64, 96, 3)
    # neutral chroma survives the resize: channels stay identical
    assert np.array_equal(rgb[..., 0], rgb[..., 1])
    assert np.array_equal(rgb[..., 0], rgb[..., 2])


def test_gray_transcode_roundtrip(tmp_path):
    """gray→gray split transcode preserves the single component."""
    src = tmp_path / "srcg.mjpeg"
    _mk_clip(str(src))
    dst = tmp_path / "dstg.mjpeg"
    with MjpegTranscoder(str(src), str(dst), quality=90, batch=2) as t:
        st = t.run()
    assert st.frames == N
    dec = JpegCoefDecoder()
    dec.probe(dst.read_bytes())
    assert int(dec.info.ncomp) == 1
    rd = MjpegReader(str(dst), output="rgb_u8")
    rgb = np.concatenate([np.asarray(b) for b in rd.batches()], axis=0)
    assert rgb.shape == (N, H, W, 3)


def test_gray_transcode_resize(tmp_path):
    src = tmp_path / "srcgr.mjpeg"
    _mk_clip(str(src))
    dst = tmp_path / "dstgr.mjpeg"
    with MjpegTranscoder(
        str(src), str(dst), quality=85, out_size=(61, 77), batch=2
    ) as t:
        st = t.run()
    assert st.frames == N
    rd = MjpegReader(str(dst), output="planes")
    assert (rd.height, rd.width) == (61, 77)
    (y,) = next(iter(rd.batches()))
    assert np.asarray(y).shape[-2:] == (61, 77)


def test_gray_writer(tmp_path):
    """MjpegWriter in grayscale mode, raw and containered."""
    from videoprocessingframework_tpu.io import MjpegWriter

    y = _smooth_plane(N, H, W, seed=7)
    p = tmp_path / "w.mjpeg"
    with MjpegWriter(str(p), W, H, quality=90, sampling="gray") as wr:
        wr.write_planes(y)
    assert wr.frames_written == N
    rd = MjpegReader(str(p), output="planes")
    (got,) = next(iter(rd.batches()))
    # q90 round trip keeps smooth content close
    assert np.abs(
        np.asarray(got).astype(int) - y.astype(int)
    ).mean() < 4.0

    avi = tmp_path / "w.avi"
    with MjpegWriter(str(avi), W, H, sampling="gray",
                     container="avi") as wr:
        wr.write_planes(y)
    rd = MjpegReader(str(avi), output="planes")
    assert (rd.height, rd.width) == (H, W)


def test_gray_validation():
    enc = J.JpegDeviceEncoder(H, W, subsampled="gray")
    y = _plane(1, H, W)
    with pytest.raises(ValueError, match="expected 1 planes"):
        enc.encode_planes(y, y, y)
    ce = JpegCoefEncoder(W, H, subsampled="gray")
    with pytest.raises(ValueError, match="expected 1 coefficient"):
        ce.encode(np.zeros((4, 64), np.int16), np.zeros((4, 64), np.int16),
                  np.zeros((4, 64), np.int16))
    enc3 = J.JpegDeviceEncoder(128, 128)
    with pytest.raises(ValueError, match="expected 3 planes"):
        enc3.encode_planes(y)


def test_gray_encode_rgb():
    """RGB → gray coefficients in one program (odd target sizes OK)."""
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (2, 200, 320, 3), np.uint8)
    enc = J.JpegDeviceEncoder(H, W, quality=90, subsampled="gray")
    (cy,) = (np.asarray(c) for c in enc.encode_rgb(rgb))
    g = J.encode_geometry(H, W, "gray")
    assert cy.shape == (2, g[0][0] * g[0][1], 64)

    # golden: resize+RGB→Y via the fused helpers' own float64 anchors
    from videoprocessingframework_tpu.ops.fused import encode_feed_gray

    y = np.asarray(encode_feed_gray(rgb, out_h=H, out_w=W))
    ql, _ = enc.quant_tables
    (want,) = J.golden_encode((y,), (ql,), g)
    assert np.abs(cy.astype(int) - want.astype(int)).max() <= 1
