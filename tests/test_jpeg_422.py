"""4:2:2 chroma sampling through the whole split MJPEG stack: device
encode (fDCT/quant), host entropy pack, entropy round trip, libav
cross-check, MjpegReader fused decode (YUV422 source in decode_postproc),
and MjpegTranscoder 422→422. 4:2:2 is the common camera/broadcast MJPEG
sampling (reference decodes it through the same engine path)."""

import numpy as np
import pytest

from videoprocessingframework_tpu.core.enums import CodecId, PixelFormat
from videoprocessingframework_tpu.io import MjpegReader, MjpegTranscoder
from videoprocessingframework_tpu.io.decoder import VideoDecoder
from videoprocessingframework_tpu.io.jpeg import JpegCoefDecoder, JpegCoefEncoder
from videoprocessingframework_tpu.ops import jpeg as J

W, H = 160, 126  # odd-ish height: 422 only needs even width
N = 3


def _planes422(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, (n, h, w), np.uint8)
    u = rng.integers(0, 256, (n, h, w // 2), np.uint8)
    v = rng.integers(0, 256, (n, h, w // 2), np.uint8)
    return y, u, v


def _smooth_planes422(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip((yy + xx) * 255 / (h + w) + rng.normal(0, 3, (n, h, w)),
                0, 255).astype(np.uint8)
    u = np.clip(128 + (xx[:, ::2] - w / 2) * 0.3
                + rng.normal(0, 2, (n, h, w // 2)), 0, 255).astype(np.uint8)
    v = np.clip(128 - (yy[:, ::2] - h / 2) * 0.3
                + rng.normal(0, 2, (n, h, w // 2)), 0, 255).astype(np.uint8)
    return y, u, v


def _mk_clip(path, n=N, seed=4, quality=88):
    """Raw MJPEG written via the split encoder in 4:2:2."""
    enc = J.JpegDeviceEncoder(H, W, quality=quality, subsampled="422")
    ce = JpegCoefEncoder(W, H, quant_tables=enc.quant_tables,
                         subsampled="422")
    y, u, v = _smooth_planes422(n, H, W, seed)
    cy, cu, cv = (np.asarray(c) for c in enc.encode_planes(y, u, v))
    with open(path, "wb") as f:
        for i in range(n):
            f.write(ce.encode(cy[i], cu[i], cv[i]))
    return (y, u, v)


def test_422_geometry():
    g = J.encode_geometry(H, W, "422")
    (bhy, bwy), (bhc, bwc), (h, w), sampling = g
    assert sampling == "422"
    assert (bhy, bwy) == ((H + 7) // 8, 2 * ((W + 15) // 16))
    assert (bhc, bwc) == ((H + 7) // 8, (W + 15) // 16)


def test_422_device_forward_matches_golden():
    y, u, v = _planes422(N, H, W)
    enc = J.JpegDeviceEncoder(H, W, quality=85, subsampled="422")
    got = tuple(np.asarray(c) for c in enc.encode_planes(y, u, v))
    ql, qc = enc.quant_tables
    want = J.golden_encode((y, u, v), (ql, qc, qc), enc.geometry)
    for g, w_ in zip(got, want):
        assert np.abs(g.astype(np.int32) - w_.astype(np.int32)).max() <= 1


def test_422_entropy_roundtrip_and_libav(tmp_path):
    y, u, v = _planes422(1, H, W, seed=2)
    enc = J.JpegDeviceEncoder(H, W, quality=82, subsampled="422")
    cy, cu, cv = (np.asarray(c) for c in enc.encode_planes(y, u, v))
    ce = JpegCoefEncoder(W, H, quant_tables=enc.quant_tables,
                         subsampled="422")
    jpg = ce.encode(cy[0], cu[0], cv[0])

    # our own entropy decoder: bit-exact coefficients + 2x1 sampling
    dec = JpegCoefDecoder()
    ry, ru, rv = dec.decode(jpg)
    assert np.array_equal(ry, cy[0])
    assert np.array_equal(ru, cu[0])
    assert np.array_equal(rv, cv[0])
    assert [dec.info.hs[c] for c in range(3)] == [2, 1, 1]
    assert [dec.info.vs[c] for c in range(3)] == [1, 1, 1]

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
    assert f.format == PixelFormat.YUV422
    ysz = W * H
    csz = (W // 2) * H
    ly = f.data[:ysz].reshape(H, W)
    lu = f.data[ysz:ysz + csz].reshape(H, W // 2)
    lv = f.data[ysz + csz:].reshape(H, W // 2)
    ql, qc = enc.quant_tables
    gy, gu, gv = J.golden_decode(
        (cy[0], cu[0], cv[0]), (ql, qc, qc), enc.geometry
    )
    assert np.abs(gy.astype(int) - ly.astype(int)).max() <= 1
    assert np.abs(gu.astype(int) - lu.astype(int)).max() <= 1
    assert np.abs(gv.astype(int) - lv.astype(int)).max() <= 1


def test_422_reader_fused_rgb(tmp_path):
    """MjpegReader drives decode_postproc with a YUV422 source — planes
    and fused RGB both match the float64 golden path."""
    p = tmp_path / "c422.mjpeg"
    _mk_clip(str(p))
    rd = MjpegReader(str(p), output="planes")
    assert (rd.height, rd.width) == (H, W)
    y, u, v = next(iter(rd.batches()))
    assert np.asarray(y).shape == (N, H, W)
    assert np.asarray(u).shape == (N, H, W // 2)

    rd = MjpegReader(str(p), output="rgb_u8")
    rgb = np.concatenate([np.asarray(b) for b in rd.batches()], axis=0)
    assert rgb.shape == (N, H, W, 3)

    # golden: decoded planes -> replicate chroma -> BT.601 full-range
    from videoprocessingframework_tpu.core.enums import ColorRange, ColorSpace
    from videoprocessingframework_tpu.ops.golden import ycbcr_to_rgb

    yg, ug, vg = (np.asarray(x) for x in (y, u, v))
    uu = np.repeat(ug, 2, axis=-1)[..., :W]
    vv = np.repeat(vg, 2, axis=-1)[..., :W]
    want = ycbcr_to_rgb(yg, uu, vv, ColorSpace.BT_601, ColorRange.JPEG)
    assert np.abs(rgb.astype(np.int32) - want.astype(np.int32)).max() <= 1


def test_422_reader_resize(tmp_path):
    p = tmp_path / "c422r.mjpeg"
    _mk_clip(str(p))
    rd = MjpegReader(str(p), output="rgb_u8", out_size=(64, 96))
    rgb = np.concatenate([np.asarray(b) for b in rd.batches()], axis=0)
    assert rgb.shape == (N, 64, 96, 3)


def test_422_transcode_roundtrip(tmp_path):
    """422→422 split transcode preserves sampling; output decodes."""
    src = tmp_path / "src422.mjpeg"
    _mk_clip(str(src))
    dst = tmp_path / "dst422.mjpeg"
    with MjpegTranscoder(str(src), str(dst), quality=90, batch=2) as t:
        st = t.run()
    assert st.frames == N
    dec = JpegCoefDecoder()
    dec.probe(dst.read_bytes())
    assert [dec.info.hs[c] for c in range(3)] == [2, 1, 1]
    rd = MjpegReader(str(dst), output="rgb_u8")
    rgb = np.concatenate([np.asarray(b) for b in rd.batches()], axis=0)
    assert rgb.shape == (N, H, W, 3)


def test_422_validation():
    with pytest.raises(ValueError, match="width must be even"):
        J.JpegDeviceEncoder(H, 75, subsampled="422")
    with pytest.raises(ValueError, match="width must be even"):
        JpegCoefEncoder(75, H, subsampled="422")
    with pytest.raises(ValueError, match="sampling"):
        J.JpegDeviceEncoder(H, W, subsampled="411")
