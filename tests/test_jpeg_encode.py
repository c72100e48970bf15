"""TPU-split MJPEG *encoder*: device fDCT/quant (ops/jpeg.py
JpegDeviceEncoder) + host entropy packing (io/native/jpeg.cpp
vpf_jpeg_encode) + MjpegWriter end-to-end.

Correctness chain: the entropy coder round-trips coefficients BIT-EXACTLY
through our own entropy decoder; the emitted files decode in libav to
within ≤1 of the float64 golden reconstruction of those coefficients; and
the full writer→reader loop holds PSNR appropriate to the quality factor.
Reference analog: NvEncoder's device-fed bitstream path
(src/TC/src/NvEncoder.cpp:360-425)."""

import numpy as np
import pytest

from videoprocessingframework_tpu.core.enums import CodecId, PixelFormat
from videoprocessingframework_tpu.io import MjpegReader, MjpegWriter
from videoprocessingframework_tpu.io.decoder import VideoDecoder
from videoprocessingframework_tpu.io.jpeg import JpegCoefDecoder, JpegCoefEncoder
from videoprocessingframework_tpu.ops import jpeg as J

W, H = 160, 128
N = 3


def _gradient_rgb(n, h, w, seed=0):
    """Smooth-ish natural-statistics frames (noise is adversarial for
    JPEG; gradients give meaningful PSNR)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        (yy * 255 / h)[..., None] * np.array([1.0, 0.6, 0.3])
        + (xx * 255 / w)[..., None] * np.array([0.0, 0.4, 0.7])
    ) / 2
    out = base[None] + rng.normal(0, 4, (n, h, w, 3))
    return np.clip(out, 0, 255).astype(np.uint8)


def _planes(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, (n, h, w), np.uint8)
    u = rng.integers(0, 256, (n, h // 2, w // 2), np.uint8)
    v = rng.integers(0, 256, (n, h // 2, w // 2), np.uint8)
    return y, u, v


def test_forward_basis_inverts_decode_basis():
    a = J.fdct_quant_basis(np.ones(64))
    b = J.dequant_idct_basis(np.ones(64))
    assert np.abs(a @ b - np.eye(64)).max() < 1e-12


def test_std_quant_tables():
    # q=50 is the Annex K base (scale 100); zigzag order starts at the
    # DC entries 16 / 17
    ql, qc = J.std_quant_tables(50)
    assert ql[0] == 16 and qc[0] == 17
    # monotonic: higher quality → finer steps
    ql90, _ = J.std_quant_tables(90)
    ql10, _ = J.std_quant_tables(10)
    assert (ql90 <= ql).all() and (ql10 >= ql).all()
    assert ql90.min() >= 1 and ql10.max() <= 255


def test_device_forward_matches_golden():
    y, u, v = _planes(N, H, W)
    enc = J.JpegDeviceEncoder(H, W, quality=85)
    got = tuple(np.asarray(c) for c in enc.encode_planes(y, u, v))
    ql, qc = enc.quant_tables
    want = J.golden_encode((y, u, v), (ql, qc, qc), enc.geometry)
    for g, w_ in zip(got, want):
        assert g.dtype == np.int16
        assert np.abs(g.astype(np.int32) - w_.astype(np.int32)).max() <= 1


@pytest.mark.parametrize("restart", [0, 5])
def test_entropy_roundtrip_bit_exact(restart):
    """encode → our entropy decoder → identical coefficients, identical
    quant tables, with and without restart markers."""
    y, u, v = _planes(1, H, W, seed=2)
    enc = J.JpegDeviceEncoder(H, W, quality=80)
    cy, cu, cv = (np.asarray(c) for c in enc.encode_planes(y, u, v))
    ce = JpegCoefEncoder(
        W, H, quant_tables=enc.quant_tables, restart_interval=restart
    )
    jpg = ce.encode(cy[0], cu[0], cv[0])
    assert jpg[:2] == b"\xff\xd8" and jpg[-2:] == b"\xff\xd9"

    dec = JpegCoefDecoder()
    ry, ru, rv = dec.decode(jpg)
    assert np.array_equal(ry, cy[0])
    assert np.array_equal(ru, cu[0])
    assert np.array_equal(rv, cv[0])
    info = dec.info
    assert (info.width, info.height) == (W, H)
    assert info.restart_interval == restart
    ql, qc = enc.quant_tables
    assert np.array_equal(np.array(info.qt[0][:64], np.uint16), ql)
    assert np.array_equal(np.array(info.qt[1][:64], np.uint16), qc)


def test_libav_decodes_our_bitstream():
    """libav's independent decoder reconstructs our file to within ≤1 of
    the float64 golden of the coefficients we serialized."""
    y, u, v = _planes(1, H, W, seed=3)
    enc = J.JpegDeviceEncoder(H, W, quality=90)
    cy, cu, cv = (np.asarray(c) for c in enc.encode_planes(y, u, v))
    ce = JpegCoefEncoder(W, H, quant_tables=enc.quant_tables)
    jpg = ce.encode(cy[0], cu[0], cv[0])

    dec = VideoDecoder(CodecId.MJPEG, threads=1)
    frames = []
    f = dec.decode_packet(np.frombuffer(jpg, np.uint8))
    if f is not None:
        frames.append(f)
    while True:
        f = dec.flush_frame()
        if f is None:
            break
        frames.append(f)
    assert len(frames) == 1
    f = frames[0]
    ysz = W * H
    ry = f.data[:ysz].reshape(H, W)
    if f.format == PixelFormat.NV12:
        uv = f.data[ysz:].reshape(H // 2, W)
        ru, rv = uv[:, 0::2], uv[:, 1::2]
    else:
        csz = (W // 2) * (H // 2)
        ru = f.data[ysz:ysz + csz].reshape(H // 2, W // 2)
        rv = f.data[ysz + csz:].reshape(H // 2, W // 2)

    ql, qc = enc.quant_tables
    gy, gu, gv = J.golden_decode(
        (cy[0], cu[0], cv[0]), (ql, qc, qc), enc.geometry
    )
    assert np.abs(gy.astype(int) - ry.astype(int)).max() <= 1
    assert np.abs(gu.astype(int) - ru.astype(int)).max() <= 1
    assert np.abs(gv.astype(int) - rv.astype(int)).max() <= 1


def test_writer_reader_roundtrip(tmp_path):
    """Full split loop: RGB → device encode → entropy pack → raw MJPEG →
    split decode → RGB. PSNR sane for q95; quality knob is monotonic in
    both bytes and fidelity."""
    frames = _gradient_rgb(N, H, W)
    sizes, psnrs = {}, {}
    for q in (35, 95):
        p = tmp_path / f"clip_q{q}.mjpeg"
        with MjpegWriter(str(p), W, H, quality=q) as wr:
            wr.write_rgb(frames)
        assert wr.frames_written == N
        sizes[q] = p.stat().st_size
        rd = MjpegReader(str(p), output="rgb_u8")
        assert (rd.width, rd.height) == (W, H)
        got = np.concatenate([np.asarray(b) for b in rd.batches()], axis=0)
        assert got.shape == frames.shape
        err = got.astype(np.float64) - frames.astype(np.float64)
        psnrs[q] = 10 * np.log10(255.0**2 / (err**2).mean())
    assert sizes[35] < sizes[95]
    assert psnrs[95] > psnrs[35]
    assert psnrs[95] > 36.0


def test_writer_container_avi(tmp_path):
    frames = _gradient_rgb(2, H, W, seed=5)
    p = tmp_path / "clip.avi"
    with MjpegWriter(str(p), W, H, quality=90, container="avi") as wr:
        wr.write_rgb(frames)
    rd = MjpegReader(str(p), output="rgb_u8")
    got = np.concatenate([np.asarray(b) for b in rd.batches()], axis=0)
    assert got.shape == frames.shape


def test_writer_resizes_in_program(tmp_path):
    """Device resize (encode_feed) fuses into the encode program: feed
    frames larger than the target."""
    frames = _gradient_rgb(2, H * 2, W * 2, seed=6)
    p = tmp_path / "resized.mjpeg"
    with MjpegWriter(str(p), W, H, quality=90) as wr:
        wr.write_rgb(frames)
    rd = MjpegReader(str(p), output="rgb_u8")
    got = np.concatenate([np.asarray(b) for b in rd.batches()], axis=0)
    assert got.shape == (2, H, W, 3)


def test_yuv444_roundtrip():
    """4:4:4 (odd dimensions exercise MCU edge padding) round-trips
    bit-exactly through the entropy layer and decodes in libav."""
    h, w = 53, 75
    rng = np.random.default_rng(7)
    y, u, v = (
        rng.integers(0, 256, (1, h, w), np.uint8) for _ in range(3)
    )
    enc = J.JpegDeviceEncoder(h, w, quality=85, subsampled=False)
    cy, cu, cv = (np.asarray(c) for c in enc.encode_planes(y, u, v))
    ce = JpegCoefEncoder(
        w, h, quant_tables=enc.quant_tables, subsampled=False
    )
    jpg = ce.encode(cy[0], cu[0], cv[0])
    dec = JpegCoefDecoder()
    ry, ru, rv = dec.decode(jpg)
    assert np.array_equal(ry, cy[0])
    assert np.array_equal(ru, cu[0])
    assert np.array_equal(rv, cv[0])
    assert (dec.info.width, dec.info.height) == (w, h)
    assert [dec.info.hs[c] for c in range(3)] == [1, 1, 1]


def test_encoder_validation():
    with pytest.raises(ValueError):
        J.JpegDeviceEncoder(121, 160)  # odd 4:2:0
    enc = J.JpegDeviceEncoder(H, W, subsampled=False)
    with pytest.raises(ValueError, match="4:4:4"):
        enc.encode_rgb(np.zeros((1, H, W, 3), np.uint8))
    ce = JpegCoefEncoder(W, H)
    bad = np.zeros((3, 64), np.int16)
    with pytest.raises(ValueError, match="coefficient shape"):
        ce.encode(bad, bad, bad)
