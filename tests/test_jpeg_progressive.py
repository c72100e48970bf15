"""Progressive (SOF2) JPEG through the split codec (VERDICT r3 next #8).

Correctness lever: progressive vs baseline mode only changes the
*entropy-coding arrangement* — the quantized DCT coefficients of an
image encoded twice by the same encoder (same quality/subsampling) are
identical. So every test encodes one image both ways with Pillow
(libjpeg) and requires the split decoder's coefficient output to be
bit-equal between the two, which pins the whole multi-scan machinery
(DC first/refine, AC first/refine, EOB runs, ZRL, restart markers,
non-interleaved grids) against the already-ULP-gated baseline path.

An independent pixel-level cross-check decodes a 4:4:4 progressive
image with Pillow's own libjpeg pixel path and compares it against our
float64 golden IDCT.
"""

import io

import numpy as np
import pytest

PIL = pytest.importorskip("PIL.Image")

from videoprocessingframework_tpu.io.jpeg import JpegCoefDecoder  # noqa: E402
from videoprocessingframework_tpu.ops import jpeg as J  # noqa: E402


def _encode_pair(img: np.ndarray, **kw) -> tuple[bytes, bytes]:
    mode = "L" if img.ndim == 2 else "RGB"
    pim = PIL.fromarray(img, mode)
    base, prog = io.BytesIO(), io.BytesIO()
    pim.save(base, "JPEG", **kw)
    pim.save(prog, "JPEG", progressive=True, **kw)
    return base.getvalue(), prog.getvalue()


def _coeffs(data: bytes):
    dec = JpegCoefDecoder()
    out = dec.decode(np.frombuffer(data, np.uint8))
    return dec, [c.copy() for c in out]


def _assert_pair_equal(img, **kw):
    base, prog = _encode_pair(img, **kw)
    db, cb = _coeffs(base)
    dp, cp = _coeffs(prog)
    assert not db.info.progressive and dp.info.progressive
    assert db.info.ncomp == dp.info.ncomp
    for c, (a, b) in enumerate(zip(cb, cp)):
        assert np.array_equal(a, b), f"component {c} coefficients differ"
    return dp


def _texture(h, w, seed=0, noise=8.0):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            127 + 80 * np.sin(x / 17) + 40 * np.cos(y / 11),
            127 + 60 * np.cos(x / 23 + 1) + 50 * np.sin(y / 7),
            127 + 70 * np.sin((x + y) / 19),
        ],
        -1,
    )
    return np.clip(img + rng.normal(0, noise, img.shape), 0, 255).astype(
        np.uint8
    )


@pytest.mark.parametrize(
    "sub,name", [(2, "420"), (1, "422"), (0, "444")]
)
def test_progressive_coeffs_match_baseline(sub, name):
    _assert_pair_equal(_texture(120, 200), quality=85, subsampling=sub)


def test_progressive_grayscale_odd_dims():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (45, 63), np.uint8)
    dp = _assert_pair_equal(img, quality=92)
    assert dp.info.ncomp == 1


def test_progressive_quality_extremes():
    """q=98 noise drives deep refinement scans and long AC codes; q=10
    smooth drives maximal EOB runs."""
    rng = np.random.default_rng(2)
    noise = rng.integers(0, 256, (64, 64, 3), np.uint8)
    _assert_pair_equal(noise, quality=98, subsampling=0)
    _assert_pair_equal(noise, quality=10, subsampling=2)
    y, x = np.mgrid[0:480, 0:640]
    smooth = np.clip(127 + 60 * np.sin(x / 50) + 60 * np.cos(y / 40), 0, 255)
    _assert_pair_equal(
        np.stack([smooth] * 3, -1).astype(np.uint8),
        quality=75, subsampling=2,
    )


def test_progressive_partial_mcu_edges():
    """Odd dims: the non-interleaved AC-scan grid (T.81 A.2.2 ceil dims)
    is narrower than the MCU-padded output grid — padding blocks must
    stay zero and real blocks land at the right strides."""
    _assert_pair_equal(_texture(57, 41, seed=3), quality=85, subsampling=2)
    _assert_pair_equal(_texture(57, 41, seed=3), quality=85, subsampling=1)


def test_progressive_restart_markers():
    """RSTn inside progressive scans: DC predictors and EOB runs reset
    per interval in every scan type."""
    img = _texture(57, 41, seed=4)
    try:
        _assert_pair_equal(img, quality=85, subsampling=2,
                           restart_marker_rows=1)
        _assert_pair_equal(img, quality=85, subsampling=2,
                           restart_marker_blocks=3)
    except TypeError:
        pytest.skip("Pillow without restart_marker_* kwargs")


def test_progressive_pixels_vs_golden_idct():
    """Independent pixel cross-check: Pillow's own (libjpeg) decode of a
    4:4:4 progressive image vs our float64 golden dequant+IDCT of the
    split decoder's coefficients. libjpeg's fixed-point islow IDCT sits
    within ±1 of the exact transform (±2 tolerance for safety)."""
    img = _texture(96, 128, seed=5)
    _, prog = _encode_pair(img, quality=90, subsampling=0)
    dec, coeffs = _coeffs(prog)
    im = PIL.open(io.BytesIO(prog))
    im.draft("YCbCr", im.size)  # native YCbCr out of libjpeg, no CSC
    pix = np.asarray(im)

    qt = [np.array(dec.info.qt[c][:64], np.uint16) for c in range(3)]
    geo = (
        (int(dec.info.bh[0]), int(dec.info.bw[0])),
        (int(dec.info.bh[1]), int(dec.info.bw[1])),
        (96, 128),
        "444",
    )
    gy, gu, gv = J.golden_decode(coeffs, qt, geo)
    for ours, ref in ((gy, pix[..., 0]), (gu, pix[..., 1]),
                      (gv, pix[..., 2])):
        d = np.abs(ours.astype(int) - ref.astype(int))
        assert d.max() <= 2 and d.mean() < 0.5, (d.max(), d.mean())


def test_progressive_through_device_pipeline():
    """End-to-end: progressive coefficients through JpegDevicePipeline
    match the float64 golden ≤1 ULP (same gate the baseline path has)."""
    img = _texture(64, 80, seed=6)
    _, prog = _encode_pair(img, quality=85, subsampling=2)
    dec, coeffs = _coeffs(prog)
    qt = [np.array(dec.info.qt[c][:64], np.uint16) for c in range(3)]
    geo = (
        (int(dec.info.bh[0]), int(dec.info.bw[0])),
        (int(dec.info.bh[1]), int(dec.info.bw[1])),
        (64, 80),
        "420",
    )
    gy, gu, gv = J.golden_decode(coeffs, qt, geo)

    pipe = J.JpegDevicePipeline(dec.info, output="planes")
    y, u, v = (np.asarray(p) for p in pipe(
        coeffs[0][None], coeffs[1][None], coeffs[2][None]
    ))
    assert np.abs(y[0].astype(int) - gy.astype(int)).max() <= 1
    assert np.abs(u[0].astype(int) - gu.astype(int)).max() <= 1
    assert np.abs(v[0].astype(int) - gv.astype(int)).max() <= 1
