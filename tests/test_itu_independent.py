"""Adversarial fidelity cross-check (VERDICT r3 weak #4).

Every ≤1-ULP converter claim in this repo is made against
``ops/colorspace.py``'s float64 matrices. This file derives the same
BT.601/709 × MPEG/JPEG math *independently*, straight from the ITU-R and
JFIF documents — scalar difference-equations with the documents' literal
constants, and numeric inversion instead of closed-form matrix algebra —
and asserts the framework's goldens agree. Two independent readings of
the standards now have to collide for the fidelity bar to pass.

Sources (constants spelled literally below):
  * ITU-R BT.601-7 §2.5.1-2.5.4: luma eq 0.299/0.587/0.114; color-diff
    normalisation divisors 1.772 (= 2(1-Kb)) and 1.402 (= 2(1-Kr));
    8-bit quantisation D'_Y = 219 E'_Y + 16, D'_C = 224 E'_C + 128.
  * ITU-R BT.709-6 §3.2-3.3: luma eq 0.2126/0.7152/0.0722; divisors
    1.8556 and 1.5748; same narrow 8-bit quantisation (§4.4).
  * JFIF 1.02 (full-range "JPEG" YCbCr): D'_Y = 255 E'_Y,
    D'_C = 255 E'_C + 128, BT.601 luma coefficients.

Also bounds analytically how far NPP's fixed-point NV12→RGB kernels
(reference TasksColorCvt.cpp:142-169, the four supported combos) can sit
from the exact real-valued ITU result — recorded in docs/fidelity.md.
"""

import numpy as np
import pytest

from videoprocessingframework_tpu.core.enums import ColorRange, ColorSpace
from videoprocessingframework_tpu.ops import colorspace as cs
from videoprocessingframework_tpu.ops import golden

# ---------------------------------------------------------------------------
# Independent scalar derivation (no matrix algebra shared with colorspace.py)
# ---------------------------------------------------------------------------

# (luma equation, colour-difference divisors) — literal document constants
_ITU = {
    ColorSpace.BT_601: ((0.299, 0.587, 0.114), 1.772, 1.402),
    ColorSpace.BT_709: ((0.2126, 0.7152, 0.0722), 1.8556, 1.5748),
}


def itu_forward_scalar(r, g, b, space: ColorSpace, rng: ColorRange):
    """(D'_Y, D'_CB, D'_CR) floats from 0..255 R'G'B' via the documents'
    per-sample equations (analog signals first, then 8-bit quantisation)."""
    (wr, wg, wb), db, dr = _ITU[space]
    # analog, 0..1
    er, eg, eb = r / 255.0, g / 255.0, b / 255.0
    ey = wr * er + wg * eg + wb * eb
    ecb = (eb - ey) / db
    ecr = (er - ey) / dr
    if rng == ColorRange.MPEG:  # BT.601 §2.5.4 / BT.709 §4.4 narrow 8-bit
        return 219.0 * ey + 16.0, 224.0 * ecb + 128.0, 224.0 * ecr + 128.0
    return 255.0 * ey, 255.0 * ecb + 128.0, 255.0 * ecr + 128.0  # JFIF 1.02


ALL_COMBOS = [
    (s, r)
    for s in (ColorSpace.BT_601, ColorSpace.BT_709)
    for r in (ColorRange.MPEG, ColorRange.JPEG)
]


def _rgb_grid():
    v = np.linspace(0.0, 255.0, 18)
    r, g, b = np.meshgrid(v, v, v, indexing="ij")
    return r.ravel(), g.ravel(), b.ravel()


@pytest.mark.parametrize("space,rng", ALL_COMBOS)
def test_forward_matrix_matches_itu_scalar_equations(space, rng):
    """ycbcr_from_rgb_matrix == the documents' scalar equations (1e-10)."""
    r, g, b = _rgb_grid()
    y0, cb0, cr0 = itu_forward_scalar(r, g, b, space, rng)
    m, off = cs.ycbcr_from_rgb_matrix(space, rng)
    got = m @ np.stack([r, g, b]) + off[:, None]
    want = np.stack([y0, cb0, cr0])
    assert np.abs(got - want).max() < 1e-10


@pytest.mark.parametrize("space,rng", ALL_COMBOS)
def test_inverse_matrix_matches_numeric_inversion(space, rng):
    """rgb_from_ycbcr_matrix == numpy.linalg.inv of the scalar-equation
    forward transform (evaluated at basis points — affine probing, no
    shared closed form)."""
    # probe the affine map ycbcr = A @ rgb + c at 0 and the axis points
    zero = np.array(itu_forward_scalar(0.0, 0.0, 0.0, space, rng))
    cols = []
    for axis in range(3):
        p = [0.0, 0.0, 0.0]
        p[axis] = 255.0
        cols.append(np.array(itu_forward_scalar(*p, space, rng)) - zero)
    a = np.stack(cols, axis=1) / 255.0
    c = zero
    a_inv = np.linalg.inv(a)  # rgb = A^-1 @ (ycbcr - c)

    m, off = cs.rgb_from_ycbcr_matrix(space, rng)
    # same functional form: rgb = M @ (ycbcr - off); compare on a grid
    yy = np.linspace(0.0, 255.0, 25)
    cc = np.linspace(0.0, 255.0, 25)
    y, cb, cr = np.meshgrid(yy, cc, cc, indexing="ij")
    x = np.stack([y.ravel(), cb.ravel(), cr.ravel()])
    assert np.abs(m @ (x - off[:, None]) - a_inv @ (x - c[:, None])).max() \
        < 1e-9


def test_jfif_published_rounded_constants():
    """Sanity anchor against the *published rounded* JFIF/IJG constants
    (JFIF 1.02 Annex; also the constants NPP documents for its 601
    full-range kernels): they must match our exact matrices to within
    their own printed precision."""
    m, off = cs.ycbcr_from_rgb_matrix(ColorSpace.BT_601, ColorRange.JPEG)
    published_fwd = np.array([
        [0.299, 0.587, 0.114],
        [-0.1687, -0.3313, 0.5],
        [0.5, -0.4187, -0.0813],
    ])
    assert np.abs(m - published_fwd).max() < 5e-5
    assert np.allclose(off, [0.0, 128.0, 128.0])

    mi, offi = cs.rgb_from_ycbcr_matrix(ColorSpace.BT_601, ColorRange.JPEG)
    published_inv = np.array([
        [1.0, 0.0, 1.402],
        [1.0, -0.344136, -0.714136],
        [1.0, 1.772, 0.0],
    ])
    assert np.abs(mi - published_inv).max() < 5e-7
    assert np.allclose(offi, [0.0, 128.0, 128.0])


def test_golden_u8_roundtrip_matches_scalar_path():
    """golden.ycbcr_to_rgb / rgb_to_ycbcr (the module every fidelity test
    trusts) agree with the scalar-equation path after u8 rounding — zero
    tolerance, every supported combo."""
    rng_ = np.random.default_rng(0)
    rgb = rng_.integers(0, 256, (64, 64, 3)).astype(np.float64)
    for space, rng in ALL_COMBOS:
        y, cb, cr = itu_forward_scalar(
            rgb[..., 0], rgb[..., 1], rgb[..., 2], space, rng
        )
        want = np.stack([y, cb, cr], -1)
        # golden.rgb_to_ycbcr returns unrounded float64 (so 4:2:0 can
        # average before quantisation) — compare pre-quantisation values
        got = golden.rgb_to_ycbcr(rgb.astype(np.uint8), space, rng)
        assert np.abs(got - want).max() < 1e-10, (space, rng)

        # inverse direction on the quantised ycbcr, vs the scalar-derived
        # numeric inverse (independent of cs.rgb_from_ycbcr_matrix)
        q = np.clip(np.rint(got), 0, 255).astype(np.uint8)
        zero = np.array(itu_forward_scalar(0.0, 0.0, 0.0, space, rng))
        cols = []
        for axis in range(3):
            p = [0.0, 0.0, 0.0]
            p[axis] = 255.0
            cols.append(np.array(itu_forward_scalar(*p, space, rng)) - zero)
        a_inv = np.linalg.inv(np.stack(cols, axis=1) / 255.0)
        exact = np.einsum(
            "ij,...j->...i", a_inv, q.astype(np.float64) - zero
        )
        want_back = np.clip(np.rint(exact), 0, 255)
        a_back = golden.ycbcr_to_rgb(
            q[..., 0], q[..., 1], q[..., 2], space, rng
        )
        assert np.array_equal(a_back.astype(np.float64), want_back), \
            (space, rng)


# ---------------------------------------------------------------------------
# NPP fixed-point deviation bound (docs/fidelity.md)
# ---------------------------------------------------------------------------

#: the four NV12→RGB combos the reference dispatches to NPP
#: (TasksColorCvt.cpp:142-169): 709×JPEG (nppiNV12ToRGB_709HDTV),
#: 709×MPEG (_709CSC), 601×JPEG (nppiNV12ToRGB), 601×MPEG unsupported —
#: plus 601×MPEG itself for completeness of the table.
NPP_NV12_COMBOS = [
    (ColorSpace.BT_709, ColorRange.JPEG),
    (ColorSpace.BT_709, ColorRange.MPEG),
    (ColorSpace.BT_601, ColorRange.JPEG),
    (ColorSpace.BT_601, ColorRange.MPEG),
]


def fixedpoint_deviation_bound(space, rng, frac_bits: int) -> float:
    """Max pre-rounding deviation (in 8-bit output steps) of an
    implementation that quantises the exact conversion matrix to
    ``frac_bits`` fractional bits (round-to-nearest) and otherwise
    evaluates exactly — the standard fixed-point kernel model. Inputs are
    worst-case: |y−off_y| ≤ 255, |c−128| ≤ 128."""
    m, _ = cs.rgb_from_ycbcr_matrix(space, rng)
    scale = float(2**frac_bits)
    mq = np.round(m * scale) / scale
    xmax = np.array([255.0, 128.0, 128.0])
    return float((np.abs(mq - m) @ xmax).max())


@pytest.mark.parametrize("space,rng", NPP_NV12_COMBOS)
def test_npp_fixed_point_bound(space, rng):
    """With ≥10 fractional coefficient bits (the floor for NPP's
    documented accuracy; NPP ColorTwist kernels use f32 ≈ 24 bits), the
    pre-rounding deviation from the exact ITU result is < 0.5 output
    steps — so NPP's integer output and ours (exact + round-to-nearest)
    can differ by at most 1 per channel. Numbers recorded in
    docs/fidelity.md."""
    b10 = fixedpoint_deviation_bound(space, rng, 10)
    b24 = fixedpoint_deviation_bound(space, rng, 24)
    assert b10 < 0.5, (space, rng, b10)
    assert b24 < 5e-4, (space, rng, b24)
