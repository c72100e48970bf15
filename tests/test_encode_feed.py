"""Outbound fused pipeline: batched RGB → resized planar YUV420 encoder
feed in one program (reference transcode chain anchor: Tasks.cpp
ResizeSurface NV12 path + TasksColorCvt.cpp rgb→yuv420)."""

import numpy as np
import pytest

from videoprocessingframework_tpu.core.enums import ColorRange, ColorSpace
from videoprocessingframework_tpu.ops import colorspace as cs
from videoprocessingframework_tpu.ops import golden
from videoprocessingframework_tpu.ops.fused import (
    encode_feed,
    planes_to_host_packed,
)
from videoprocessingframework_tpu.ops.resize import resize_matrix

RNG = np.random.default_rng(21)


def _golden_feed(rgb, oh, ow, space, rng_):
    """float64 reference: resize each RGB channel with the exact resize
    matrices, then golden rgb→ycbcr, 2×2 chroma mean, round."""
    n, h, w, _ = rgb.shape
    rm = resize_matrix(h, oh, "lanczos").astype(np.float64)
    cm = resize_matrix(w, ow, "lanczos").astype(np.float64)
    out = np.einsum("oh,nhwc->nowc", rm, rgb.astype(np.float64))
    out = np.einsum("pw,nhwc->nhpc", cm, out)
    m, off = cs.ycbcr_from_rgb_matrix(space, rng_)
    ycc = np.einsum("...c,dc->...d", out, m) + off
    y = np.clip(np.rint(ycc[..., 0]), 0, 255).astype(np.uint8)
    cbcr = ycc[..., 1:].reshape(n, oh // 2, 2, ow // 2, 2, 2).mean((2, 4))
    u = np.clip(np.rint(cbcr[..., 0]), 0, 255).astype(np.uint8)
    v = np.clip(np.rint(cbcr[..., 1]), 0, 255).astype(np.uint8)
    return y, u, v


@pytest.mark.parametrize("space,rng_", [
    (ColorSpace.BT_709, ColorRange.MPEG),
    (ColorSpace.BT_601, ColorRange.JPEG),
])
def test_encode_feed_no_resize_matches_golden(space, rng_):
    rgb = RNG.integers(0, 256, (2, 64, 96, 3), np.uint8)
    y, u, v = (np.asarray(p) for p in encode_feed(
        rgb, out_h=64, out_w=96, space=space, rng=rng_))
    gy, gu, gv = golden.rgb_to_yuv420(rgb, space, rng_)
    assert np.abs(y.astype(int) - gy.astype(int)).max() <= 1
    assert np.abs(u.astype(int) - gu.astype(int)).max() <= 1
    assert np.abs(v.astype(int) - gv.astype(int)).max() <= 1


def test_encode_feed_resize_one_ulp_vs_float64():
    rgb = RNG.integers(0, 256, (2, 96, 128, 3), np.uint8)
    oh, ow = 48, 64
    got = tuple(np.asarray(p) for p in encode_feed(
        rgb, out_h=oh, out_w=ow,
        space=ColorSpace.BT_709, rng=ColorRange.MPEG))
    want = _golden_feed(rgb, oh, ow, ColorSpace.BT_709, ColorRange.MPEG)
    for g, w_ in zip(got, want):
        assert g.shape == w_.shape
        assert np.abs(g.astype(int) - w_.astype(int)).max() <= 1


def test_encode_feed_f32_input_and_swap():
    rgbf = RNG.random((1, 32, 64, 3), np.float32)
    y1, u1, v1 = encode_feed(rgbf, out_h=32, out_w=64)
    rgb_u8 = np.rint(rgbf * 255.0).astype(np.uint8)
    # f32 input is scaled by 255 — same pixels give (nearly) same planes
    y2, u2, v2 = encode_feed(rgb_u8, out_h=32, out_w=64)
    assert np.abs(np.asarray(y1).astype(int) - np.asarray(y2).astype(int)).max() <= 1
    # BGR swap == pre-swapped RGB
    y3, _, _ = encode_feed(rgb_u8[..., ::-1].copy(), out_h=32, out_w=64,
                           swap=True)
    np.testing.assert_array_equal(np.asarray(y3), np.asarray(y2))


def test_encode_feed_feeds_the_encoder():
    """packed planes must be a valid VideoEncoder YUV420 input frame."""
    from videoprocessingframework_tpu.io import VideoEncoder

    rgb = RNG.integers(0, 256, (4, 96, 128, 3), np.uint8)
    planes = encode_feed(rgb, out_h=64, out_w=96)
    packed = planes_to_host_packed(*planes)
    assert packed.shape == (4, 96, 96)
    enc = VideoEncoder({"codec": "h264", "preset": "P1", "fmt": "YUV420",
                        "s": "96x64", "bitrate": "1M", "gop": "16"})
    pkts = []
    for f in packed:
        out = enc.encode(f)
        if out is not None:
            pkts.append(out[0])
    pkts.extend(p for p, _ in enc.flush())
    assert pkts


def test_encode_feed_validates_inputs():
    rgb = np.zeros((1, 32, 32, 3), np.uint8)
    with pytest.raises(ValueError, match="even"):
        encode_feed(rgb, out_h=33, out_w=32)
    with pytest.raises(ValueError, match="RGB"):
        encode_feed(np.zeros((1, 32, 32, 4), np.uint8), out_h=32, out_w=32)


def test_encode_feed_rejects_unknown_compute():
    """compute typos must raise like decode_postproc does (advisor r2)."""
    rgb = np.zeros((1, 32, 32, 3), np.uint8)
    with pytest.raises(ValueError, match="compute"):
        encode_feed(rgb, out_h=16, out_w=16, compute="split-bf16")
