"""Dense optical flow (ops/flow.py): pyramidal LK, warping, MV densify.

Ground truth comes from synthetic motion: two crops of one smooth random
texture offset by a known (sub)pixel shift — the flow field must recover
the shift on the interior, and warping one frame along the field must
reconstruct the other. (The reference only exports codec motion vectors,
PyFFMpegDecoder.cpp:28-140; mv_to_dense_flow bridges those into the same
dense representation.)
"""

import numpy as np
import pytest

from videoprocessingframework_tpu.ops.flow import (
    interpolate_midpoint,
    lucas_kanade_flow,
    mv_to_dense_flow,
    warp_image,
)


def _smooth_texture(h, w, seed=0, blur=7):
    """Random texture with gradients everywhere (LK needs local
    contrast; pure noise aliases under subpixel shifts). Contrast is
    std-normalized — min/max stretching leaves most of a blurred-noise
    field nearly flat and the solve ill-conditioned."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(0.0, 255.0, (h, w)).astype(np.float32)
    k = np.ones(blur, np.float32) / blur
    for _ in range(2):
        img = np.apply_along_axis(
            lambda r: np.convolve(r, k, "same"), 1, img)
        img = np.apply_along_axis(
            lambda c: np.convolve(c, k, "same"), 0, img)
    img = (img - img.mean()) / max(img.std(), 1e-6)
    return np.clip(128.0 + 45.0 * img, 0.0, 255.0)


def _shifted_pair(h, w, dx, dy, seed=0):
    """Two h×w crops of one big texture, offset by EXACTLY (dx, dy)
    (integer-subpixel via linear interp on the big canvas)."""
    pad = 32
    big = _smooth_texture(h + 2 * pad, w + 2 * pad, seed=seed)
    ys, xs = np.arange(h) + pad, np.arange(w) + pad
    prev = big[np.ix_(ys, xs)]

    # next(x) = prev(x - d)  <=>  prev(x) = next(x + d): sample the big
    # canvas at (ys - dy, xs - dx) with bilinear interp
    def samp(yy, xx):
        y0, x0 = np.floor(yy).astype(int), np.floor(xx).astype(int)
        fy, fx = yy - y0, xx - x0
        p00 = big[np.ix_(y0, x0)]
        p01 = big[np.ix_(y0, x0 + 1)]
        p10 = big[np.ix_(y0 + 1, x0)]
        p11 = big[np.ix_(y0 + 1, x0 + 1)]
        top = p00 * (1 - fx)[None, :] + p01 * fx[None, :]
        bot = p10 * (1 - fx)[None, :] + p11 * fx[None, :]
        return top * (1 - fy)[:, None] + bot * fy[:, None]

    nxt = samp(ys - dy, xs - dx)
    return prev.astype(np.float32), nxt.astype(np.float32)


def _interior(a, margin=24):
    return a[:, margin:-margin, margin:-margin]


class TestLucasKanade:
    @pytest.mark.parametrize("dx,dy", [(3.0, -2.0), (1.5, 0.75), (-6.25, 4.5)])
    def test_recovers_global_translation(self, dx, dy):
        prev, nxt = _shifted_pair(96, 128, dx, dy)
        flow = np.asarray(
            lucas_kanade_flow(prev[None], nxt[None], levels=3, iters=4)
        )
        med_dx = float(np.median(_interior(flow[..., 0])))
        med_dy = float(np.median(_interior(flow[..., 1])))
        assert abs(med_dx - dx) < 0.25, (med_dx, dx)
        assert abs(med_dy - dy) < 0.25, (med_dy, dy)

    def test_zero_motion_gives_zero_flow(self):
        prev, _ = _shifted_pair(64, 96, 0, 0)
        flow = np.asarray(lucas_kanade_flow(prev[None], prev[None]))
        assert float(np.abs(_interior(flow)).max()) < 0.05

    def test_batched_and_u8(self):
        p1, n1 = _shifted_pair(64, 96, 2.0, 1.0, seed=1)
        p2, n2 = _shifted_pair(64, 96, -1.0, 3.0, seed=2)
        prev = np.stack([p1, p2]).astype(np.uint8)
        nxt = np.stack([n1, n2]).astype(np.uint8)
        flow = np.asarray(lucas_kanade_flow(prev, nxt, levels=3, iters=4))
        assert flow.shape == (2, 64, 96, 2) and flow.dtype == np.float32
        assert abs(np.median(_interior(flow[:1])[..., 0]) - 2.0) < 0.35
        assert abs(np.median(_interior(flow[1:])[..., 1]) - 3.0) < 0.35

    def test_channels_last_input(self):
        prev, nxt = _shifted_pair(64, 96, 1.0, -1.0)
        rgb_p = np.repeat(prev[None, :, :, None], 3, axis=-1)
        rgb_n = np.repeat(nxt[None, :, :, None], 3, axis=-1)
        flow = np.asarray(lucas_kanade_flow(rgb_p, rgb_n))
        assert abs(np.median(_interior(flow[..., 0])) - 1.0) < 0.3

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError, match="differ"):
            lucas_kanade_flow(
                np.zeros((1, 32, 32), np.uint8), np.zeros((1, 32, 48), np.uint8)
            )


def _psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


class TestWarp:
    def test_warp_next_reconstructs_prev(self):
        prev, nxt = _shifted_pair(96, 128, 4.0, -3.0)
        flow = lucas_kanade_flow(prev[None], nxt[None], levels=3, iters=4)
        recon = np.asarray(warp_image(nxt[None], flow))
        m = 24
        assert _psnr(recon[0, m:-m, m:-m], prev[m:-m, m:-m]) > 38.0

    def test_integer_dtype_round_trip(self):
        prev, nxt = _shifted_pair(64, 96, 2.0, 2.0)
        flow = lucas_kanade_flow(prev[None], nxt[None])
        out = warp_image(nxt[None].astype(np.uint8), flow)
        assert np.asarray(out).dtype == np.uint8

    def test_warp_channels(self):
        prev, nxt = _shifted_pair(64, 96, 1.5, 0.0)
        flow = lucas_kanade_flow(prev[None], nxt[None], levels=3, iters=4)
        rgb = np.repeat(nxt[None, :, :, None], 3, axis=-1)
        out = np.asarray(warp_image(rgb, flow))
        assert out.shape == (1, 64, 96, 3)
        m = 16
        assert _psnr(out[0, m:-m, m:-m, 0], prev[m:-m, m:-m]) > 32.0

    def test_midpoint_interpolation(self):
        # three frames along a constant-velocity pan: the synthesized
        # midpoint must be much closer to the true middle frame than
        # either endpoint is
        prev, mid = _shifted_pair(96, 128, 2.0, 1.5)
        _, nxt = _shifted_pair(96, 128, 4.0, 3.0)
        synth = np.asarray(
            interpolate_midpoint(prev[None], nxt[None], levels=3, iters=4)
        )[0]
        m = 24
        psnr_synth = _psnr(synth[m:-m, m:-m], mid[m:-m, m:-m])
        psnr_endpt = _psnr(prev[m:-m, m:-m], mid[m:-m, m:-m])
        assert psnr_synth > psnr_endpt + 6.0, (psnr_synth, psnr_endpt)
        assert psnr_synth > 34.0


class TestMvDensify:
    def _mv(self, **kw):
        from videoprocessingframework_tpu.compat import MotionVector

        row = np.zeros((), MotionVector)
        for k, v in kw.items():
            row[k] = v
        return row

    def test_blocks_fill_and_scale(self):
        from videoprocessingframework_tpu.compat import MotionVector

        mvs = np.array(
            [
                self._mv(source=-1, w=16, h=16, dst_x=8, dst_y=8,
                         motion_x=8, motion_y=-4, motion_scale=4),
                self._mv(source=1, w=8, h=8, dst_x=28, dst_y=4,
                         motion_x=6, motion_y=2, motion_scale=2),
            ],
            dtype=MotionVector,
        )
        flow = mv_to_dense_flow(mvs, 32, 16)
        assert flow.shape == (16, 32, 2)
        # block 1 from a PAST reference (source<0): FFmpeg motion points
        # toward the reference (src = dst + motion/scale), so prev→next
        # is the NEGATED subpel motion: -(8/4)=-2.0, -(-4/4)=1.0
        assert flow[8, 8, 0] == -2.0 and flow[8, 8, 1] == 1.0
        # block 2 from a FUTURE reference (source>0): motion already
        # points along prev→next — kept: 6/2=3.0, 2/2=1.0
        assert flow[4, 27, 0] == 3.0 and flow[4, 27, 1] == 1.0
        # outside both blocks (block 1 spans x 0..16, block 2 x 24..32
        # y 0..8): zero
        assert flow[15, 20, 0] == 0.0

    def test_empty_and_none(self):
        assert mv_to_dense_flow(None, 8, 8).shape == (8, 8, 2)
        from videoprocessingframework_tpu.compat import MotionVector

        empty = np.zeros((0,), MotionVector)
        assert float(np.abs(mv_to_dense_flow(empty, 8, 8)).max()) == 0.0

    def test_zero_scale_treated_as_one(self):
        from videoprocessingframework_tpu.compat import MotionVector

        mvs = np.array(
            [self._mv(source=-1, w=8, h=8, dst_x=4, dst_y=4,
                      motion_x=3, motion_y=1, motion_scale=0)],
            dtype=MotionVector,
        )
        flow = mv_to_dense_flow(mvs, 8, 8)
        assert flow[4, 4, 0] == -3.0
