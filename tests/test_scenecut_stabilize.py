"""Scene-cut detection (ops/scenecut.py) and stabilization
(ops/stabilize.py): synthetic ground truth + the golden asset.

Both subsystems compose the flow/metrics device ops; ground truth is
synthetic (spliced textures = known cut positions; scripted camera
paths = known jitter) so every assertion is exact-by-construction.
"""

import numpy as np
import pytest

from videoprocessingframework_tpu.ops.scenecut import (
    detect_cuts,
    scene_cut_scores,
    segment_shots,
)
from videoprocessingframework_tpu.ops.stabilize import (
    global_translations,
    smooth_path,
    stabilize_clip,
)

from test_flow import _smooth_texture  # noqa: E402  (shared synthetic)


def _panning_shot(h, w, n, step, seed):
    """n frames panning across one big texture by `step` px/frame."""
    pad = 8 + int(np.ceil(abs(step[0]) + abs(step[1])) * n)
    big = _smooth_texture(h + 2 * pad, w + 2 * pad, seed=seed)
    out = []
    for i in range(n):
        y0 = pad + int(round(step[1] * i))
        x0 = pad + int(round(step[0] * i))
        out.append(big[y0:y0 + h, x0:x0 + w])
    return np.stack(out)


class TestSceneCut:
    def test_spliced_shots_detected(self):
        a = _panning_shot(72, 96, 8, (1, 0), seed=1)
        b = _panning_shot(72, 96, 6, (0, 1), seed=7)
        c = _panning_shot(72, 96, 7, (-1, 1), seed=13)
        clip = np.concatenate([a, b, c]).astype(np.uint8)
        scores = np.asarray(scene_cut_scores(clip))
        assert scores.shape == (20,)
        cuts = detect_cuts(scores)
        assert cuts == [7, 13], (cuts, scores.round(3).tolist())

    def test_static_clip_no_cuts(self):
        frame = _smooth_texture(64, 64, seed=3)
        clip = np.repeat(frame[None], 10, axis=0).astype(np.uint8)
        scores = np.asarray(scene_cut_scores(clip))
        assert detect_cuts(scores) == []

    def test_motion_does_not_trigger(self):
        # a single fast pan: high inter-frame change, but uniform — the
        # adaptive MAD threshold must not fire mid-shot
        clip = _panning_shot(72, 96, 12, (3, 2), seed=5).astype(np.uint8)
        assert detect_cuts(np.asarray(scene_cut_scores(clip))) == []

    def test_golden_asset_single_shot(self, test_mp4):
        # tests/assets/test.mp4 is one continuous shot
        shots = segment_shots(test_mp4, max_frames=48, batch=16)
        assert shots == [(0, 48)]

    def test_rejects_bad_shape(self):
        with pytest.raises(ValueError, match="luma"):
            scene_cut_scores(np.zeros((4, 32, 32, 3), np.uint8))


class TestStabilize:
    def _jittered_clip(self, n=12, h=96, w=128, seed=4, amp=3):
        """Static camera + per-frame integer jitter (known path)."""
        rng = np.random.default_rng(seed)
        jitter = rng.integers(-amp, amp + 1, (n, 2))
        jitter[0] = 0
        pad = 16
        big = _smooth_texture(h + 2 * pad, w + 2 * pad, seed=seed)
        frames = np.stack([
            big[pad + jy:pad + jy + h, pad + jx:pad + jx + w]
            for jx, jy in jitter
        ])
        return frames.astype(np.float32), jitter.astype(np.float32)

    def test_global_translations_match_jitter(self):
        frames, jitter = self._jittered_clip()
        steps = np.asarray(global_translations(frames, iters=4))
        # camera at +j renders content at −j: content step u = −Δj
        want = -(jitter[1:] - jitter[:-1])
        assert np.abs(steps - want).max() < 0.3, (steps, want)

    def test_smooth_path_preserves_linear_trend(self):
        t = np.arange(20, dtype=np.float32)
        path = np.stack([2.0 * t, -1.0 * t], axis=1)
        sm = smooth_path(path, sigma=3.0)
        # reflect padding keeps a pure linear ramp essentially unchanged
        assert np.abs(sm - path).max() < 1e-6

    def test_stabilize_removes_jitter(self):
        frames, _ = self._jittered_clip(amp=3)
        out, corr = stabilize_clip(frames, sigma=4.0, iters=4)
        assert out.shape == frames.shape and corr.shape == (len(frames), 2)
        # residual shake = frame-to-frame translation after stabilization
        res = np.abs(np.asarray(global_translations(out, iters=4)))
        raw = np.abs(np.asarray(global_translations(frames, iters=4)))
        assert res.mean() < 0.35 * raw.mean(), (res.mean(), raw.mean())

    def test_stabilize_channels_last(self):
        frames, _ = self._jittered_clip(n=6)
        rgb = np.repeat(frames[..., None], 3, axis=-1).astype(np.uint8)
        out, corr = stabilize_clip(rgb, sigma=3.0)
        assert out.shape == rgb.shape and out.dtype == np.uint8
