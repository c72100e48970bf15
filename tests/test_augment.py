"""Device-fused augmentation pipeline (ops/augment.py).

The reference has no augmentation (its ML samples feed raw decoded
frames — samples/SampleTorchResnet.py:1095-1151); this is a
beyond-parity extension of the training data path, so the goldens here
are pure-numpy derivations of each augmentation's math, not reference
captures.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from videoprocessingframework_tpu.core.enums import (
    ColorRange,
    ColorSpace,
    PixelFormat,
)
from videoprocessingframework_tpu.ops import colorspace as cs
from videoprocessingframework_tpu.ops.augment import (
    AugmentPipeline,
    AugmentSpec,
    augment_postproc,
    sample_augment_params,
    window_matrices,
)
from videoprocessingframework_tpu.ops.fused import decode_postproc
from videoprocessingframework_tpu.ops.resize import resize_matrix

F = PixelFormat


def _yuv420(B, H, W, seed=0):
    r = np.random.default_rng(seed)
    return (
        r.integers(0, 256, (B, H, W), np.uint8),
        r.integers(0, 256, (B, H // 2, W // 2), np.uint8),
        r.integers(0, 256, (B, H // 2, W // 2), np.uint8),
    )


NOOP = AugmentSpec(crop=False, hflip=0.0)


class TestWindowMatrices:
    @pytest.mark.parametrize(
        "n_in,n_out,method",
        [(64, 224, "lanczos"), (1080, 224, "lanczos"), (720, 224, "bilinear"),
         (57, 31, "bilinear"), (128, 128, "lanczos")],
    )
    def test_full_window_matches_host_matrix(self, n_in, n_out, method):
        """start=0, length=n_in must reproduce ops.resize.resize_matrix
        (the static host construction) to f32 accuracy."""
        w = np.asarray(
            window_matrices(
                jnp.zeros((1,)), jnp.full((1,), float(n_in)), n_in, n_out, method
            )
        )[0]
        ref = resize_matrix(n_in, n_out, method)
        assert np.abs(w - ref).max() < 2e-4
        np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-5)

    def test_integer_crop_matches_sliced_resize_interior(self):
        """An integer-aligned window equals resizing the sliced crop for
        every output row whose taps stay inside the window. Rows near
        the window edge deliberately differ: the in-graph matrix samples
        the REAL neighboring pixels of the full frame instead of
        replicating the crop edge (slice-then-resize semantics) — higher
        fidelity, no synthetic seam."""
        n_in, n_out = 96, 32
        y0, ch = 16.0, 48.0
        w = np.asarray(
            window_matrices(
                jnp.full((1,), y0), jnp.full((1,), ch), n_in, n_out, "lanczos"
            )
        )[0]
        ref = resize_matrix(int(ch), n_out, "lanczos")  # (32, 48)
        # interior rows: src_i ∈ [y0+a-1, y0+ch-a] keeps all taps in
        # the window (a=3; scale=1.5 ⇒ rows 2..29 here)
        np.testing.assert_allclose(w[2:30, 16:64], ref[2:30], atol=2e-5)
        # taps never reach further than the lanczos support outside
        assert np.abs(w[:, :13]).max() == 0.0
        assert np.abs(w[:, 67:]).max() == 0.0
        # edge rows spend some weight on real pixels outside the window
        assert np.abs(w[0, 13:16]).max() > 0.0

    def test_rows_normalized_at_edges(self):
        """Windows touching the frame edges clamp taps (replicate) and
        still sum to 1."""
        w = np.asarray(
            window_matrices(
                jnp.zeros((1,)), jnp.full((1,), 10.0), 100, 64, "lanczos"
            )
        )[0]
        np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-5)

    def test_nearest_rejected(self):
        with pytest.raises(ValueError, match="lanczos|bilinear"):
            window_matrices(jnp.zeros((1,)), jnp.full((1,), 8.0), 8, 8, "nearest")


class TestNoopEqualsFused:
    @pytest.mark.parametrize("output", ["rgb_u8", "normalized"])
    def test_disabled_spec_matches_decode_postproc(self, output):
        """crop off + flip off + no jitter ⇒ the augmented program is
        the plain fused postproc (within f32-vs-f64 matrix noise)."""
        y, u, v = _yuv420(6, 48, 64)
        kw = dict(
            src_format=F.YUV420, space=ColorSpace.BT_709, rng=ColorRange.MPEG,
            out_h=24, out_w=32, method="lanczos", output=output,
        )
        ref = np.asarray(decode_postproc(y, u, v, compute="highest", **kw))
        got = np.asarray(
            augment_postproc(
                y, u, v, np.uint32([0, 0, 0]), spec=NOOP, clip_len=3, **kw
            )
        )
        if output == "rgb_u8":
            assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1
        else:
            np.testing.assert_allclose(got, ref, atol=2e-3)

    def test_packed_planar_layout(self):
        """The packed [N, H·3/2, W] YUV420 layout (the loader's hot
        path) unpacks identically in both pipelines."""
        y, u, v = _yuv420(4, 16, 32)
        packed = np.concatenate(
            [y, u.reshape(4, 4, 32), v.reshape(4, 4, 32)], axis=1
        )
        kw = dict(
            src_format=F.YUV420, space=ColorSpace.BT_601, rng=ColorRange.JPEG,
            out_h=16, out_w=32, output="rgb_u8",
        )
        ref = np.asarray(
            augment_postproc(
                y, u, v, np.uint32([0, 0, 0]), spec=NOOP, clip_len=2, **kw
            )
        )
        got = np.asarray(
            augment_postproc(
                packed, np.uint32([0, 0, 0]), spec=NOOP, clip_len=2, **kw
            )
        )
        np.testing.assert_array_equal(got, ref)


class TestFlip:
    def test_flip_only_is_mirror(self):
        """hflip=1.0 with crop off ⇒ exactly the mirrored un-augmented
        output (the column matrix's output axis reverses)."""
        y, u, v = _yuv420(4, 32, 48)
        kw = dict(
            src_format=F.YUV420, space=ColorSpace.BT_709, rng=ColorRange.MPEG,
            out_h=16, out_w=24, output="rgb_u8",
        )
        base = np.asarray(
            augment_postproc(
                y, u, v, np.uint32([0, 0, 0]), spec=NOOP, clip_len=2, **kw
            )
        )
        flipped = np.asarray(
            augment_postproc(
                y, u, v, np.uint32([0, 0, 0]),
                spec=AugmentSpec(crop=False, hflip=1.0), clip_len=2, **kw
            )
        )
        np.testing.assert_array_equal(flipped, base[:, :, ::-1, :])


class TestCrop:
    def test_crop_geometry_matches_numpy_golden(self):
        """Sample the params, then reproduce one clip's augmented luma
        with a numpy float64 matrix built the same way."""
        B, T, H, W = 3, 2, 64, 96
        y, u, v = _yuv420(B * T, H, W)
        spec = AugmentSpec(crop=True, crop_scale=(0.4, 0.9), hflip=0.0)
        ctr = np.uint32([7, 1, 2])
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(ctr[0]), ctr[1]), ctr[2]
        )
        p = jax.tree.map(np.asarray, sample_augment_params(key, B, H, W, spec))
        out = np.asarray(
            augment_postproc(
                y, u, v, ctr,
                src_format=F.YUV420, space=ColorSpace.BT_709,
                rng=ColorRange.JPEG, out_h=32, out_w=48,
                output="rgb_u8", spec=spec, clip_len=T,
            )
        )
        # numpy golden for clip 0, frame 0 (luma → gray-ish via CSC)
        rm = np.asarray(
            window_matrices(
                jnp.asarray(p["y0"]), jnp.asarray(p["ch"]), H, 32, "lanczos"
            )
        )
        cm = np.asarray(
            window_matrices(
                jnp.asarray(p["x0"]), jnp.asarray(p["cw"]), W, 48, "lanczos"
            )
        )
        m, off = cs.rgb_from_ycbcr_matrix(ColorSpace.BT_709, ColorRange.JPEG)
        for b in range(B):
            yr = rm[b] @ y[b * T].astype(np.float64) @ cm[b].T
            ur = (
                rm[b].reshape(32, H // 2, 2).sum(-1)
                @ u[b * T].astype(np.float64)
                @ cm[b].reshape(48, W // 2, 2).sum(-1).T
            )
            vr = (
                rm[b].reshape(32, H // 2, 2).sum(-1)
                @ v[b * T].astype(np.float64)
                @ cm[b].reshape(48, W // 2, 2).sum(-1).T
            )
            ycc = np.stack([yr, ur, vr], -1) - np.asarray(off)
            rgb = np.clip(ycc @ np.asarray(m).T, 0, 255)
            got = out[b * T].astype(np.float64)
            assert np.abs(got - np.round(rgb)).max() <= 1.0

    def test_crop_boxes_in_bounds(self):
        spec = AugmentSpec(crop=True, crop_scale=(0.1, 1.0))
        p = sample_augment_params(jax.random.PRNGKey(3), 256, 120, 160, spec)
        p = jax.tree.map(np.asarray, p)
        assert (p["y0"] >= 0).all() and (p["x0"] >= 0).all()
        assert (p["y0"] + p["ch"] <= 120 + 1e-3).all()
        assert (p["x0"] + p["cw"] <= 160 + 1e-3).all()
        assert (p["ch"] > 0).all() and (p["cw"] > 0).all()


class TestJitter:
    def _rgb(self, spec, ctr=(0, 0, 0)):
        y, u, v = _yuv420(2, 32, 32, seed=5)
        return np.asarray(
            augment_postproc(
                y, u, v, np.uint32(ctr),
                src_format=F.YUV420, space=ColorSpace.BT_601,
                rng=ColorRange.JPEG, out_h=32, out_w=32,
                output="rgb_f32", spec=spec, clip_len=1,
            )
        )

    def test_brightness_scales(self):
        base = self._rgb(NOOP)
        spec = AugmentSpec(crop=False, hflip=0.0, brightness=0.5)
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(0), 0), 0
        )
        fb = np.asarray(
            sample_augment_params(key, 2, 32, 32, spec)["brightness"]
        )
        got = self._rgb(spec)
        ref = np.clip(base * fb[:, None, None, None], 0, 1)
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_saturation_blends_toward_gray(self):
        base = self._rgb(NOOP)
        spec = AugmentSpec(crop=False, hflip=0.0, saturation=0.9)
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(0), 0), 0
        )
        fs = np.asarray(
            sample_augment_params(key, 2, 32, 32, spec)["saturation"]
        )
        got = self._rgb(spec)
        gray = (base * np.array([0.299, 0.587, 0.114])).sum(-1, keepdims=True)
        ref = np.clip(gray + (base - gray) * fs[:, None, None, None], 0, 1)
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_hue_preserves_gray_axis(self):
        """Linear YIQ hue rotation leaves the luma (Y) channel of any
        pixel unchanged; gray pixels are exactly fixed points."""
        y = np.full((1, 16, 16), 128, np.uint8)
        u = np.full((1, 8, 8), 128, np.uint8)
        v = np.full((1, 8, 8), 128, np.uint8)
        spec = AugmentSpec(crop=False, hflip=0.0, hue=0.5)
        out = np.asarray(
            augment_postproc(
                y, u, v, np.uint32([1, 2, 3]),
                src_format=F.YUV420, space=ColorSpace.BT_601,
                rng=ColorRange.JPEG, out_h=16, out_w=16,
                output="rgb_u8", spec=spec, clip_len=1,
            )
        )
        assert np.abs(out.astype(int) - 128).max() <= 1

    def test_spec_validation(self):
        with pytest.raises(ValueError):
            AugmentSpec(crop_scale=(0.0, 1.0))
        with pytest.raises(ValueError):
            AugmentSpec(hue=0.6)
        with pytest.raises(ValueError):
            AugmentSpec(brightness=-0.1)
        with pytest.raises(ValueError):
            AugmentSpec(hflip=1.5)


class TestDeterminismAndClips:
    SPEC = AugmentSpec(
        crop=True, hflip=0.5, brightness=0.3, contrast=0.3,
        saturation=0.3, hue=0.2,
    )

    def _pipe(self, T):
        return AugmentPipeline(
            F.YUV420, ColorSpace.BT_709, ColorRange.MPEG,
            out_size=(24, 24), spec=self.SPEC, clip_len=T,
            output="rgb_u8", seed=11,
        )

    def test_same_counter_same_bytes(self):
        y, u, v = _yuv420(6, 32, 32)
        pipe = self._pipe(3)
        a = np.asarray(pipe(y, u, v, epoch=2, batch_index=5))
        b = np.asarray(pipe(y, u, v, epoch=2, batch_index=5))
        np.testing.assert_array_equal(a, b)
        c = np.asarray(pipe(y, u, v, epoch=2, batch_index=6))
        assert (a != c).any()
        d = np.asarray(pipe(y, u, v, epoch=3, batch_index=5))
        assert (a != d).any()

    def test_frames_of_a_clip_share_params(self):
        """Identical frames within one clip must augment identically
        (temporal consistency), while different clips differ."""
        frame = np.random.default_rng(1).integers(0, 256, (32, 32), np.uint8)
        cf = np.random.default_rng(2).integers(0, 256, (16, 16), np.uint8)
        B, T = 4, 3
        y = np.broadcast_to(frame, (B * T, 32, 32)).copy()
        u = np.broadcast_to(cf, (B * T, 16, 16)).copy()
        v = np.broadcast_to(cf, (B * T, 16, 16)).copy()
        out = np.asarray(self._pipe(T)(y, u, v, epoch=0, batch_index=0))
        out = out.reshape(B, T, *out.shape[1:])
        for b in range(B):
            for t in range(1, T):
                np.testing.assert_array_equal(out[b, t], out[b, 0])
        assert any((out[0, 0] != out[b, 0]).any() for b in range(1, B))

    def test_bad_clip_len(self):
        y, u, v = _yuv420(5, 16, 16)
        with pytest.raises(ValueError, match="divisible"):
            self._pipe(3)(y, u, v)

    def test_gray_source(self):
        y = np.random.default_rng(0).integers(0, 256, (4, 32, 32), np.uint8)
        pipe = AugmentPipeline(
            F.Y, ColorSpace.BT_601, ColorRange.JPEG, out_size=(16, 16),
            spec=AugmentSpec(crop=True, hflip=1.0), clip_len=2,
            output="rgb_u8",
        )
        out = np.asarray(pipe(y, epoch=0, batch_index=0))
        assert out.shape == (4, 16, 16, 3)
        # gray in, gray out: channels equal
        np.testing.assert_array_equal(out[..., 0], out[..., 1])
        np.testing.assert_array_equal(out[..., 0], out[..., 2])


class TestTimeReverse:
    def test_reverse_only_flips_time(self):
        y, u, v = _yuv420(6, 32, 32, seed=9)
        kw = dict(
            src_format=F.YUV420, space=ColorSpace.BT_709,
            rng=ColorRange.MPEG, out_h=16, out_w=16, output="rgb_u8",
        )
        base = np.asarray(
            augment_postproc(
                y, u, v, np.uint32([0, 0, 0]), spec=NOOP, clip_len=3, **kw
            )
        ).reshape(2, 3, 16, 16, 3)
        rev = np.asarray(
            augment_postproc(
                y, u, v, np.uint32([0, 0, 0]),
                spec=AugmentSpec(crop=False, hflip=0.0, time_reverse=1.0),
                clip_len=3, **kw,
            )
        ).reshape(2, 3, 16, 16, 3)
        np.testing.assert_array_equal(rev, base[:, ::-1])

    def test_validation(self):
        with pytest.raises(ValueError, match="time_reverse"):
            AugmentSpec(time_reverse=1.5)


class TestMixupCutmix:
    def _batch(self, B=6, video=False):
        import jax

        r = np.random.default_rng(3)
        shape = (B, 2, 16, 16, 3) if video else (B, 16, 16, 3)
        x = r.random(shape).astype(np.float32)
        labels = np.arange(B, dtype=np.int32) % 4
        key = jax.random.PRNGKey(7)
        return x, labels, key

    def test_mixup_pixels_match_labels(self):
        from videoprocessingframework_tpu.ops.augment import mixup_cutmix

        x, labels, key = self._batch()
        mixed, soft = map(np.asarray, mixup_cutmix(
            x, labels, key, num_classes=4,
            mixup_alpha=0.4, cutmix_alpha=0.0,
        ))
        np.testing.assert_allclose(soft.sum(1), 1.0, atol=1e-6)
        B = x.shape[0]
        for i in range(B):
            j = B - 1 - i
            if labels[i] == labels[j]:
                continue
            lam = soft[i, labels[i]]
            want = lam * x[i] + (1 - lam) * x[j]
            np.testing.assert_allclose(mixed[i], want, atol=1e-5)

    def test_cutmix_box_matches_labels(self):
        from videoprocessingframework_tpu.ops.augment import mixup_cutmix

        x, labels, key = self._batch()
        mixed, soft = map(np.asarray, mixup_cutmix(
            x, labels, key, num_classes=4,
            mixup_alpha=0.0, cutmix_alpha=1.0,
        ))
        B, H, W = x.shape[0], x.shape[1], x.shape[2]
        for i in range(B):
            j = B - 1 - i
            if labels[i] == labels[j]:
                continue
            # every pixel is either own or partner (no blending)
            own = np.isclose(mixed[i], x[i], atol=1e-6).all(-1)
            other = np.isclose(mixed[i], x[j], atol=1e-6).all(-1)
            assert (own | other).all()
            # pasted fraction equals the soft-label split exactly
            frac = other.mean() if (labels[i] != labels[j]) else 0.0
            np.testing.assert_allclose(
                soft[i, labels[j]], frac, atol=1e-5
            )

    def test_video_batch_temporally_consistent(self):
        from videoprocessingframework_tpu.ops.augment import mixup_cutmix

        x, labels, key = self._batch(video=True)
        mixed, soft = map(np.asarray, mixup_cutmix(
            x, labels, key, num_classes=4,
            mixup_alpha=0.0, cutmix_alpha=1.0,
        ))
        assert mixed.shape == x.shape
        # the pasted box is identical in every frame of a clip
        for i in range(x.shape[0]):
            m0 = np.isclose(mixed[i, 0], x[i, 0], atol=1e-6).all(-1)
            m1 = np.isclose(mixed[i, 1], x[i, 1], atol=1e-6).all(-1)
            np.testing.assert_array_equal(m0, m1)

    def test_prob_zero_is_identity(self):
        from videoprocessingframework_tpu.ops.augment import mixup_cutmix

        x, labels, key = self._batch()
        mixed, soft = map(np.asarray, mixup_cutmix(
            x, labels, key, num_classes=4, prob=0.0,
        ))
        np.testing.assert_allclose(mixed, x, atol=1e-6)
        want = np.eye(4, dtype=np.float32)[labels]
        np.testing.assert_array_equal(soft, want)

    def test_rejects_bad_shapes_and_alphas(self):
        import jax

        from videoprocessingframework_tpu.ops.augment import mixup_cutmix

        key = jax.random.PRNGKey(0)
        with pytest.raises(ValueError, match="expects"):
            mixup_cutmix(
                jnp.zeros((4, 16, 16)), jnp.zeros(4, jnp.int32), key,
                num_classes=4,
            )
        with pytest.raises(ValueError, match="alpha"):
            mixup_cutmix(
                jnp.zeros((4, 8, 8, 3)), jnp.zeros(4, jnp.int32), key,
                num_classes=4, mixup_alpha=0.0, cutmix_alpha=0.0,
            )


class TestSrcWindow:
    def test_windowed_matrix_matches_batched_construction(self):
        """resize_matrix(window=) (host f64) and window_matrices (in-
        graph f32) are the same construction — cross-check them."""
        got = resize_matrix(96, 32, "lanczos", window=(16.0, 48.0))
        ref = np.asarray(
            window_matrices(
                jnp.full((1,), 16.0), jnp.full((1,), 48.0), 96, 32,
                "lanczos",
            )
        )[0]
        assert np.abs(got - ref).max() < 2e-4

    def test_full_window_identical_to_none(self):
        a = resize_matrix(64, 24, "lanczos")
        b = resize_matrix(64, 24, "lanczos", window=(0.0, 64.0))
        np.testing.assert_array_equal(a, b)

    def test_decode_postproc_src_window(self):
        """Fused ROI (NPP oSrcROI analog): output equals the golden
        built from the same windowed matrices in float64."""
        y, u, v = _yuv420(2, 64, 96, seed=11)
        win = (8.0, 12.0, 40.0, 64.0)  # (y0, x0, h, w)
        out = np.asarray(
            decode_postproc(
                y, u, v,
                src_format=F.YUV420, space=ColorSpace.BT_601,
                rng=ColorRange.JPEG, out_h=20, out_w=32,
                output="rgb_u8", compute="highest", src_window=win,
            )
        )
        rm = resize_matrix(64, 20, "lanczos", window=(8.0, 40.0)
                           ).astype(np.float64)
        cm = resize_matrix(96, 32, "lanczos", window=(12.0, 64.0)
                           ).astype(np.float64)
        m, off = cs.rgb_from_ycbcr_matrix(ColorSpace.BT_601,
                                          ColorRange.JPEG)
        rmc = rm.reshape(20, 32, 2).sum(-1)
        cmc = cm.reshape(32, 48, 2).sum(-1)
        for i in range(2):
            yr = rm @ y[i].astype(np.float64) @ cm.T
            ur = rmc @ u[i].astype(np.float64) @ cmc.T
            vr = rmc @ v[i].astype(np.float64) @ cmc.T
            ycc = np.stack([yr, ur, vr], -1) - np.asarray(off)
            rgb = np.clip(ycc @ np.asarray(m).T, 0, 255)
            assert np.abs(out[i].astype(np.float64) - np.round(rgb)
                          ).max() <= 1.0

    def test_fused_pipeline_src_window_and_pallas_reject(self):
        from videoprocessingframework_tpu.ops.fused import FusedPipeline

        with pytest.raises(ValueError, match="src_window"):
            FusedPipeline(
                F.YUV420, ColorSpace.BT_709, ColorRange.MPEG,
                out_size=(16, 16), kernel="pallas",
                src_window=(0, 0, 32, 32),
            )
        y, u, v = _yuv420(2, 32, 32, seed=4)
        pipe = FusedPipeline(
            F.YUV420, ColorSpace.BT_709, ColorRange.MPEG,
            out_size=(16, 16), src_window=(8, 8, 16, 16),
        )
        out = np.asarray(pipe(y, u, v))
        assert out.shape == (2, 16, 16, 3)
        full = FusedPipeline(
            F.YUV420, ColorSpace.BT_709, ColorRange.MPEG,
            out_size=(16, 16),
        )
        assert (np.asarray(full(y, u, v)) != out).any()

    def test_window_bounds_validated(self):
        with pytest.raises(ValueError, match="window"):
            resize_matrix(64, 24, "lanczos", window=(60.0, 10.0))
