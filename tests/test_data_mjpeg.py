"""MjpegClipLoader: training clips through the split JPEG codec —
frame-exact random access (all-intra, zero GOP replay), coefficient-ring
decode, fused device batches, worker invariance, labels, resume, and
parity with MjpegReader's sequential decode."""

import numpy as np
import pytest

from videoprocessingframework_tpu.data import MjpegClipLoader
from videoprocessingframework_tpu.io import MjpegReader, MjpegWriter
from videoprocessingframework_tpu.io.jpeg import JpegStreamError

W, H, N = 96, 64, 14


def _mk_avi(path, n=N, seed=0, w=W, h=H, quality=90):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip((yy + xx) * 255 / (h + w) + rng.normal(0, 4, (n, h, w)),
                0, 255).astype(np.uint8)
    u = np.clip(128 + rng.normal(0, 6, (n, h // 2, w // 2)),
                0, 255).astype(np.uint8)
    v = np.clip(128 - rng.normal(0, 6, (n, h // 2, w // 2)),
                0, 255).astype(np.uint8)
    with MjpegWriter(str(path), w, h, quality=quality,
                     container="avi") as wr:
        wr.write_planes(y, u, v)


@pytest.fixture(scope="module")
def clip_avi(tmp_path_factory):
    p = tmp_path_factory.mktemp("mjc") / "c.avi"
    _mk_avi(p)
    return str(p)


@pytest.fixture(scope="module")
def all_rgb(clip_avi):
    """Sequential ground truth via MjpegReader (same device pipeline)."""
    rd = MjpegReader(clip_avi, output="rgb_u8")
    return np.concatenate([np.asarray(b) for b in rd.batches()], axis=0)


def test_clip_frames_exact(clip_avi, all_rgb):
    T, stride = 3, 2
    ld = MjpegClipLoader(
        clip_avi, clip_len=T, frame_stride=stride, batch_size=2,
        output="rgb_u8", shuffle=True, seed=5, workers=1,
    )
    samples = ld.sampler.epoch(0)
    got = np.concatenate(
        [np.asarray(b) for b in ld.epoch(0)], axis=0
    )
    assert got.shape == (len(samples), T, H, W, 3)
    for clip, (fi, st) in zip(got, samples):
        want = all_rgb[st: st + T * stride: stride]
        assert np.array_equal(clip, want), f"clip at {st} differs"


def test_worker_invariance_and_labels(clip_avi, tmp_path):
    b = tmp_path / "b.avi"
    _mk_avi(b, seed=9)
    kw = dict(clip_len=2, batch_size=3, output="rgb_u8", shuffle=True,
              seed=3, labels=[4, 6])
    a1 = list(MjpegClipLoader([clip_avi, str(b)], workers=1, **kw).epoch(1))
    a3 = list(MjpegClipLoader([clip_avi, str(b)], workers=3, **kw).epoch(1))
    assert len(a1) == len(a3)
    for (x, lx), (y, ly) in zip(a1, a3):
        assert np.array_equal(np.asarray(x), np.asarray(y))
        assert np.array_equal(lx, ly)
        assert set(lx.tolist()) <= {4, 6}


def test_resize_normalized_and_planes(clip_avi):
    ld = MjpegClipLoader(clip_avi, clip_len=2, batch_size=2,
                         out_size=(32, 48), output="normalized",
                         drop_last=True, workers=1)
    batch = next(iter(ld.epoch(0)))
    arr = np.asarray(batch)
    assert arr.shape == (2, 2, 32, 48, 3)
    assert arr.dtype == np.float32

    ld2 = MjpegClipLoader(clip_avi, clip_len=2, batch_size=2,
                          output="planes", workers=1)
    planes = next(iter(ld2.epoch(0)))
    assert isinstance(planes, tuple) and len(planes) == 3
    assert np.asarray(planes[0]).shape == (2, 2, H, W)
    assert np.asarray(planes[1]).shape == (2, 2, H // 2, W // 2)


def test_checkpoint_resume(clip_avi):
    kw = dict(clip_len=2, batch_size=2, output="rgb_u8", seed=11,
              workers=1)
    full = [np.asarray(b) for b in
            MjpegClipLoader(clip_avi, **kw).epoch(2)]
    ld = MjpegClipLoader(clip_avi, **kw)
    it = ld.epoch(2)
    first = np.asarray(next(it))
    state = ld.state_dict()
    del it
    ld2 = MjpegClipLoader(clip_avi, **kw)
    ld2.load_state_dict(state)
    rest = [np.asarray(b) for b in ld2.epoch()]
    assert 1 + len(rest) == len(full)
    assert np.array_equal(first, full[0])
    for x, y in zip(rest, full[1:]):
        assert np.array_equal(x, y)


def test_rejects_non_mjpeg_and_mixed_tables(test_mp4, clip_avi, tmp_path):
    with pytest.raises(JpegStreamError, match="not MJPEG"):
        MjpegClipLoader([test_mp4], clip_len=2)
    other = tmp_path / "q50.avi"
    _mk_avi(other, quality=50)
    with pytest.raises(JpegStreamError, match="quant tables"):
        MjpegClipLoader([clip_avi, str(other)], clip_len=2)


def test_midstream_quant_change_detected(tmp_path):
    """Adaptive-DQT streams must raise, not silently decode with stale
    bases (the pipeline folds one table set into its basis matrices)."""
    import numpy as np

    from videoprocessingframework_tpu.io.jpeg import JpegCoefEncoder
    from videoprocessingframework_tpu.ops.jpeg import JpegDeviceEncoder

    p = tmp_path / "adaptive.mjpeg"
    rng = np.random.default_rng(0)
    with open(p, "wb") as f:
        for q in (90, 90, 90, 50, 50, 50):
            enc = JpegDeviceEncoder(H, W, quality=q)
            ce = JpegCoefEncoder(W, H, quant_tables=enc.quant_tables)
            y = rng.integers(0, 256, (1, H, W), np.uint8)
            u = rng.integers(0, 256, (1, H // 2, W // 2), np.uint8)
            v = rng.integers(0, 256, (1, H // 2, W // 2), np.uint8)
            cy, cu, cv = (np.asarray(c) for c in enc.encode_planes(y, u, v))
            f.write(ce.encode(cy[0], cu[0], cv[0]))
    ld = MjpegClipLoader(str(p), clip_len=2, batch_size=2,
                         output="rgb_u8", shuffle=False, workers=1,
                         lengths=[6])
    with pytest.raises(JpegStreamError, match="quant tables changed"):
        list(ld.epoch(0))


def test_gray_and_444_corpora(tmp_path):
    """The loader is generic over the probe's component count/sampling:
    grayscale (1-component) and 4:4:4 corpora work unchanged."""
    from videoprocessingframework_tpu.io.jpeg import JpegCoefEncoder
    from videoprocessingframework_tpu.ops.jpeg import JpegDeviceEncoder

    rng = np.random.default_rng(1)

    # grayscale raw MJPEG
    g = tmp_path / "g.mjpeg"
    enc = JpegDeviceEncoder(H, W, quality=90, subsampled="gray")
    ce = JpegCoefEncoder(W, H, quant_tables=enc.quant_tables,
                         subsampled="gray")
    with open(g, "wb") as f:
        for i in range(6):
            y = rng.integers(0, 256, (1, H, W), np.uint8)
            (cy,) = (np.asarray(c) for c in enc.encode_planes(y))
            f.write(ce.encode(cy[0]))
    ld = MjpegClipLoader(str(g), clip_len=2, batch_size=2,
                         output="rgb_u8", shuffle=True, seed=1,
                         workers=1, lengths=[6])
    assert ld.ncomp == 1
    batch = np.asarray(next(iter(ld.epoch(0))))
    assert batch.shape == (2, 2, H, W, 3)
    # gray: all three channels carry the luma
    assert np.array_equal(batch[..., 0], batch[..., 1])

    # 4:4:4 via MjpegWriter
    p = tmp_path / "c444.avi"
    yy = rng.integers(0, 256, (6, H, W), np.uint8)
    uu = rng.integers(0, 256, (6, H, W), np.uint8)
    vv = rng.integers(0, 256, (6, H, W), np.uint8)
    with MjpegWriter(str(p), W, H, sampling="444", container="avi") as wr:
        wr.write_planes(yy, uu, vv)
    ld = MjpegClipLoader(str(p), clip_len=2, batch_size=2,
                         output="planes", shuffle=False, workers=1)
    planes = next(iter(ld.epoch(0)))
    assert np.asarray(planes[1]).shape == (2, 2, H, W)  # full-res chroma


def test_bucketed_mjpeg(tmp_path):
    """BucketedClipLoader over mixed-geometry MJPEG corpora via
    loader_cls=MjpegClipLoader: the split codec per bucket."""
    from videoprocessingframework_tpu.data import BucketedClipLoader

    a = tmp_path / "ba.avi"
    b = tmp_path / "bb.avi"
    _mk_avi(a, n=8, seed=1)
    _mk_avi(b, n=8, seed=2, w=64, h=48)
    ld = BucketedClipLoader(
        [str(a), str(b)], out_size=(32, 32), clip_len=2, batch_size=2,
        output="rgb_u8", labels=[3, 5], seed=6, workers=1,
        loader_cls=MjpegClipLoader,
    )
    assert len(ld.loaders) == 2
    total = 0
    seen = set()
    for batch, labels in ld.epoch(0):
        arr = np.asarray(batch)
        assert arr.shape[1:] == (2, 32, 32, 3)
        total += arr.shape[0]
        seen.update(labels.tolist())
    assert total == ld.clips_per_epoch
    assert seen == {3, 5}


def test_augmented_mjpeg_loader(clip_avi):
    """Device-fused augmentation through the split-JPEG path: IDCT +
    crop/flip/jitter + CSC as ONE program; deterministic and
    resume-exact like the pixel loader's."""
    from videoprocessingframework_tpu.data import AugmentSpec

    spec = AugmentSpec(crop=True, crop_scale=(0.5, 1.0), hflip=0.5,
                       brightness=0.2)
    kw = dict(clip_len=2, batch_size=2, out_size=(32, 32),
              output="rgb_u8", seed=7, workers=1, augment=spec)
    a = [np.asarray(b) for b in MjpegClipLoader(clip_avi, **kw).epoch(0)]
    b = [np.asarray(b) for b in MjpegClipLoader(clip_avi, **kw).epoch(0)]
    assert a[0].shape == (2, 2, 32, 32, 3)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)
    # differs from the unaugmented stream
    plain = next(iter(MjpegClipLoader(
        clip_avi, clip_len=2, batch_size=2, out_size=(32, 32),
        output="rgb_u8", seed=7, workers=1,
    ).epoch(0)))
    assert (np.asarray(plain) != a[0]).any()

    # mid-epoch resume reproduces the exact augmented stream
    full = [np.asarray(x) for x in MjpegClipLoader(clip_avi, **kw).epoch(1)]
    ld = MjpegClipLoader(clip_avi, **kw)
    it = ld.epoch(1)
    got = [np.asarray(next(it))]
    state = ld.state_dict()
    del it
    ld2 = MjpegClipLoader(clip_avi, **kw)
    ld2.load_state_dict(state)
    rest = [np.asarray(x) for x in ld2.epoch()]
    for x, y in zip(got + rest, full):
        assert np.array_equal(x, y)


def test_augmented_mjpeg_rejects_planes(clip_avi):
    from videoprocessingframework_tpu.data import AugmentSpec

    with pytest.raises(ValueError, match="planes"):
        MjpegClipLoader(clip_avi, output="planes",
                        augment=AugmentSpec())
