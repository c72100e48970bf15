"""Clip-sampling data loader: corpus probe, deterministic sampling,
frame-exact clip extraction (vs sequential decode), batching/shapes,
worker-count invariance, and mesh-sharded placement on the 8-device CPU
mesh. Reference analog: none (its ML samples decode one stream
sequentially) — this is the beyond-parity training-data layer."""

import numpy as np
import pytest

from videoprocessingframework_tpu.core.enums import (
    ColorRange,
    ColorSpace,
    PixelFormat,
)
from videoprocessingframework_tpu.data import (
    ClipSampler,
    VideoClipLoader,
    VideoCorpus,
)
from videoprocessingframework_tpu.io.decoder import VideoReader

W, H, NFRAMES = 848, 464, 96  # tests/assets/test.mp4 ground truth


@pytest.fixture(scope="module")
def corpus(test_mp4):
    return VideoCorpus([test_mp4])


@pytest.fixture(scope="module")
def all_frames(test_mp4):
    """Every frame of test.mp4 as packed YUV420 [rows, W]."""
    rd = VideoReader(test_mp4)
    rd.decoder.output_format = PixelFormat.YUV420
    rows = H * 3 // 2
    out = []
    for f in rd.frames():
        out.append(f.data.reshape(rows, W).copy())
    assert len(out) == NFRAMES
    return np.stack(out)


def test_corpus_probe(corpus, test_mp4):
    assert (corpus.width, corpus.height) == (W, H)
    assert corpus.streams[0].num_frames == NFRAMES
    sp, rg = corpus.majority_colorimetry()
    assert sp == ColorSpace.BT_709
    assert rg == ColorRange.MPEG


def test_corpus_rejects_mixed_geometry(test_mp4, tmp_path):
    from videoprocessingframework_tpu.io.jpeg import MjpegWriter

    p = tmp_path / "small.avi"
    y = np.full((2, 64, 96), 128, np.uint8)
    u = v = np.full((2, 32, 48), 128, np.uint8)
    with MjpegWriter(str(p), 96, 64, container="avi") as wr:
        wr.write_planes(y, u, v)
    with pytest.raises(ValueError, match="geometry mismatch"):
        VideoCorpus([test_mp4, str(p)])


def test_sampler_windows_and_determinism(corpus):
    s = ClipSampler(corpus, clip_len=8, stride=2, shuffle=True, seed=7)
    span = 15  # (8-1)*2+1
    assert s.span == span
    assert len(s) == (NFRAMES - span) // span + 1
    e0a, e0b, e1 = s.epoch(0), s.epoch(0), s.epoch(1)
    assert np.array_equal(e0a, e0b)
    assert not np.array_equal(e0a, e1)
    # every window in range, aligned to hop
    for fi, st in e0a:
        assert fi == 0
        assert 0 <= st <= NFRAMES - span
        assert st % span == 0
    # unshuffled enumeration is the raw order
    s2 = ClipSampler(corpus, clip_len=8, stride=2, shuffle=False)
    starts = s2.epoch(0)[:, 1]
    assert np.array_equal(starts, np.arange(len(s2)) * span)


def test_clip_frames_exact(corpus, all_frames):
    """Shuffled clips contain exactly the sequentially-decoded frames."""
    T, stride = 5, 3
    ld = VideoClipLoader(
        corpus, clip_len=T, frame_stride=stride, batch_size=2,
        output="packed", shuffle=True, seed=3, workers=1,
    )
    samples = ld.sampler.epoch(0)
    got = []
    for b in ld.epoch(0):
        got.append(np.asarray(b))
    flat = np.concatenate(got, axis=0)  # [nclips, T, rows, W]
    assert flat.shape[1:] == (T, H * 3 // 2, W)
    assert flat.shape[0] == len(samples)
    for clip, (fi, st) in zip(flat, samples):
        want = all_frames[st: st + T * stride: stride]
        assert np.array_equal(clip, want), f"clip at start {st} differs"


def test_worker_invariance(corpus):
    """workers=3 yields bit-identical batches to workers=1."""
    kw = dict(clip_len=4, frame_stride=1, batch_size=3, output="packed",
              shuffle=True, seed=11)
    a = [np.asarray(b) for b in
         VideoClipLoader(corpus, workers=1, **kw).epoch(2)]
    b = [np.asarray(b) for b in
         VideoClipLoader(corpus, workers=3, **kw).epoch(2)]
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_fused_output_and_shapes(corpus):
    ld = VideoClipLoader(
        corpus, clip_len=4, batch_size=2, out_size=(64, 96),
        output="normalized", drop_last=True, workers=1,
    )
    n = 0
    for batch in ld.epoch(0):
        arr = np.asarray(batch)
        assert arr.shape == (2, 4, 64, 96, 3)
        assert arr.dtype == np.float32
        n += 1
        if n >= 2:
            break
    assert n == 2
    assert len(ld) == ld.clips_per_epoch // 2


def test_fused_matches_decode_postproc(corpus, all_frames):
    """Loader output == decode_postproc over the same packed frames."""
    from videoprocessingframework_tpu.ops.fused import decode_postproc

    ld = VideoClipLoader(
        corpus, clip_len=3, batch_size=2, out_size=(56, 64),
        output="rgb_u8", shuffle=False, workers=1,
    )
    batch = next(iter(ld.epoch(0)))
    arr = np.asarray(batch)  # [2, 3, 56, 64, 3]
    packed = all_frames[:6].reshape(6, H * 3 // 2, W)
    want = np.asarray(decode_postproc(
        packed,
        src_format=PixelFormat.YUV420,
        space=ColorSpace.BT_709,
        rng=ColorRange.MPEG,
        out_h=56, out_w=64, output="rgb_u8",
    ))
    assert np.array_equal(arr.reshape(6, 56, 64, 3), want)


def test_drop_last_and_len(corpus):
    ld = VideoClipLoader(corpus, clip_len=7, batch_size=4,
                         output="packed", drop_last=False, workers=1)
    nclips = ld.clips_per_epoch
    batches = [np.asarray(b) for b in ld.epoch(0)]
    assert len(batches) == len(ld)
    assert sum(b.shape[0] for b in batches) == nclips
    ld2 = VideoClipLoader(corpus, clip_len=7, batch_size=4,
                          output="packed", drop_last=True, workers=1)
    batches2 = [np.asarray(b) for b in ld2.epoch(0)]
    assert len(batches2) == len(ld2) == nclips // 4
    assert all(b.shape[0] == 4 for b in batches2)


def test_multihost_shard_split(corpus):
    """shard_index/shard_count partition the epoch: disjoint, complete,
    and equal (as clip content) to the unsharded epoch."""
    kw = dict(clip_len=8, batch_size=2, output="packed", shuffle=True,
              seed=5, workers=1)
    full = VideoClipLoader(corpus, **kw)
    want = {
        bytes(c) for b in full.epoch(0) for c in np.asarray(b)
    }
    seen: list = []
    for si in range(2):
        ld = VideoClipLoader(corpus, shard_index=si, shard_count=2, **kw)
        for b in ld.epoch(0):
            seen.extend(bytes(c) for c in np.asarray(b))
    assert len(seen) == full.clips_per_epoch
    assert len(set(seen)) == len(seen)  # no overlap between shards
    assert set(seen) == want            # complete coverage


def test_sharded_device_placement(corpus):
    """NamedSharding over the 8-device CPU mesh: the fused postproc runs
    data-parallel and the yielded batch is distributed."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from videoprocessingframework_tpu.parallel import make_mesh

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs the multi-device CPU mesh")
    mesh = make_mesh(4, ("data",))
    sharding = NamedSharding(mesh, P("data"))
    ld = VideoClipLoader(
        corpus, clip_len=2, batch_size=2, out_size=(32, 32),
        output="rgb_u8", drop_last=True, sharding=sharding, workers=1,
    )
    batch = next(iter(ld.epoch(0)))
    assert batch.shape == (2, 2, 32, 32, 3)
    # distributed across the data axis (4 shards of the flat batch)
    assert len(batch.addressable_shards) >= 4
    # bit-identical to the unsharded path
    ld2 = VideoClipLoader(
        corpus, clip_len=2, batch_size=2, out_size=(32, 32),
        output="rgb_u8", drop_last=True, workers=1,
    )
    ref = next(iter(ld2.epoch(0)))
    assert np.array_equal(np.asarray(batch), np.asarray(ref))


def test_epoch_advance_via_iter(corpus):
    ld = VideoClipLoader(corpus, clip_len=8, batch_size=2,
                         output="packed", seed=1, workers=1)
    first = next(iter(ld))   # epoch 0, advances to 1
    second = next(iter(ld))  # epoch 1
    assert not np.array_equal(np.asarray(first), np.asarray(second))
    ld.set_epoch(0)
    again = next(iter(ld))
    assert np.array_equal(np.asarray(first), np.asarray(again))


def test_labels(corpus, test_mp4):
    ld = VideoClipLoader(
        [test_mp4, test_mp4], clip_len=4, batch_size=3,
        output="packed", labels=[7, 9], seed=2, workers=1,
    )
    order = ld.sampler.epoch(0)
    n = 0
    for batch, labels in ld.epoch(0):
        b = np.asarray(batch).shape[0]
        want = np.where(order[n:n + b, 0] == 0, 7, 9)
        assert np.array_equal(labels, want)
        n += b
    assert n == ld.clips_per_epoch
    with pytest.raises(ValueError, match="labels for"):
        VideoClipLoader([test_mp4], clip_len=4, output="packed",
                        labels=[1, 2])


def test_checkpoint_resume(corpus):
    kw = dict(clip_len=6, batch_size=2, output="packed", seed=13,
              workers=1)
    full = [np.asarray(b) for b in
            VideoClipLoader(corpus, **kw).epoch(1)]

    ld = VideoClipLoader(corpus, **kw)
    it = ld.epoch(1)
    got = [np.asarray(next(it)), np.asarray(next(it))]
    state = ld.state_dict()
    assert state == {"epoch": 1, "clips": 4}
    del it

    # fresh loader, same config: resumes after batch 2 exactly
    ld2 = VideoClipLoader(corpus, **kw)
    ld2.load_state_dict(state)
    rest = [np.asarray(b) for b in ld2.epoch()]
    assert len(got) + len(rest) == len(full)
    for x, y in zip(got + rest, full):
        assert np.array_equal(x, y)


def _mk_avi(path, w, h, n=6, seed=0):
    from videoprocessingframework_tpu.io.jpeg import MjpegWriter

    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, (n, h, w), np.uint8)
    u = rng.integers(0, 256, (n, h // 2, w // 2), np.uint8)
    v = rng.integers(0, 256, (n, h // 2, w // 2), np.uint8)
    with MjpegWriter(str(path), w, h, container="avi") as wr:
        wr.write_planes(y, u, v)


def test_bucketed_mixed_geometry(test_mp4, tmp_path):
    from videoprocessingframework_tpu.data import BucketedClipLoader

    a = tmp_path / "a.avi"
    b = tmp_path / "b.avi"
    _mk_avi(a, 96, 64, n=8, seed=1)
    _mk_avi(b, 64, 48, n=8, seed=2)
    ld = BucketedClipLoader(
        [test_mp4, str(a), str(b)], out_size=(32, 32),
        clip_len=2, batch_size=2, output="rgb_u8",
        labels=[0, 1, 2], seed=4, workers=1,
    )
    assert len(ld.loaders) == 3
    batches = list(ld.epoch(0))
    assert len(batches) == len(ld)
    total = 0
    label_set = set()
    for batch, labels in batches:
        arr = np.asarray(batch)
        assert arr.shape[1:] == (2, 32, 32, 3)
        total += arr.shape[0]
        label_set.update(labels.tolist())
    assert total == ld.clips_per_epoch
    assert label_set == {0, 1, 2}

    # deterministic schedule; epochs differ
    s0, s0b, s1 = ld._schedule(0), ld._schedule(0), ld._schedule(1)
    assert np.array_equal(s0, s0b)
    assert not np.array_equal(s0, s1)

    with pytest.raises(ValueError, match="packed"):
        BucketedClipLoader([test_mp4], out_size=(32, 32),
                           output="packed")


def test_bucketed_checkpoint_resume(test_mp4, tmp_path):
    from videoprocessingframework_tpu.data import BucketedClipLoader

    a = tmp_path / "ra.avi"
    _mk_avi(a, 96, 64, n=10, seed=3)
    kw = dict(out_size=(32, 32), clip_len=2, batch_size=2,
              output="rgb_u8", seed=9, workers=1)
    full = [np.asarray(b) for b in
            BucketedClipLoader([test_mp4, str(a)], **kw).epoch(1)]

    ld = BucketedClipLoader([test_mp4, str(a)], **kw)
    it = ld.epoch(1)
    first = [np.asarray(next(it)) for _ in range(3)]
    state = ld.state_dict()
    assert state == {"epoch": 1, "batches": 3}
    del it

    ld2 = BucketedClipLoader([test_mp4, str(a)], **kw)
    ld2.load_state_dict(state)
    rest = [np.asarray(b) for b in ld2.epoch()]
    assert len(first) + len(rest) == len(full)
    for x, y in zip(first + rest, full):
        assert np.array_equal(x, y)


def test_keyframe_aligned_sampling(tmp_path):
    """align_keyframes snaps clip starts to the GOP structure: every
    sampled window begins on a keyframe (zero replay decode on seeks)
    and content stays frame-exact."""
    from videoprocessingframework_tpu.io import VideoEncoder

    w, h, nf, gop = 320, 240, 48, 8
    enc = VideoEncoder({"codec": "h264", "preset": "P1", "s": f"{w}x{h}",
                        "fps": "30", "gop": str(gop), "bf": "0",
                        "bitrate": "2M"})
    rng = np.random.default_rng(0)
    from videoprocessingframework_tpu.core.enums import CodecId
    from videoprocessingframework_tpu.io import StreamMuxer

    p = tmp_path / "gop8.mp4"
    mux = StreamMuxer(str(p), CodecId.H264, w, h, fps=30.0, format="mp4")
    n_out = 0
    for i in range(nf):
        y = rng.integers(0, 256, (h, w), np.uint8)
        uv = np.full((h // 2, w), 120 + i, np.uint8)
        out = enc.encode(np.concatenate([y.ravel(), uv.ravel()]))
        if out is not None:
            mux.write(out[0], pts=n_out); n_out += 1
    for pkt, _ in enc.flush():
        mux.write(pkt, pts=n_out); n_out += 1
    mux.close()

    corpus = VideoCorpus([str(p)], lengths=[nf])
    kf = corpus.keyframe_indices(0)
    assert kf[0] == 0
    assert np.all(kf % gop == 0)
    assert len(kf) == nf // gop

    ld = VideoClipLoader(
        corpus, clip_len=4, batch_size=2, output="packed",
        shuffle=True, seed=2, workers=1, align_keyframes=True,
    )
    samples = ld.sampler.epoch(0)
    assert np.all(np.isin(samples[:, 1], kf))

    # content matches sequential decode
    rd = VideoReader(str(p))
    rd.decoder.output_format = PixelFormat.YUV420
    frames = [f.data.reshape(h * 3 // 2, w).copy() for f in rd.frames()]
    all_f = np.stack(frames)
    got = np.concatenate([np.asarray(b) for b in ld.epoch(0)], axis=0)
    for clip, (fi, st) in zip(got, samples):
        assert np.array_equal(clip, all_f[st: st + 4])


# -- device-fused augmentation (ops/augment.py via augment=) ----------------


def _aug_spec():
    from videoprocessingframework_tpu.data import AugmentSpec

    return AugmentSpec(
        crop=True, crop_scale=(0.5, 1.0), hflip=0.5,
        brightness=0.2, saturation=0.2,
    )


def test_augmented_loader_shapes_and_determinism(corpus):
    kw = dict(clip_len=2, batch_size=2, out_size=(32, 32),
              output="rgb_u8", seed=3, workers=1, augment=_aug_spec())
    a = [np.asarray(b) for b in VideoClipLoader(corpus, **kw).epoch(0)]
    b = [np.asarray(b) for b in VideoClipLoader(corpus, **kw).epoch(0)]
    assert a[0].shape == (2, 2, 32, 32, 3)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)
    # different epoch -> different augmentations of the same clips exist
    ld = VideoClipLoader(corpus, clip_len=2, batch_size=2,
                         out_size=(32, 32), output="rgb_u8", seed=3,
                         shuffle=False, workers=1, augment=_aug_spec())
    e0 = [np.asarray(x) for x in ld.epoch(0)]
    e1 = [np.asarray(x) for x in ld.epoch(1)]
    assert any((x != y).any() for x, y in zip(e0, e1))


def test_augmented_loader_differs_from_plain(corpus):
    kw = dict(clip_len=2, batch_size=2, out_size=(32, 32),
              output="rgb_u8", seed=3, workers=1)
    plain = next(iter(VideoClipLoader(corpus, **kw).epoch(0)))
    aug = next(iter(
        VideoClipLoader(corpus, augment=_aug_spec(), **kw).epoch(0)
    ))
    assert (np.asarray(plain) != np.asarray(aug)).any()


def test_augmented_resume_exact(corpus):
    """Augmentation keys derive from (seed, epoch, batch index), so a
    mid-epoch resume reproduces the exact augmented byte stream."""
    kw = dict(clip_len=4, batch_size=2, out_size=(24, 24),
              output="rgb_u8", seed=13, workers=1, augment=_aug_spec())
    full = [np.asarray(b) for b in VideoClipLoader(corpus, **kw).epoch(1)]

    ld = VideoClipLoader(corpus, **kw)
    it = ld.epoch(1)
    got = [np.asarray(next(it)), np.asarray(next(it))]
    state = ld.state_dict()
    del it
    ld2 = VideoClipLoader(corpus, **kw)
    ld2.load_state_dict(state)
    rest = [np.asarray(b) for b in ld2.epoch()]
    assert len(got) + len(rest) == len(full)
    for x, y in zip(got + rest, full):
        assert np.array_equal(x, y)


def test_augmented_sharded(corpus):
    """Augmented postproc under NamedSharding: batched per-clip matrices
    shard along the data axis like the plain pipeline."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from videoprocessingframework_tpu.parallel import make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs the multi-device CPU mesh")
    mesh = make_mesh(4, ("data",))
    kw = dict(clip_len=2, batch_size=2, out_size=(32, 32),
              output="rgb_u8", drop_last=True, workers=1,
              augment=_aug_spec())
    ld = VideoClipLoader(
        corpus, sharding=NamedSharding(mesh, P("data")), **kw
    )
    batch = next(iter(ld.epoch(0)))
    assert batch.shape == (2, 2, 32, 32, 3)
    ref = next(iter(VideoClipLoader(corpus, **kw).epoch(0)))
    assert np.array_equal(np.asarray(batch), np.asarray(ref))


def test_augment_rejects_packed(corpus):
    with pytest.raises(ValueError, match="packed"):
        VideoClipLoader(corpus, output="packed", augment=_aug_spec())


def test_augmented_shards_decorrelated(corpus):
    """Multi-host shards share the seed (disjointness requires an
    identical epoch permutation) — the augment counter must still be
    shard-unique so shard k's batch i and shard j's batch i get
    DIFFERENT crop/flip/jitter params."""
    kw = dict(clip_len=2, batch_size=2, out_size=(24, 24),
              output="rgb_u8", seed=5, workers=1, shuffle=False,
              augment=_aug_spec())
    s0 = VideoClipLoader(corpus, shard_index=0, shard_count=2, **kw)
    s1 = VideoClipLoader(corpus, shard_index=1, shard_count=2, **kw)
    # same pixel content into both shards' first batch: feed shard 1
    # the SAME clips by comparing augment params instead — sample the
    # keys the two dispatches derive and check they differ
    import jax

    from videoprocessingframework_tpu.ops.augment import (
        sample_augment_params,
    )

    def params(shard, idx):
        key = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(5), 0),
            idx * 2 + shard,
        )
        p = sample_augment_params(key, 2, H, W, _aug_spec())
        return np.asarray(p["y0"]), np.asarray(p["x0"])

    assert any(
        (a != b).any() for a, b in zip(params(0, 0), params(1, 0))
    )
    # and the loaders actually use shard-unique counters: first batches
    # of the two shards (different clips, so just exercise the path)
    b0 = next(iter(s0.epoch(0)))
    b1 = next(iter(s1.epoch(0)))
    assert np.asarray(b0).shape == np.asarray(b1).shape


def test_augment_rejects_pallas_and_split(corpus):
    with pytest.raises(ValueError, match="pallas"):
        VideoClipLoader(corpus, output="rgb_u8", kernel="pallas",
                        augment=_aug_spec())
    with pytest.raises(ValueError, match="split_bf16"):
        VideoClipLoader(corpus, output="rgb_u8", compute="split_bf16",
                        augment=_aug_spec())


def _mk_raw_h264(path, w, h, nf):
    """Raw Annex-B elementary stream (NO container): libav cannot seek
    it (no index), which exercises the loader's emulated-seek paths."""
    from videoprocessingframework_tpu.io import VideoEncoder

    # B-frames ON: a refused seek must leave the decode session intact
    # (decoder reset before a failed demuxer seek strands it mid-GOP —
    # every inter frame until the next IDR loses its references)
    enc = VideoEncoder({"codec": "h264", "preset": "P2", "s": f"{w}x{h}",
                        "fps": "30", "gop": "8", "bitrate": "2M"})
    rng = np.random.default_rng(7)
    stream = bytearray()
    for i in range(nf):
        y = rng.integers(0, 256, (h, w), np.uint8)
        uv = np.full((h // 2, w), 100 + i, np.uint8)
        out = enc.encode(np.concatenate([y.ravel(), uv.ravel()]))
        if out is not None:
            stream += out[0].tobytes()
    for pkt, _ in enc.flush():
        stream += pkt.tobytes()
    path.write_bytes(bytes(stream))


def test_unseekable_stream_multi_epoch_and_shuffle(tmp_path):
    """Raw elementary streams refuse av_seek_frame; the loader must
    emulate: forward gaps decode-and-discard, rewinds reopen the
    session. Regression for the r5 persistent-reader-cache change —
    epoch 2 over an unseekable source crashed with 'Seek isn't
    supported for this input' (the bench loader metric silently
    vanished to exactly this)."""
    w, h, nf = 320, 240, 32
    p = tmp_path / "raw.h264"
    _mk_raw_h264(p, w, h, nf)

    rd = VideoReader(str(p))
    rd.decoder.output_format = PixelFormat.YUV420
    all_f = np.stack([f.data.reshape(h * 3 // 2, w).copy()
                      for f in rd.frames()])
    assert len(all_f) == nf

    # sequential, two epochs: the epoch-1 rewind goes through _reopen
    ld = VideoClipLoader([str(p)], clip_len=4, batch_size=2,
                         output="packed", shuffle=False, workers=0,
                         lengths=[nf])
    for epoch in (0, 1):
        got = np.concatenate(
            [np.asarray(b) for b in ld.epoch(epoch)], axis=0
        )
        starts = ld.sampler.epoch(epoch)[:, 1]
        for clip, st in zip(got, starts):
            assert np.array_equal(clip, all_f[st: st + 4]), (
                f"epoch {epoch} clip @{st} mismatch"
            )
    assert ld.frame_stats["seeks"] >= 1  # the rewind was an emulated seek

    # shuffled: random starts force forward-gap skips AND rewinds
    ld2 = VideoClipLoader([str(p)], clip_len=4, batch_size=2,
                          output="packed", shuffle=True, seed=3,
                          workers=0, lengths=[nf])
    got = np.concatenate([np.asarray(b) for b in ld2.epoch(0)], axis=0)
    starts = ld2.sampler.epoch(0)[:, 1]
    for clip, st in zip(got, starts):
        assert np.array_equal(clip, all_f[st: st + 4]), f"clip @{st}"


def test_data_package_import_stays_light():
    """`import videoprocessingframework_tpu.data` must not pull in the
    ops package (jax-heavy kernels; the env's sitecustomize already
    imports bare jax at startup, so THAT can't be the probe).
    AugmentSpec loads lazily through data.__getattr__."""
    import subprocess
    import sys

    code = (
        "import sys\n"
        "import videoprocessingframework_tpu.data as d\n"
        "assert 'videoprocessingframework_tpu.ops' not in sys.modules, "
        "'data import pulled in the ops package'\n"
        "s = d.AugmentSpec()\n"        # lazy attr works...
        "assert 'videoprocessingframework_tpu.ops' in sys.modules\n"
        "print('ok')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env={**__import__('os').environ, "JAX_PLATFORMS": "cpu"},
        close_fds=False,
    )
    assert r.returncode == 0 and "ok" in r.stdout, r.stderr[-2000:]
