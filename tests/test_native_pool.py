"""Native decode pool tests: exact frame counts, multi-stream, partial
drain, zero-copy batch views, fused post-processing."""

import numpy as np
import pytest

from videoprocessingframework_tpu.core.enums import (
    ColorRange,
    ColorSpace,
    PixelFormat,
)
from videoprocessingframework_tpu.io import NativeDecodePool, VideoReader
from videoprocessingframework_tpu.ops.fused import FusedPipeline


def test_pool_single_stream_counts(test_mp4, gt):
    pool = NativeDecodePool([test_mp4], batch_size=8)
    total = 0
    while True:
        batch = pool.acquire()
        if batch is None:
            break
        assert batch.shape[1:] == (
            gt["height"] * 3 // 2,
            gt["width"],
        )
        total += batch.shape[0]
        pool.release()
    assert total == gt["num_frames"]
    assert pool.frames_decoded == gt["num_frames"]


def test_pool_multi_stream_counts(test_mp4, gt):
    pool = NativeDecodePool([test_mp4] * 3, batch_size=16)
    total = 0
    while True:
        b = pool.acquire()
        if b is None:
            break
        total += b.shape[0]
        pool.release()
    assert total == 3 * gt["num_frames"]


def test_pool_max_frames_and_loop(test_mp4):
    pool = NativeDecodePool(
        [test_mp4], batch_size=4, loop=True, max_frames_per_stream=150
    )
    total = 0
    while True:
        b = pool.acquire()
        if b is None:
            break
        total += b.shape[0]
        pool.release()
    assert total == 150  # looped past one 96-frame pass, stopped exactly


def test_pool_frames_match_reader(test_mp4, gt):
    """Pool output must be bit-identical to the single-session reader."""
    reader_frames = [f.data.copy() for f in VideoReader(test_mp4).frames()]
    pool = NativeDecodePool([test_mp4], batch_size=8)
    got = []
    while True:
        b = pool.acquire()
        if b is None:
            break
        got.extend(b.reshape(b.shape[0], -1).copy())
        pool.release()
    assert len(got) == len(reader_frames)
    for a, b_ in zip(got, reader_frames):
        np.testing.assert_array_equal(a, b_)


def test_pool_with_fused_postproc(test_mp4, gt):
    pool = NativeDecodePool([test_mp4], batch_size=8)
    post = FusedPipeline(
        PixelFormat.NV12, ColorSpace.BT_709, ColorRange.MPEG,
        out_size=(64, 32),
    )
    total = 0
    for out in pool.batches(post):
        arr = np.asarray(out)
        assert arr.shape[1:] == (32, 64, 3)
        total += arr.shape[0]
    assert total == gt["num_frames"]


def test_pool_bad_source():
    pool = NativeDecodePool.__new__(NativeDecodePool)
    with pytest.raises(RuntimeError):
        NativeDecodePool(["/nonexistent/file.mp4"])


def test_pool_counts_dropped_frames_on_res_change(test_res_change, gt):
    """Batch slots are fixed-geometry: frames after a mid-stream resolution
    change are zero-filled AND counted (never silently packed at the wrong
    layout, even when the new frames are smaller and would fit)."""
    pool = NativeDecodePool([test_res_change], batch_size=4)
    total = 0
    for batch in pool.batches():
        total += batch.shape[0]
    assert total == gt["num_frames"]
    # test_res_change.h264 switches to 0.5x at frame 47 → 47 small frames
    assert pool.frames_dropped == 47
    assert "resolution change" in pool.drop_reason
    pool.close()


def test_pool_no_drops_on_clean_stream(test_mp4):
    pool = NativeDecodePool([test_mp4], batch_size=8)
    for _ in pool.batches():
        pass
    assert pool.frames_dropped == 0
    assert pool.drop_reason == ""
    pool.close()


def test_pool_pipelined_depth_matches_serial(test_mp4):
    """depth=2 (default, one deferred drain in flight) must yield the
    SAME batches in the same order as the block-immediately depth=1 path:
    the deferred release may not let a decode worker recycle a slot
    before its upload completed."""
    def collect(depth):
        pool = NativeDecodePool([test_mp4], batch_size=8)
        outs = [np.asarray(o).copy() for o in pool.batches(depth=depth)]
        pool.close()
        return outs

    serial, piped = collect(1), collect(2)
    assert len(serial) == len(piped)
    for a, b in zip(serial, piped):
        np.testing.assert_array_equal(a, b)


def test_pool_pipelined_early_close_releases_slots(test_mp4):
    """Closing the batches() generator mid-stream must release every held
    ring slot (the finally path), leaving the pool drainable."""
    pool = NativeDecodePool([test_mp4], batch_size=8)
    it = pool.batches(depth=3)
    next(it)
    it.close()  # two batches still held at depth=3
    n = 0
    while pool.acquire() is not None:
        pool.release()
        n += 1
    assert n > 0  # the remaining stream drains — no slot leak deadlock
    pool.close()


def test_pool_planar_views_match_packed(test_mp4):
    """The planar (y, u, v) view feed (auto-enabled for YUV420 pools with
    a matching FusedPipeline) must produce bit-identical outputs to the
    packed single-buffer feed — the views are pure reinterpretations of
    the same ring bytes."""
    post = FusedPipeline(
        PixelFormat.YUV420, ColorSpace.BT_709, ColorRange.MPEG,
        out_size=(64, 32),
    )

    def collect(planar_views):
        pool = NativeDecodePool(
            [test_mp4], batch_size=8, out_format=PixelFormat.YUV420
        )
        outs = [
            np.asarray(o).copy()
            for o in pool.batches(post, planar_views=planar_views)
        ]
        pool.close()
        return outs

    packed, planar = collect(False), collect(None)  # None → auto-enables
    assert len(packed) == len(planar) > 0
    for a, b in zip(packed, planar):
        np.testing.assert_array_equal(a, b)


def test_pool_plane_major_matches_frame_major(test_mp4):
    """Plane-major ring layout ([Y×batch | U×batch | V×batch] — the
    zero-staging-copy feed) must produce bit-identical postproc outputs
    to the frame-major planar-view path."""
    post = FusedPipeline(
        PixelFormat.YUV420, ColorSpace.BT_709, ColorRange.MPEG,
        out_size=(64, 32),
    )

    def collect(plane_major):
        pool = NativeDecodePool(
            [test_mp4], batch_size=8, out_format=PixelFormat.YUV420,
            plane_major=plane_major,
        )
        outs = [np.asarray(o).copy() for o in pool.batches(post)]
        assert pool.frames_dropped == 0
        pool.close()
        return outs

    fm, pm = collect(False), collect(True)
    assert len(fm) == len(pm) > 0
    for a, b in zip(fm, pm):
        np.testing.assert_array_equal(a, b)


def test_pool_plane_major_raw_planes_match_reader(test_mp4):
    """acquire_planes() views must carry the decoder's exact plane bytes
    (incl. the ragged last batch using capacity-strided regions)."""
    from videoprocessingframework_tpu.io.decoder import VideoReader

    r = VideoReader(test_mp4)
    r.decoder.output_format = PixelFormat.YUV420
    frames = [np.asarray(f.data).reshape(-1).copy() for f in r.frames()]

    pool = NativeDecodePool(
        [test_mp4], batch_size=7,  # 96 % 7 != 0 → ragged tail batch
        out_format=PixelFormat.YUV420, plane_major=True,
    )
    h, w = pool.height, pool.width
    ysz = h * w
    i = 0
    while True:
        planes = pool.acquire_planes()
        if planes is None:
            break
        y, u, v = planes
        for k in range(y.shape[0]):
            ref = frames[i]
            np.testing.assert_array_equal(y[k], ref[:ysz].reshape(h, w))
            ref_u = ref[ysz: ysz + ysz // 4].reshape(h // 2, w // 2)
            ref_v = ref[ysz + ysz // 4:].reshape(h // 2, w // 2)
            np.testing.assert_array_equal(u[k], ref_u)
            np.testing.assert_array_equal(v[k], ref_v)
            i += 1
        pool.release()
    assert i == len(frames)
    pool.close()


def test_pool_plane_major_rejects_other_formats(test_mp4):
    with pytest.raises(ValueError, match="YUV420"):
        NativeDecodePool([test_mp4], out_format=PixelFormat.NV12,
                         plane_major=True)


def test_pool_planar_views_rejected_on_non_yuv420(test_mp4):
    """Explicit planar_views=True on an NV12 pool must raise — the packed
    buffer's interleaved UV rows are not planar u/v planes (advisor r2)."""
    pool = NativeDecodePool(
        [test_mp4], batch_size=4, out_format=PixelFormat.NV12
    )
    with pytest.raises(ValueError, match="planar_views"):
        next(pool.batches(planar_views=True))
    pool.close()


def test_pool_flat_feed_matches_plane_feed(test_mp4):
    """The single-transfer flat feed (plane-major ring uploaded as ONE
    contiguous array, split on device) must be bit-identical to the
    3-plane-view feed, including the ragged tail batch (96 frames at
    batch 7 → 13 full + 1 ragged)."""
    post = FusedPipeline(
        PixelFormat.YUV420, ColorSpace.BT_709, ColorRange.MPEG,
        out_size=(64, 32),
    )

    def collect(flat):
        pool = NativeDecodePool(
            [test_mp4], batch_size=7, out_format=PixelFormat.YUV420,
            plane_major=True,
        )
        outs = [
            np.asarray(o).copy()
            for o in pool.batches(post, planar_flat=flat)
        ]
        pool.close()
        return outs

    a, b = collect(False), collect(True)
    assert len(a) == len(b) == 14
    assert b[-1].shape[0] == 96 - 13 * 7  # ragged tail preserved
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


@pytest.mark.slow
def test_pool_soak_loop_flat(test_mp4):
    """Soak: 1000+ looped frames through the plane-major flat feed — no
    drops, exact frame accounting, no slot leaks (the drain path releases
    every ring slot or the pool would deadlock long before 1000)."""
    post = FusedPipeline(
        PixelFormat.YUV420, ColorSpace.BT_709, ColorRange.MPEG,
        out_size=(64, 32),
    )
    pool = NativeDecodePool(
        [test_mp4], batch_size=8, out_format=PixelFormat.YUV420,
        plane_major=True, loop=True, max_frames_per_stream=1000,
    )
    n = 0
    for out in pool.batches(post):
        n += int(out.shape[0])
    assert n == 1000
    assert pool.frames_dropped == 0
    pool.close()


def test_pool_transfer_priority_matches_overlap(test_mp4):
    """The transfer-priority bracket (pause decode while a transfer is in
    flight — the 1-core default after the r5 finding that a decoding
    worker starves the transfer client 15-100x) must yield bit-identical
    batches to the overlapped mode, and pausing must never deadlock the
    acquire loop (workers resume before the next acquire)."""
    def collect(tp):
        pool = NativeDecodePool([test_mp4], batch_size=8)
        outs = [
            np.asarray(o).copy()
            for o in pool.batches(depth=2, transfer_priority=tp)
        ]
        pool.close()
        return outs

    overlapped, prioritized = collect(False), collect(True)
    assert len(overlapped) == len(prioritized) > 0
    for a, b in zip(overlapped, prioritized):
        np.testing.assert_array_equal(a, b)


def test_pool_pause_resume_direct(test_mp4):
    """pause(True) stops slot production after in-flight frames;
    pause(False) resumes it — and a paused pool still drains already-
    ready batches."""
    import time as _t

    pool = NativeDecodePool(
        [test_mp4], batch_size=4, loop=True, max_frames_per_stream=0
    )
    assert pool.acquire() is not None
    pool.release()
    pool.pause(True)
    _t.sleep(0.3)  # let workers finish in-flight frames and park
    before = pool.frames_decoded
    _t.sleep(0.5)
    assert pool.frames_decoded <= before + pool.batch_size  # parked
    pool.pause(False)
    deadline = _t.monotonic() + 10.0
    while pool.frames_decoded <= before and _t.monotonic() < deadline:
        _t.sleep(0.05)
    assert pool.frames_decoded > before  # resumed
    pool.close()
