"""NativeDecodePool — the all-native multi-stream decode scheduler.

N worker threads live entirely in C++ (io/native/pool.cpp): demux, decode
and frame packing never touch the Python interpreter. Python only acquires
whole packed batches (zero-copy views into the pool's ring) and feeds them
to the jitted post-processing, then releases the buffer.

This is the production serving path; :class:`..parallel.streams.
MultiStreamPipeline` remains the flexible Python-level pipeline (custom
post-processing per frame, seek, metadata access).
"""

from __future__ import annotations

import ctypes as C
import os
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

import jax

#: sentinel distinguishing "nothing drained" from a drained None
_NOTHING = object()

from ..core import geometry
from ..core.enums import PixelFormat
from ..utils.tracing import StageTimer, trace_range
from . import _lib
from .demuxer import FFmpegDemuxer


class NativeDecodePool:
    def __init__(
        self,
        sources: Sequence[str],
        batch_size: int = 8,
        out_format: PixelFormat = PixelFormat.NV12,
        loop: bool = False,
        max_frames_per_stream: int = 0,
        n_buffers: int = 4,
        plane_major: bool = False,
    ):
        """``plane_major`` (YUV420 only) lays each ring buffer out as
        [Y×batch | U×batch | V×batch] so :meth:`_planar_views` returns
        CONTIGUOUS per-plane batch arrays — the device runtime stages
        them with zero host re-copies (the frame-major layout's views
        are strided and cost a full ~25 MB/batch staging copy at 1080p).
        Plane-major pools only serve the planar-view feed; the packed
        per-frame view from :meth:`acquire` is unavailable."""
        self._lib = _lib.load()
        probe = FFmpegDemuxer(sources[0])
        self.width = probe.width
        self.height = probe.height
        self.color_space = probe.color_space
        self.color_range = probe.color_range
        probe.close()
        self.batch_size = batch_size
        self.out_format = PixelFormat(out_format)
        self.frame_bytes = geometry.host_frame_size(
            out_format, self.width, self.height
        )
        self._rows = self.frame_bytes // self.width
        if plane_major and self.out_format != PixelFormat.YUV420:
            raise ValueError("plane_major pools require YUV420 output")
        self.plane_major = bool(plane_major)
        urls = (C.c_char_p * len(sources))(
            *[str(s).encode() for s in sources]
        )
        self._h = self._lib.vpf_pool_create(
            urls,
            len(sources),
            batch_size,
            self.frame_bytes,
            int(self.out_format),
            1 if loop else 0,
            max_frames_per_stream,
            n_buffers,
            1 if plane_major else 0,
        )
        self._n_buffers = n_buffers
        if not self._h:
            raise RuntimeError(f"pool create failed: {_lib.last_error()}")
        self.timer = StageTimer()

    def pause(self, paused: bool = True) -> None:
        """Transfer-priority handshake: ``pause(True)`` puts the decode
        workers to sleep after their in-flight frame; ``pause(False)``
        wakes them. Decode is pure throughput work while the
        host→device transfer client is latency-sensitive — on a 1-core
        host a decoding worker starves it 15-100x (measured r5: the
        same upload ran 1300-1500 MB/s against an idle pool and
        9-38 MB/s against a decoding one; most of what earlier rounds
        attributed to 'tunnel weather' was this). :meth:`batches`
        brackets its dispatch+drain window with this automatically
        (``transfer_priority``)."""
        self._lib.vpf_pool_pause(self._h, 1 if paused else 0)

    def _acquire_raw(self):
        data = C.POINTER(C.c_uint8)()
        count = C.c_int()
        r = self._lib.vpf_pool_acquire_batch(
            self._h, C.byref(data), C.byref(count)
        )
        if r == _lib.NEED_MORE:
            return None, 0
        if r != _lib.OK:
            raise RuntimeError(_lib.last_error())
        return data, count.value

    def acquire(self) -> Optional[np.ndarray]:
        """Next packed batch as a zero-copy (count, rows, W) view, or None
        when all streams are drained. Call :meth:`release` when done."""
        if self.plane_major:
            raise RuntimeError(
                "plane-major pools have no packed per-frame layout; use "
                "acquire_planes() / batches()"
            )
        data, n = self._acquire_raw()
        if data is None:
            return None
        flat = np.ctypeslib.as_array(data, shape=(n * self.frame_bytes,))
        return flat.reshape(n, self._rows, self.width)

    def acquire_planes(self):
        """Next batch of a plane-major pool as zero-copy CONTIGUOUS
        (y, u, v) batch views, or None when drained. Call :meth:`release`
        when done."""
        if not self.plane_major:
            raise RuntimeError("acquire_planes() needs plane_major=True")
        data, n = self._acquire_raw()
        if data is None:
            return None
        cap = self.batch_size
        h, w = self.height, self.width
        ysz, csz = h * w, (h // 2) * (w // 2)
        flat = np.ctypeslib.as_array(data, shape=(cap * self.frame_bytes,))
        y = flat[: n * ysz].reshape(n, h, w)
        u = flat[cap * ysz: cap * ysz + n * csz].reshape(n, h // 2, w // 2)
        v = flat[
            cap * (ysz + csz): cap * (ysz + csz) + n * csz
        ].reshape(n, h // 2, w // 2)
        return y, u, v

    def acquire_flat(self):
        """Next FULL plane-major batch as ONE zero-copy contiguous 1-D
        view (the whole ring buffer region, [Y×cap | U×cap | V×cap]), or
        the (y, u, v) views for a ragged tail (count < batch), or None
        when drained. One flat view = ONE host→device transfer per batch
        instead of three — each transfer pays a fixed link overhead, so
        this shaves the per-batch dispatch cost (split happens on device
        inside the consumer's jit; see :meth:`batches`)."""
        if not self.plane_major:
            raise RuntimeError("acquire_flat() needs plane_major=True")
        data, n = self._acquire_raw()
        if data is None:
            return None
        cap = self.batch_size
        if n != cap:  # ragged tail: shapes differ, use the plane views
            h, w = self.height, self.width
            ysz, csz = h * w, (h // 2) * (w // 2)
            flat = np.ctypeslib.as_array(
                data, shape=(cap * self.frame_bytes,)
            )
            return (
                flat[: n * ysz].reshape(n, h, w),
                flat[cap * ysz: cap * ysz + n * csz].reshape(
                    n, h // 2, w // 2
                ),
                flat[cap * (ysz + csz): cap * (ysz + csz) + n * csz]
                .reshape(n, h // 2, w // 2),
            )
        return np.ctypeslib.as_array(data, shape=(cap * self.frame_bytes,))

    def flat_postproc_fn(self, postproc):
        """Jitted wrapper running ``postproc(y, u, v)`` on ONE flat
        plane-major batch upload (the :meth:`acquire_flat` layout), the
        single-transfer feed shared by :meth:`batches` and
        MultiDeviceStreamPipeline. ``postproc`` must be jittable."""
        import jax

        cap, h, w = self.batch_size, self.height, self.width
        ysz, csz = h * w, (h // 2) * (w // 2)

        @jax.jit
        def fn(flat):
            y = flat[: cap * ysz].reshape(cap, h, w)
            u = flat[cap * ysz: cap * (ysz + csz)].reshape(
                cap, h // 2, w // 2
            )
            v = flat[cap * (ysz + csz):].reshape(cap, h // 2, w // 2)
            return postproc(y, u, v)

        return fn

    def release(self) -> None:
        self._lib.vpf_pool_release_batch(self._h)

    @property
    def frames_decoded(self) -> int:
        return self._lib.vpf_pool_frames_decoded(self._h)

    @property
    def frames_dropped(self) -> int:
        """Frames zero-filled because frame packing failed (e.g. a
        mid-stream resolution change made the frame not fit its slot)."""
        return self._lib.vpf_pool_frames_dropped(self._h)

    @property
    def drop_reason(self) -> str:
        """First packing-failure reason ('' when nothing was dropped)."""
        return self._lib.vpf_pool_drop_reason(self._h).decode(
            "utf-8", "replace"
        )

    def _planar_views(self, batch: np.ndarray):
        """Free numpy views (y, u, v) over a packed planar-YUV420 batch —
        each plane block is contiguous per frame, so the reshapes never
        copy. Feeding the jitted call three views instead of the packed
        buffer removes the device-side packed→planar relayout (~7 µs/frame
        at 1080p, measured) at the cost of two extra (pipelined) transfer
        dispatches."""
        h, w = self.height, self.width
        n = batch.shape[0]
        y = batch[:, :h, :]
        u = batch[:, h: h + h // 4, :].reshape(n, h // 2, w // 2)
        v = batch[:, h + h // 4:, :].reshape(n, h // 2, w // 2)
        return y, u, v

    def batches(
        self,
        postproc: Optional[Callable] = None,
        depth: int = 2,
        planar_views: Optional[bool] = None,
        planar_flat: Optional[bool] = None,
        transfer_priority: Optional[bool] = None,
    ) -> Iterator:
        """Yield post-processed device batches.

        ``planar_views`` feeds ``postproc(y, u, v)`` plane views instead
        of ``postproc(packed)`` (see :meth:`_planar_views`). Default
        (None) enables it automatically when this pool decodes planar
        YUV420 and ``postproc`` declares a matching ``src_format`` (the
        bundled :class:`~..ops.fused.FusedPipeline` does).

        ``depth`` batches are kept in flight: batch *i* is dispatched
        (async) before batch *i-depth+1* is blocked on and its ring slot
        released. The block is the correctness barrier — a slot's host
        memory is only recycled after the device has finished reading it —
        but deferring it one batch hides the per-dispatch link round trip
        (~40 ms on tunneled hosts) and the kernel time behind the next
        batch's decode+dispatch. ``depth=1`` restores block-immediately.
        Concurrent in-flight transfers share (not add) link bandwidth, so
        at transfer-bound weather this is neutral; when decode or RTT
        bound it overlaps the stages. Requires ``depth < n_buffers`` so
        the decode workers keep free slots.

        Stage timers: ``acquire`` = waiting on the native decode workers
        (decode-bound when large), ``dispatch`` = the async postproc call
        (host staging), ``drain`` = waiting on upload + fused kernel
        (transfer-bound when large).

        ``transfer_priority`` (default: auto — on for 1-core hosts)
        brackets each dispatch+drain window with :meth:`pause`: the
        decode workers sleep while a transfer is in flight and decode
        during the acquire wait and the consumer's own processing. On a
        single core a decoding worker starves the latency-sensitive
        transfer client 15-100x (measured), so serializing the two
        phases (≈ 1/(decode+upload) per batch) beats the collapsed
        overlap by an order of magnitude; multi-core hosts keep true
        overlap (default off).
        """
        depth = max(1, min(depth, max(1, int(getattr(self, "_n_buffers", 4)) - 1)))
        if transfer_priority is None:
            transfer_priority = (os.cpu_count() or 1) == 1
        # worker priority follows the mode: SCHED_IDLE (the spawn
        # default) suits the serialized bracket (decode is paused during
        # transfers and owns the core during acquire waits), but in the
        # OVERLAPPED mode it starves decode instead — the consumer
        # thread rarely blocks (measured r5: acquire 90 ms/batch idle
        # vs 4 ms at normal priority). Flip to fair scheduling there.
        self._lib.vpf_pool_worker_priority(
            self._h, 1 if transfer_priority else 0
        )
        if planar_views is None:
            planar_views = self.plane_major or (
                postproc is not None
                and self.out_format == PixelFormat.YUV420
                and getattr(postproc, "src_format", None)
                == PixelFormat.YUV420
            )
        elif planar_views and self.out_format != PixelFormat.YUV420:
            # an explicit planar_views=True on e.g. an NV12 pool would
            # silently reinterpret interleaved UV rows as bogus u/v planes
            raise ValueError(
                f"planar_views requires a YUV420 pool, not {self.out_format}"
            )
        if self.plane_major and not planar_views:
            raise ValueError(
                "plane-major pools only serve the planar-view feed"
            )
        pending: list = []  # FIFO of dispatched outs; slot release deferred
        # Flat single-transfer feed (plane-major + postproc only): the
        # ring buffer is ONE contiguous region, so after the first batch
        # (fed as 3 plane views — a concrete call that lets kernel
        # auto-tuning pick) later FULL batches upload as ONE array and
        # split on device inside the same jit. Three transfers → one
        # shaves the fixed per-transfer link overhead per batch.
        flat_fn = None
        # the flat feed wraps postproc in jax.jit — auto-enable ONLY for
        # pipelines declaring the planar contract (FusedPipeline's
        # src_format, same signal as planar_views auto); an arbitrary
        # eager callable keeps the per-plane eager feed unless the caller
        # passes planar_flat=True explicitly (asserting jittability)
        if planar_flat is None:
            planar_flat = (
                getattr(postproc, "src_format", None) == PixelFormat.YUV420
            )
        use_flat = bool(
            self.plane_major and postproc is not None and planar_flat
        )

        def drain_one():
            out = pending[0]  # pop only after the block: if it raises,
            with self.timer.measure("drain"):  # the finally still frees
                jax.block_until_ready(out)     # this slot
            pending.pop(0)
            self.release()
            return out

        try:
            while True:
                with self.timer.measure("acquire"):
                    if use_flat and flat_fn is not None:
                        batch = self.acquire_flat()
                    elif self.plane_major:
                        batch = self.acquire_planes()
                    else:
                        batch = self.acquire()
                if batch is None:
                    break
                flat = None
                if use_flat and flat_fn is not None and not isinstance(
                    batch, tuple
                ):
                    flat = batch  # full batch as one contiguous view
                    planes = ()
                elif self.plane_major:
                    planes = batch
                elif planar_views:
                    planes = self._planar_views(batch)
                else:
                    planes = (batch,)
                if transfer_priority:
                    self.pause(True)  # decode off-core while uploading
                try:
                    with self.timer.measure("dispatch"), trace_range(
                        "FusedPostproc"
                    ):
                        if flat is not None:
                            out = flat_fn(flat)
                        elif postproc is not None:
                            out = postproc(*planes)
                            if use_flat and flat_fn is None:
                                # concrete call done (auto-tune picked):
                                # switch to the single-transfer feed
                                flat_fn = self.flat_postproc_fn(postproc)
                        else:
                            out = jax.tree_util.tree_map(
                                jax.device_put, planes
                            )
                            first = jax.tree_util.tree_leaves(out)[0]
                            if next(iter(first.devices())).platform == "cpu":
                                # CPU-jax device_put may zero-copy-ALIAS
                                # the ring slot's host memory; a device-
                                # side copy breaks the alias before the
                                # slot is recycled (jit postproc outputs
                                # are always fresh)
                                out = jax.tree_util.tree_map(
                                    lambda a: a.copy(), out
                                )
                            if not self.plane_major and not planar_views:
                                out = out[0]  # packed single-array contract
                    pending.append(out)
                    if len(pending) >= depth:
                        drained = drain_one()
                    else:
                        drained = _NOTHING
                finally:
                    if transfer_priority:
                        self.pause(False)  # decode during consumer time
                if drained is not _NOTHING:
                    yield drained
            while pending:
                yield drain_one()
        finally:
            # on early generator close / postproc failure, free held slots
            # (blocking first so no in-flight transfer reads a recycled slot)
            for out in pending:
                try:
                    jax.block_until_ready(out)
                except Exception:
                    pass
                self.release()
            pending.clear()

    def close(self) -> None:
        if self._h:
            self._lib.vpf_pool_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
