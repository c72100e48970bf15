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
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

import jax

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
    ):
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
        )
        self._n_buffers = n_buffers
        if not self._h:
            raise RuntimeError(f"pool create failed: {_lib.last_error()}")
        self.timer = StageTimer()

    def acquire(self) -> Optional[np.ndarray]:
        """Next packed batch as a zero-copy (count, rows, W) view, or None
        when all streams are drained. Call :meth:`release` when done."""
        data = C.POINTER(C.c_uint8)()
        count = C.c_int()
        r = self._lib.vpf_pool_acquire_batch(
            self._h, C.byref(data), C.byref(count)
        )
        if r == _lib.NEED_MORE:
            return None
        if r != _lib.OK:
            raise RuntimeError(_lib.last_error())
        n = count.value
        flat = np.ctypeslib.as_array(data, shape=(n * self.frame_bytes,))
        return flat.reshape(n, self._rows, self.width)

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
        """
        depth = max(1, min(depth, max(1, int(getattr(self, "_n_buffers", 4)) - 1)))
        if planar_views is None:
            planar_views = (
                postproc is not None
                and self.out_format == PixelFormat.YUV420
                and getattr(postproc, "src_format", None)
                == PixelFormat.YUV420
            )
        pending: list = []  # FIFO of dispatched outs; slot release deferred

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
                    batch = self.acquire()
                if batch is None:
                    break
                with self.timer.measure("dispatch"), trace_range(
                    "FusedPostproc"
                ):
                    if postproc is not None:
                        out = (
                            postproc(*self._planar_views(batch))
                            if planar_views else postproc(batch)
                        )
                    else:
                        out = jax.device_put(batch)
                        if next(iter(out.devices())).platform == "cpu":
                            # CPU-jax device_put may zero-copy-ALIAS the
                            # ring slot's host memory; a device-side copy
                            # breaks the alias before the slot is recycled
                            # (jit postproc outputs are always fresh)
                            out = out.copy()
                pending.append(out)
                if len(pending) >= depth:
                    yield drain_one()
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
