"""Multi-stream decode → batch → device pipeline.

TPU-first re-design of the reference's stream-per-thread concurrency model
(samples/SampleDecodeMultiThread.py: N python threads, a CUDA stream each,
per-thread NPP chains). The TPU shape of the same idea:

  N decode threads (GIL-free native calls) pack frames **directly into
  slots of pre-allocated packed batch buffers** (the pinned-buffer analog;
  zero intermediate copies) → each full batch is ONE contiguous
  ``jax.device_put`` → ONE fused batched kernel (ops/fused.py) for all
  streams → results double-buffer against the next upload.

So the device runs one big batched program instead of N tiny ones, the
host does exactly one pack per frame, and transfer overlaps compute —
the analog of pinned-memory + per-thread-stream overlap in the reference
(Tasks.cpp:584-662 upload; SURVEY.md §2.9).
"""

from __future__ import annotations

import os
import queue
import threading
import time
from dataclasses import dataclass
from typing import Callable, Iterator, List, Optional, Sequence

import numpy as np

import jax

from ..core import geometry
from ..core.enums import PixelFormat
from ..io.decoder import VideoReader
from ..utils.tracing import StageTimer, trace_range


@dataclass
class StreamStats:
    frames_decoded: int = 0
    batches: int = 0
    wall_s: float = 0.0

    @property
    def fps(self) -> float:
        return self.frames_decoded / self.wall_s if self.wall_s else 0.0


class _BatchRing:
    """Ring of packed host batch buffers with per-slot tickets.

    Buffer layout: (batch, rows, width) uint8 where rows = packed frame
    rows for the format (NV12: H + H/2). Workers claim (buffer, slot)
    tickets in FIFO order, pack a decoded frame into the slot, and mark it
    done; the consumer takes buffers in issue order.
    """

    def __init__(self, n_buffers: int, batch: int, rows: int, width: int):
        self.batch = batch
        self.buffers = [
            np.empty((batch, rows, width), np.uint8) for _ in range(n_buffers)
        ]
        self.done: List[set] = [set() for _ in range(n_buffers)]
        self.cond = threading.Condition()
        self.tickets: queue.Queue = queue.Queue()
        self.order: List[int] = []
        for b in range(n_buffers):
            self._issue(b)

    def _issue(self, b: int) -> None:
        with self.cond:
            self.order.append(b)
        for s in range(self.batch):
            self.tickets.put((b, s))

    def claim(self, timeout: float = 0.05):
        try:
            return self.tickets.get(timeout=timeout)
        except queue.Empty:
            return None

    def unclaim(self, ticket) -> None:
        self.tickets.put(ticket)

    def complete(self, b: int, s: int) -> None:
        with self.cond:
            self.done[b].add(s)
            self.cond.notify_all()

    def take(self, allow_partial: Callable[[], bool]):
        """Take the oldest buffer once it is full — or, when
        ``allow_partial()`` turns True, with however many slots are done.
        Returns (index, array, sorted_slot_list)."""
        with self.cond:
            while True:
                if self.order:
                    b = self.order[0]
                    if len(self.done[b]) == self.batch or allow_partial():
                        self.order.pop(0)
                        return b, self.buffers[b], sorted(self.done[b])
                self.cond.wait(timeout=0.05)

    def recycle(self, b: int) -> None:
        with self.cond:
            self.done[b].clear()
        self._issue(b)


class _DecodeWorker(threading.Thread):
    """One stream: decodes frames straight into claimed batch slots."""

    def __init__(self, sid, source, ring, stop_evt, max_frames, loop,
                 threads, out_format, gate=None):
        super().__init__(daemon=True, name=f"vpf-decode-{sid}")
        self.sid = sid
        self.gate = gate
        self.source = source
        self.ring = ring
        self.stop_evt = stop_evt
        self.max_frames = max_frames
        self.loop = loop
        self.decode_threads = threads
        self.out_format = out_format
        self.frames = 0
        self.error: Optional[BaseException] = None

    def _emit(self, reader) -> bool:
        """Decode one frame into a claimed slot; False at stream end."""
        while True:
            ticket = self.ring.claim()
            if ticket is not None:
                break
            if self.stop_evt.is_set():
                return False
        b, s = ticket
        if self.gate is not None:
            self.gate.wait()
        try:
            frame = reader.decode(out=self.ring.buffers[b][s])
        except BaseException:
            self.ring.unclaim(ticket)
            raise
        if frame is None:
            self.ring.unclaim(ticket)
            return False
        self.ring.complete(b, s)
        self.frames += 1
        return True

    def run(self):
        try:
            while not self.stop_evt.is_set():
                reader = VideoReader(self.source, threads=self.decode_threads)
                if self.out_format is not None:
                    reader.decoder.output_format = self.out_format
                while not self.stop_evt.is_set():
                    if not self._emit(reader):
                        break
                    if self.max_frames and self.frames >= self.max_frames:
                        return
                if not self.loop or self.stop_evt.is_set():
                    return
        except BaseException as e:
            self.error = e


class MultiStreamPipeline:
    """Decode N streams in parallel and yield batched device results.

    ``postproc`` is a callable over ONE packed batched plane array
    (e.g. a :class:`~videoprocessingframework_tpu.ops.fused.FusedPipeline`
    bound to packed-NV12 input); None yields the uploaded packed batches.
    """

    def __init__(
        self,
        sources: Sequence[str],
        batch_size: int = 8,
        postproc: Optional[Callable] = None,
        device=None,
        max_frames_per_stream: Optional[int] = None,
        loop_streams: bool = False,
        decode_threads: int = 0,  # 0 = libav auto: its native threads fill the core while transfers sleep
        inflight: int = 3,
        out_format: PixelFormat = PixelFormat.NV12,
        gate_decode: Optional[bool] = None,
        serial: Optional[bool] = None,
    ):
        self.sources = list(sources)
        self.batch_size = batch_size
        self.postproc = postproc
        self.device = device or jax.devices()[0]
        self.max_frames = max_frames_per_stream
        self.loop_streams = loop_streams
        self.decode_threads = decode_threads
        self.inflight = max(1, inflight)
        self.out_format = out_format
        ncpu = os.cpu_count() or 1
        # Threading policy by host size (measured on 1-core hosts: decode
        # threads starve the transfer path 5-10x; fully serial round-robin
        # is 2x faster than threaded there):
        #   serial      — single core: no worker threads at all
        #   gate_decode — few cores: threads, but alternate decode/upload
        #   overlapped  — enough cores: full overlap (default design)
        if serial is None:
            serial = ncpu == 1
        self.serial = serial
        if gate_decode is None:
            gate_decode = not serial and ncpu <= len(sources) + 1
        self.gate_decode = gate_decode
        if gate_decode:
            self.inflight = 1
        self.stats = StreamStats()
        self.timer = StageTimer()

        probe = VideoReader(self.sources[0])
        self.width = probe.width()
        self.height = probe.height()
        self._rows = (
            geometry.host_frame_size(out_format, self.width, self.height)
            // self.width
        )

    def _serial_batches(self) -> Iterator:
        """Single-threaded round-robin over all sources: the fastest path
        on one-core hosts, where threads only add GIL/scheduler thrash."""
        t0 = time.perf_counter()
        buf = np.empty((self.batch_size, self._rows, self.width), np.uint8)

        def reader_for(src):
            r = VideoReader(src, threads=self.decode_threads)
            if self.out_format is not None:
                r.decoder.output_format = self.out_format
            return r

        readers = [reader_for(s) for s in self.sources]
        frames = [0] * len(readers)
        live = [True] * len(readers)
        slot = 0

        def dispatch(count):
            batch = buf if count == self.batch_size else buf[:count]
            # Hand the HOST batch straight to the jitted postproc (jax
            # stages the transfer as part of the call) and block right
            # away: keeping a batch in flight while decoding serializes
            # badly against the runtime on small hosts (measured 3.5x
            # slower than block-immediately).
            with self.timer.measure("dispatch"), trace_range("FusedPostproc"):
                out = (
                    self.postproc(batch)
                    if self.postproc
                    else jax.device_put(batch, self.device)
                )
                jax.block_until_ready(out)
            return (out, count)

        while any(live):
            for i, r in enumerate(readers):
                if not live[i]:
                    continue
                if self.max_frames and frames[i] >= self.max_frames:
                    live[i] = False
                    continue
                f = r.decode(out=buf[slot])
                if f is None:
                    if self.loop_streams:
                        readers[i] = reader_for(self.sources[i])
                    else:
                        live[i] = False
                    continue
                frames[i] += 1
                slot += 1
                if slot == self.batch_size:
                    out, count = dispatch(slot)
                    slot = 0
                    self.stats.batches += 1
                    self.stats.frames_decoded += count
                    yield out
        if slot:
            out, count = dispatch(slot)
            self.stats.batches += 1
            self.stats.frames_decoded += count
            yield out
        self.stats.wall_s = time.perf_counter() - t0

    def batches(self) -> Iterator:
        if self.serial:
            yield from self._serial_batches()
            return
        t0 = time.perf_counter()
        ring = _BatchRing(
            self.inflight + 2, self.batch_size, self._rows, self.width
        )
        stop = threading.Event()
        gate = None
        if self.gate_decode:
            gate = threading.Event()
            gate.set()
        workers = [
            _DecodeWorker(
                i, src, ring, stop, self.max_frames, self.loop_streams,
                self.decode_threads, self.out_format, gate,
            )
            for i, src in enumerate(self.sources)
        ]
        for w in workers:
            w.start()

        def workers_done() -> bool:
            return all(not w.is_alive() for w in workers)

        inflight: List = []  # (buffer_idx, device_result, count)

        def flush_one():
            ob, oout, ocount = inflight.pop(0)
            jax.block_until_ready(oout)
            ring.recycle(ob)
            self.stats.batches += 1
            self.stats.frames_decoded += ocount
            return oout

        try:
            while True:
                for w in workers:
                    if w.error:
                        raise w.error
                b, arr, slots = ring.take(allow_partial=workers_done)
                if not slots:
                    ring.recycle(b)
                    if workers_done():
                        break
                    continue
                batch = (
                    arr
                    if len(slots) == self.batch_size
                    else arr[np.asarray(slots)]
                )
                if gate is not None:
                    gate.clear()
                try:
                    with self.timer.measure("dispatch"), trace_range("FusedPostproc"):
                        out = (
                            self.postproc(batch)
                            if self.postproc
                            else jax.device_put(batch, self.device)
                        )
                    if gate is not None:
                        jax.block_until_ready(out)
                finally:
                    if gate is not None:
                        gate.set()
                inflight.append((b, out, len(slots)))
                if len(inflight) >= self.inflight:
                    yield flush_one()
        finally:
            stop.set()
        while inflight:
            yield flush_one()
        self.stats.wall_s = time.perf_counter() - t0

    def run(self) -> StreamStats:
        for _ in self.batches():
            pass
        return self.stats
