"""Multi-stream decode → batch → device pipeline.

TPU-first re-design of the reference's stream-per-thread concurrency model
(samples/SampleDecodeMultiThread.py: N python threads, a CUDA stream each,
per-thread NPP chains). On TPU the equivalent shape is:

  N decode threads (GIL-free native calls)  →  bounded frame queue
  →  batch assembler (stacks B frames into pinned-style numpy batches)
  →  async ``jax.device_put`` (double-buffered: next batch uploads while
     the current one computes)
  →  ONE fused batched kernel (ops/fused.py) per batch for all streams

so the device runs one big batched program instead of N tiny ones, and the
host/device transfer overlaps compute — the analog of the reference's
pinned-buffer + per-thread-stream overlap (Tasks.cpp:584-662 upload;
SURVEY.md §2.9).
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Iterator, List, Optional, Sequence

import numpy as np

import jax

from ..core.enums import PixelFormat
from ..io.decoder import VideoReader
from ..utils.tracing import StageTimer, trace_range


@dataclass
class StreamStats:
    frames_decoded: int = 0
    batches: int = 0
    decode_s: float = 0.0
    wall_s: float = 0.0
    per_stream: dict = field(default_factory=dict)

    @property
    def fps(self) -> float:
        return self.frames_decoded / self.wall_s if self.wall_s else 0.0


class _DecodeWorker(threading.Thread):
    """One stream: demux+decode loop pushing (stream_id, frame) tuples."""

    def __init__(self, sid: int, source: str, out_q: queue.Queue,
                 max_frames: Optional[int], loop: bool, threads: int):
        super().__init__(daemon=True, name=f"vpf-decode-{sid}")
        self.sid = sid
        self.source = source
        self.out_q = out_q
        self.max_frames = max_frames
        self.loop = loop
        self.decode_threads = threads
        self.frames = 0
        self.error: Optional[BaseException] = None

    def run(self):
        try:
            while True:
                reader = VideoReader(self.source, threads=self.decode_threads)
                for frame in reader.frames():
                    self.out_q.put((self.sid, frame))
                    self.frames += 1
                    if self.max_frames and self.frames >= self.max_frames:
                        self.out_q.put((self.sid, None))
                        return
                if not self.loop:
                    break
            self.out_q.put((self.sid, None))
        except BaseException as e:  # surfaced by the assembler
            self.error = e
            self.out_q.put((self.sid, None))


class MultiStreamPipeline:
    """Decode N streams in parallel and yield batched device arrays.

    ``postproc`` is any callable over batched planes (e.g.
    :class:`~videoprocessingframework_tpu.ops.fused.FusedPipeline`); None
    yields raw uploaded plane batches.
    """

    def __init__(
        self,
        sources: Sequence[str],
        batch_size: int = 8,
        postproc: Optional[Callable] = None,
        device=None,
        queue_depth: int = 64,
        max_frames_per_stream: Optional[int] = None,
        loop_streams: bool = False,
        decode_threads: int = 1,
        inflight: int = 2,
    ):
        self.sources = list(sources)
        self.batch_size = batch_size
        self.postproc = postproc
        self.device = device or jax.devices()[0]
        self.queue_depth = queue_depth
        self.max_frames = max_frames_per_stream
        self.loop_streams = loop_streams
        self.decode_threads = decode_threads
        self.inflight = max(1, inflight)
        self.stats = StreamStats()
        self.timer = StageTimer()

    def _frame_iter(self) -> Iterator:
        q: queue.Queue = queue.Queue(maxsize=self.queue_depth)
        workers = [
            _DecodeWorker(
                i, src, q, self.max_frames, self.loop_streams,
                self.decode_threads,
            )
            for i, src in enumerate(self.sources)
        ]
        for w in workers:
            w.start()
        live = len(workers)
        while live:
            sid, frame = q.get()
            if frame is None:
                live -= 1
                if workers[sid].error:
                    raise workers[sid].error
                continue
            yield frame

    def batches(self) -> Iterator:
        """Yield post-processed device batches (and fill ``self.stats``)."""
        t0 = time.perf_counter()
        pending: List = []
        inflight: List = []

        def submit(frames):
            with self.timer.measure("assemble"):
                plane_lists = [f.planes() for f in frames]
                planes = [
                    np.stack([pl[i] for pl in plane_lists])
                    for i in range(len(plane_lists[0]))
                ]
            with self.timer.measure("upload"), trace_range("UploadBatch"):
                dev = [jax.device_put(p, self.device) for p in planes]
            with self.timer.measure("dispatch"), trace_range("FusedPostproc"):
                out = self.postproc(*dev) if self.postproc else tuple(dev)
            return out

        for frame in self._frame_iter():
            pending.append(frame)
            self.stats.frames_decoded += 1
            if len(pending) == self.batch_size:
                inflight.append(submit(pending))
                pending = []
                if len(inflight) > self.inflight:
                    out = inflight.pop(0)
                    jax.block_until_ready(out)
                    self.stats.batches += 1
                    yield out
        # tail: flush remaining full/partial batches
        if pending:
            inflight.append(submit(pending))
        for out in inflight:
            jax.block_until_ready(out)
            self.stats.batches += 1
            yield out
        self.stats.wall_s = time.perf_counter() - t0

    def run(self) -> StreamStats:
        """Drain the pipeline, returning throughput stats."""
        for _ in self.batches():
            pass
        return self.stats
