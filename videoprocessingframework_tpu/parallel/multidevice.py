"""Multi-device VIDEO pipeline: the "aggregate fps" scaling layer.

The reference's whole multi-GPU story is one decoder per ``gpu_id`` with no
cross-device communication (SURVEY.md §2.9; ``PyNvCodec.cpp:427``
GetNumGpus). The TPU-native equivalents here are video-shaped, not
model-shaped:

* :class:`ShardedVideoPipeline` — ONE logical packed frame batch sharded
  over the mesh's ``data`` axis and processed by ONE jitted fused program.
  Each device post-processes its own shard; the math is per-frame so XLA
  inserts **no collectives** — the upload itself is split per device
  (each chip's own DMA path) by ``jax.device_put`` with a NamedSharding.

* :class:`MultiDeviceStreamPipeline` — independent decode streams fanned
  out round-robin across devices (one fused dispatch per device), the
  direct analog of the reference's pipeline-per-GPU, for when batches
  arrive stream-by-stream rather than as one giant batch.

Per-device results are bit-identical to the single-device path (tested on
an 8-virtual-device CPU mesh in tests/test_parallel.py).
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.enums import PixelFormat
from ..utils.tracing import StageTimer, trace_range
from .mesh import make_mesh


class ShardedVideoPipeline:
    """Shard a packed (B, rows, W) frame batch over the mesh's data axis
    and run the fused post-processing as one program.

    ``postproc`` is a :class:`~videoprocessingframework_tpu.ops.fused.
    FusedPipeline` (or any jittable callable over one packed batch). The
    batch dim must divide evenly by the data-axis size; feed batches of
    ``per_device_batch * n_devices`` frames.
    """

    def __init__(
        self,
        postproc: Callable,
        mesh: Optional[Mesh] = None,
        axis: str = "data",
    ):
        self.mesh = mesh or make_mesh(axes=(axis,))
        self.axis = axis
        self.sharding = NamedSharding(self.mesh, P(axis))
        self._fn = jax.jit(
            lambda batch: postproc(batch),
            in_shardings=self.sharding,
            out_shardings=self.sharding,
        )

    @property
    def n_devices(self) -> int:
        return self.mesh.devices.size

    def __call__(self, packed_batch):
        b = packed_batch.shape[0]
        if b % self.n_devices:
            raise ValueError(
                f"batch {b} not divisible by {self.n_devices} devices"
            )
        with trace_range("ShardedFusedPostproc"):
            sharded = jax.device_put(packed_batch, self.sharding)
            return self._fn(sharded)


class MultiDeviceStreamPipeline:
    """Fan independent stream batches out across devices round-robin.

    Wraps N per-source :class:`~videoprocessingframework_tpu.io.pool.
    NativeDecodePool` batches; batch *k* is dispatched to device
    ``k % n_devices``. Dispatches overlap: the next device's upload starts
    while the previous device computes (the analog of the reference's
    thread-per-GPU pipelines overlapping on independent hardware).
    """

    def __init__(
        self,
        sources: Sequence[str],
        postproc: Callable,
        batch_size: int = 8,
        devices: Optional[Sequence] = None,
        out_format=None,
        loop: bool = False,
        max_frames_per_stream: int = 0,
    ):
        from ..io.pool import NativeDecodePool

        self.devices = list(devices if devices is not None else jax.devices())
        self.postproc = postproc
        self.timer = StageTimer()
        # Ring sized so one buffer per device can be held in flight while
        # workers keep two to fill (the pool supports multiple
        # concurrently-held batches, released FIFO).
        self._held_max = len(self.devices)
        fmt = PixelFormat.YUV420 if out_format is None else out_format
        # plane-major ring for YUV420 + plane-aware postproc: the per-
        # device device_put of each contiguous plane region needs no host
        # re-copy (frame-major planar views are strided → a full staging
        # copy per dispatch)
        self._planar = (
            PixelFormat(fmt) == PixelFormat.YUV420
            and getattr(postproc, "src_format", None) == PixelFormat.YUV420
        )
        self.pool = NativeDecodePool(
            list(sources),
            batch_size=batch_size,
            out_format=fmt,
            loop=loop,
            max_frames_per_stream=max_frames_per_stream,
            n_buffers=self._held_max + 2,
            plane_major=self._planar,
        )
        self.frames = 0

    def batches(self) -> Iterator:
        """Yield device batches. Up to one dispatch per device stays
        outstanding: batch k uploads to device k%N and computes there while
        later batches stream to the other devices. A pool slot is released
        (FIFO) only after its device output is materialized — the slot
        memory may be aliased or still in transfer until then."""
        pending = []  # (out, count) in acquire order
        k = 0
        flat_fn = None  # single-transfer splitter (pool.flat_postproc_fn)

        def retire():
            done, n = pending.pop(0)
            jax.block_until_ready(done)
            self.pool.release()  # FIFO: the slot `done` was staged from
            self.frames += n
            return done

        while True:
            with self.timer.measure("acquire"):
                if self._planar and flat_fn is not None:
                    planes = self.pool.acquire_flat()
                elif self._planar:
                    planes = self.pool.acquire_planes()
                else:
                    planes = self.pool.acquire()
            if planes is None:
                break
            flat = None
            if self._planar and flat_fn is not None and not isinstance(
                planes, tuple
            ):
                flat, planes = planes, ()
            elif not self._planar:
                planes = (planes,)
            dev = self.devices[k % len(self.devices)]
            k += 1
            with self.timer.measure("dispatch"), trace_range(
                "FusedPostproc"
            ):
                # contiguous plane regions (plane-major ring) stage to the
                # device with no host re-copy and no packed→planar device
                # relayout; FULL batches after the first ride the single-
                # transfer flat feed (same contract as
                # NativeDecodePool.batches)
                if flat is not None:
                    out = flat_fn(jax.device_put(flat, dev))
                    n_frames = self.pool.batch_size
                else:
                    staged = [jax.device_put(p, dev) for p in planes]
                    out = self.postproc(*staged)
                    n_frames = planes[0].shape[0]
                    if self._planar and flat_fn is None:
                        flat_fn = self.pool.flat_postproc_fn(self.postproc)
            pending.append((out, n_frames))
            if len(pending) >= self._held_max:
                yield retire()
        while pending:
            yield retire()

    def close(self) -> None:
        self.pool.close()


def sharded_batch_matches_single_device(postproc, packed: np.ndarray,
                                        mesh: Optional[Mesh] = None) -> bool:
    """Check helper: sharded multi-device output == single-device output,
    bit-exactly. Used by tests and the multichip dry run."""
    pipe = ShardedVideoPipeline(postproc, mesh=mesh)
    multi = np.asarray(pipe(packed))
    single = np.asarray(postproc(packed))
    return np.array_equal(multi, single)
