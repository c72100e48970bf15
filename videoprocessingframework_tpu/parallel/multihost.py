"""Multi-host scaling for the video pipeline (DCN story).

Beyond the reference's scope (its multi-GPU model is single-process
``gpu_id`` indexing, SURVEY.md §2.9) — this is the TPU-pod shape of the
same idea: each HOST decodes its own streams on its own CPUs, and the
per-host packed frame batches are assembled into ONE global sharded array
with ``jax.make_array_from_process_local_data``. Frame data never crosses
DCN: every host's shard is built from that host's decode pool, and the
fused post-processing runs as one global program whose per-frame math
needs no collectives.

Usage on a pod (after ``jax.distributed.initialize()``):

    mesh = make_mesh(axes=("data",))           # spans all processes
    pipe = MultiHostVideoPipeline(local_sources, postproc, mesh=mesh)
    for out in pipe.batches():                 # out: global sharded array
        ...

Single-process works identically (process_count == 1), which is how the
CPU-mesh tests exercise the exact same code path.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import make_mesh


class GlobalBatchAssembler:
    """Turn each process's local packed frames into a global array sharded
    over ``axis`` — zero cross-host data movement (each host's shard is
    placed on its own addressable devices)."""

    def __init__(self, mesh: Optional[Mesh] = None, axis: str = "data"):
        self.mesh = mesh or make_mesh(axes=(axis,))
        self.axis = axis
        self.sharding = NamedSharding(self.mesh, P(axis))

    @property
    def local_batch_multiple(self) -> int:
        """Local batches must be a multiple of the per-process device
        count along the axis."""
        local = [
            d for d in self.mesh.devices.ravel()
            if d.process_index == jax.process_index()
        ]
        return max(1, len(local))

    def global_batch(self, local_packed: np.ndarray) -> jax.Array:
        return jax.make_array_from_process_local_data(
            self.sharding, np.ascontiguousarray(local_packed)
        )


class MultiHostVideoPipeline:
    """Per-host native decode pool → global sharded batch → one fused
    program over the whole mesh."""

    def __init__(
        self,
        local_sources: Sequence[str],
        postproc: Callable,
        mesh: Optional[Mesh] = None,
        batch_size_per_host: int = 8,
        out_format=None,
        loop: bool = False,
        max_frames_per_stream: int = 0,
    ):
        from ..core.enums import PixelFormat
        from ..io.pool import NativeDecodePool

        self.assembler = GlobalBatchAssembler(mesh)
        self._fn = jax.jit(
            lambda batch: postproc(batch),
            in_shardings=self.assembler.sharding,
            out_shardings=self.assembler.sharding,
        )
        if batch_size_per_host % self.assembler.local_batch_multiple:
            raise ValueError(
                f"batch_size_per_host {batch_size_per_host} must divide by "
                f"the {self.assembler.local_batch_multiple} local devices"
            )
        self.pool = NativeDecodePool(
            list(local_sources),
            batch_size=batch_size_per_host,
            out_format=(
                PixelFormat.YUV420 if out_format is None else out_format
            ),
            loop=loop,
            max_frames_per_stream=max_frames_per_stream,
        )
        self.frames_local = 0

    def batches(self) -> Iterator[jax.Array]:
        """Yield globally-sharded post-processed batches. Every process
        must iterate in lockstep (same number of batches) — standard SPMD
        discipline; ragged tails are dropped to keep hosts aligned."""
        batch_size = self.pool.batch_size
        while True:
            local = self.pool.acquire()
            if local is None:
                return
            try:
                if local.shape[0] != batch_size:
                    return  # ragged tail: hosts must stay in lockstep
                g = self.assembler.global_batch(local)
                out = self._fn(g)
                jax.block_until_ready(out)
            finally:
                self.pool.release()
            self.frames_local += batch_size
            yield out

    def close(self) -> None:
        self.pool.close()
