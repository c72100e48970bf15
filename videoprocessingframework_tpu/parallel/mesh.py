"""Device-mesh utilities: the framework's multi-chip scaling layer.

The reference's multi-device story is "gpu_id per object, no cross-GPU
communication" (SURVEY.md §2.9). The TPU-native equivalents:

* **stream fan-out** — independent frame batches placed round-robin on
  devices (`device_round_robin`), the analog of one pipeline per GPU;
* **sharded batch** — one logical batch sharded over the mesh's data axis
  (`shard_batch`), which the reference cannot do at all; XLA inserts ICI
  collectives only where the consumer demands them;
* **dp×tp mesh** — for model execution (models/train step), batch over
  ``data``, channels/classifier over ``model``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Tuple[str, ...] = ("data", "model"),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Create a mesh over the first ``n_devices`` devices.

    Default shape puts everything on ``data`` (pure stream/batch
    parallelism) with ``model`` = 1 unless an explicit shape is given.
    """
    devs = jax.devices()[: (n_devices or len(jax.devices()))]
    n = len(devs)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for a leading-batch array: shard dim 0 over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(arrays, mesh: Mesh, axis: str = "data"):
    """Upload host arrays with the batch dim sharded over the mesh.

    The host-side batch is laid out so each device receives a contiguous
    slice — one `device_put` with a NamedSharding lets jax split the
    transfer per-device (upload rides each chip's own DMA path).
    """
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), arrays)


def device_round_robin(i: int, devices: Optional[Sequence] = None):
    devs = devices or jax.devices()
    return devs[i % len(devs)]
