"""Zero-copy tensor interop: Surface ↔ jax.Array ↔ torch.Tensor.

Replaces the reference's PytorchNvCodec extension
(src/PytorchNvCodec/src/PytorchNvCodec.cpp:36-139 —
makefromDevicePtrUint8 / TensorToDptr), which does a device-to-device
copy per frame. Here the handoff is DLPack: a decoded Surface's planes
already ARE ``jax.Array``s in HBM, so feeding a JAX/Flax model is free,
and torch interop goes through ``__dlpack__`` without copies where the
backends share memory space.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..core.enums import PixelFormat
from ..core.surface import Surface


def surface_to_jax(surface: Surface, plane: int = 0):
    """The plane's jax.Array (zero-copy — it already lives in HBM)."""
    s = surface.to_device() if not surface.is_on_device else surface
    return s.planes[plane]


def surface_planes_to_jax(surface: Surface):
    s = surface.to_device() if not surface.is_on_device else surface
    return tuple(s.planes)


def jax_to_surface(arrays, fmt: PixelFormat, width: int, height: int) -> Surface:
    """Wrap per-plane jax arrays as a Surface (no copy)."""
    return Surface(fmt, width, height, list(arrays))


def surface_to_torch(surface: Surface, plane: int = 0):
    """Surface plane → torch.Tensor via DLPack.

    On shared-memory backends this is zero-copy; otherwise (e.g. TPU HBM →
    CPU torch) it is one device-to-host transfer — still fewer copies than
    the reference's makefromDevicePtrUint8 (alloc + cudaMemcpy2D per frame).
    """
    import torch

    arr = surface.planes[plane]
    if isinstance(arr, np.ndarray):
        return torch.from_numpy(np.ascontiguousarray(arr))
    try:
        return torch.from_dlpack(arr)
    except Exception:
        return torch.from_numpy(np.asarray(arr))


def torch_to_surface(
    tensor: Any, fmt: PixelFormat, width: int, height: int, device=None
) -> Surface:
    """torch.Tensor (packed frame or single plane set) → Surface."""
    import jax

    if hasattr(tensor, "detach"):
        tensor = tensor.detach().cpu().numpy()
    arr = np.ascontiguousarray(tensor)
    s = Surface.from_host_frame(arr, fmt, width, height)
    return s.to_device(device) if device is not None else s


def jax_to_torch(array):
    import torch

    try:
        return torch.from_dlpack(array)
    except Exception:
        return torch.from_numpy(np.asarray(array))


def torch_to_jax(tensor, device=None):
    import jax

    try:
        return jax.dlpack.from_dlpack(tensor)
    except Exception:
        return jax.device_put(
            np.ascontiguousarray(tensor.detach().cpu().numpy()), device
        )
