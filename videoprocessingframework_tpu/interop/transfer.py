"""Host↔device transfer helpers: uploaders/downloaders with double
buffering.

The analog of the reference's transfer task family (CudaUploadFrame /
UploadBuffer / CudaDownloadSurface / DownloadCudaBuffer,
src/TC/src/Tasks.cpp:584-898) and its pinned-memory staging: here the
"pinned buffer" is a pre-allocated host staging array reused across
frames, and overlap comes from jax's async dispatch — ``device_put``
returns immediately and the next frame is packed while the previous
transfer is in flight.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax

from ..core import geometry
from ..core.enums import PixelFormat
from ..core.surface import Surface
from ..utils.tracing import trace_range


class FrameUploader:
    """Packed host frames → device Surfaces for a fixed geometry."""

    def __init__(self, width: int, height: int, fmt: PixelFormat, device=None):
        self.width = width
        self.height = height
        self.format = PixelFormat(fmt)
        self.device = device or jax.devices()[0]

    def upload(self, frame: np.ndarray) -> Surface:
        s = Surface.from_host_frame(frame, self.format, self.width, self.height)
        with trace_range("CudaUploadFrame"):
            return s.to_device(self.device)

    __call__ = upload


class SurfaceDownloader:
    """Device Surfaces → packed host frames (reuses one staging buffer)."""

    def __init__(self, width: int, height: int, fmt: PixelFormat):
        self.width = width
        self.height = height
        self.format = PixelFormat(fmt)
        self._staging = np.empty(
            geometry.host_frame_size(fmt, width, height), np.uint8
        )

    def download(self, surface: Surface, out: Optional[np.ndarray] = None):
        with trace_range("CudaDownloadSurface"):
            data = surface.download()
        if out is not None:
            np.copyto(out.reshape(-1).view(np.uint8), data)
            return out
        np.copyto(self._staging, data)
        return self._staging

    __call__ = download


class DoubleBufferedUploader:
    """Streamed batch uploads with K transfers in flight.

    Feed host batches with :meth:`put`; collect device arrays with
    :meth:`get` (returns None while the pipeline fills). jax dispatches
    transfers asynchronously, so packing batch N+1 overlaps uploading
    batch N — the functional equivalent of the reference's pinned-buffer
    + async-memcpy + stream-sync-callback pattern (Tasks.cpp:617-662).
    """

    def __init__(self, device=None, depth: int = 2):
        self.device = device or jax.devices()[0]
        self.depth = max(1, depth)
        self._inflight: list = []

    def put(self, host_batch) -> Optional[object]:
        arrs = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, self.device), host_batch
        )
        self._inflight.append(arrs)
        if len(self._inflight) > self.depth:
            out = self._inflight.pop(0)
            jax.block_until_ready(out)
            return out
        return None

    def drain(self):
        while self._inflight:
            out = self._inflight.pop(0)
            jax.block_until_ready(out)
            yield out
