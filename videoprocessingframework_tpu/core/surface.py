"""Surface / SurfacePlane / HostBuffer — the framework's memory objects.

TPU-native re-design of the reference's memory layer
(src/TC/inc/MemoryInterfaces.hpp:76-841):

* ``Surface``   — a frame in device HBM: an immutable-shape bundle of
  per-plane ``jax.Array``s plus format metadata. Where the reference tracks
  15 C++ subclasses with pitched CUDA allocations, plane geometry here comes
  from one declarative table (:mod:`..core.geometry`) and arrays are always
  tightly packed (XLA manages physical layout).
* ``SurfacePlane`` — a view of one plane (host or device).
* ``HostBuffer``  — host-side bytes (reference ``Buffer``); plain numpy,
  staged to the device with ``jax.device_put`` (the pinned-memory analog is
  the transfer double-buffering in :mod:`..interop.transfer`).

Surfaces may live on host (numpy planes) or device (jax planes); uploads
and downloads convert between the two.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np

from . import geometry
from .enums import PixelFormat
from ..utils import alloc as _alloc

ArrayLike = Union[np.ndarray, "jax.Array"]  # noqa: F821


def _is_device_array(a) -> bool:
    return not isinstance(a, np.ndarray)


class HostBuffer:
    """Host memory token (reference ``Buffer``, MemoryInterfaces.hpp:76-116)."""

    __slots__ = ("data", "_alloc_id")

    def __init__(self, data: np.ndarray):
        self.data = np.ascontiguousarray(data)
        self._alloc_id = _alloc.register("HostBuffer", self.data.nbytes)

    @classmethod
    def make(cls, size: int) -> "HostBuffer":
        return cls(np.zeros(size, dtype=np.uint8))

    @classmethod
    def from_bytes(cls, raw: bytes) -> "HostBuffer":
        return cls(np.frombuffer(raw, dtype=np.uint8).copy())

    def size(self) -> int:
        return self.data.nbytes

    def copy_from(self, other: "HostBuffer") -> None:
        if other.data.nbytes != self.data.nbytes:
            raise ValueError("HostBuffer.copy_from: size mismatch")
        np.copyto(self.data, other.data)

    def __del__(self):
        try:
            _alloc.unregister(getattr(self, "_alloc_id", None))
        except Exception:
            pass  # interpreter shutdown: alloc module may be gone


class SurfacePlane:
    """One plane of a Surface. Width is in samples (channels included).

    When created via :meth:`Surface.plane`, writes through
    :meth:`import_from` propagate back to the owning Surface."""

    __slots__ = ("array", "_owner", "_index")

    def __init__(self, array: ArrayLike, owner=None, index: int = 0):
        self.array = array
        self._owner = owner
        self._index = index

    @property
    def width(self) -> int:
        return int(self.array.shape[-1])

    @property
    def height(self) -> int:
        return int(self.array.shape[-2])

    @property
    def elem_size(self) -> int:
        return int(np.dtype(self.array.dtype).itemsize)

    @property
    def pitch(self) -> int:
        """Row stride in bytes. Always tightly packed here."""
        return self.width * self.elem_size

    @property
    def host_frame_size(self) -> int:
        return self.width * self.height * self.elem_size

    def export(self) -> np.ndarray:
        """Copy plane contents to a host numpy array."""
        return np.asarray(self.array)

    def import_from(self, src: np.ndarray) -> "SurfacePlane":
        """Replace plane contents from host data (returns new plane)."""
        src = np.asarray(src, dtype=self.array.dtype).reshape(self.array.shape)
        if _is_device_array(self.array):
            import jax

            sharding = getattr(self.array, "sharding", None)
            self.array = jax.device_put(src, sharding)
        else:
            self.array = src.copy()
        if self._owner is not None:
            self._owner.planes[self._index] = self.array
        return self

    def __repr__(self) -> str:
        where = "device" if _is_device_array(self.array) else "host"
        return (
            f"SurfacePlane(width={self.width}, height={self.height}, "
            f"pitch={self.pitch}, elem_size={self.elem_size}, mem={where})"
        )


class Surface:
    """A video frame: per-plane arrays + format metadata.

    ``width``/``height`` are luma dimensions. ``planes[i]`` has the shape
    dictated by :data:`..core.geometry.PLANE_SPECS`.
    """

    __slots__ = ("format", "width", "height", "planes", "_alloc_id")

    def __init__(
        self,
        fmt: PixelFormat,
        width: int,
        height: int,
        planes: Sequence[ArrayLike],
    ):
        fmt = PixelFormat(fmt)
        expected = geometry.plane_shapes(fmt, width, height)
        if len(planes) != len(expected):
            raise ValueError(
                f"{fmt.name} needs {len(expected)} planes, got {len(planes)}"
            )
        for i, (p, shp) in enumerate(zip(planes, expected)):
            if tuple(p.shape[-2:]) != shp:
                raise ValueError(
                    f"plane {i} of {fmt.name} {width}x{height}: expected "
                    f"shape {shp}, got {tuple(p.shape)}"
                )
            want = geometry.plane_dtype(fmt, i)
            if np.dtype(p.dtype) != want:
                raise ValueError(
                    f"plane {i} of {fmt.name}: expected dtype {want}, got {p.dtype}"
                )
        self.format = fmt
        self.width = int(width)
        self.height = int(height)
        self.planes = list(planes)
        self._alloc_id = _alloc.register(
            f"Surface[{fmt.name}]", geometry.host_frame_size(fmt, width, height)
        )

    # -- construction -----------------------------------------------------

    @classmethod
    def make(
        cls,
        fmt: PixelFormat,
        width: int,
        height: int,
        device: Optional[object] = None,
    ) -> "Surface":
        """Allocate a zero-filled surface, on host (device=None → host numpy)
        or on a jax device."""
        geometry.validate_even_dims(fmt, width, height)
        shapes = geometry.plane_shapes(fmt, width, height)
        planes: List[ArrayLike] = []
        for i, shp in enumerate(shapes):
            arr = np.zeros(shp, dtype=geometry.plane_dtype(fmt, i))
            if device is not None:
                import jax

                arr = jax.device_put(arr, device)
            planes.append(arr)
        return cls(fmt, width, height, planes)

    @classmethod
    def from_host_frame(
        cls,
        frame: np.ndarray,
        fmt: PixelFormat,
        width: int,
        height: int,
    ) -> "Surface":
        """Build a host Surface from one tightly-packed frame buffer
        (the wire format used by the decoder and `download()`)."""
        flat = np.ascontiguousarray(frame).reshape(-1).view(np.uint8)
        expected = geometry.host_frame_size(fmt, width, height)
        if flat.nbytes != expected:
            raise ValueError(
                f"frame size {flat.nbytes} != expected {expected} for "
                f"{PixelFormat(fmt).name} {width}x{height}"
            )
        planes = []
        off = 0
        for i, shp in enumerate(geometry.plane_shapes(fmt, width, height)):
            dt = geometry.plane_dtype(fmt, i)
            n = shp[0] * shp[1] * dt.itemsize
            planes.append(flat[off : off + n].view(dt).reshape(shp))
            off += n
        return cls(fmt, width, height, planes)

    # -- metadata ----------------------------------------------------------

    @property
    def num_planes(self) -> int:
        return len(self.planes)

    @property
    def is_on_device(self) -> bool:
        return _is_device_array(self.planes[0])

    @property
    def host_size(self) -> int:
        return geometry.host_frame_size(self.format, self.width, self.height)

    def empty(self) -> bool:
        return self.width == 0 or self.height == 0

    def plane(self, i: int = 0) -> SurfacePlane:
        return SurfacePlane(self.planes[i], owner=self, index=i)

    # -- data movement -----------------------------------------------------

    def clone(self) -> "Surface":
        """Deep copy (device-side copy for device surfaces)."""
        if self.is_on_device:
            import jax.numpy as jnp

            new = [jnp.copy(p) for p in self.planes]
        else:
            new = [p.copy() for p in self.planes]
        return Surface(self.format, self.width, self.height, new)

    def copy_from(self, other: "Surface") -> None:
        if (other.format, other.width, other.height) != (
            self.format,
            self.width,
            self.height,
        ):
            raise ValueError("Surface.copy_from: geometry mismatch")
        if self.is_on_device:
            import jax

            self.planes = [
                jax.device_put(np.asarray(p), d.sharding if hasattr(d, "sharding") else None)
                for p, d in zip(other.planes, self.planes)
            ]
        else:
            for dst, src in zip(self.planes, other.planes):
                np.copyto(dst, np.asarray(src))

    def to_device(self, device=None) -> "Surface":
        """Upload host planes to a jax device (no-op if already there)."""
        import jax

        if self.is_on_device and device is None:
            return self
        planes = [jax.device_put(np.asarray(p), device) for p in self.planes]
        return Surface(self.format, self.width, self.height, planes)

    def to_host(self) -> "Surface":
        if not self.is_on_device:
            return self
        planes = [np.asarray(p) for p in self.planes]
        return Surface(self.format, self.width, self.height, planes)

    def download(self) -> np.ndarray:
        """One tightly-packed host buffer (uint8 view) of all planes."""
        out = np.empty(self.host_size, dtype=np.uint8)
        off = 0
        for p in self.planes:
            h = np.ascontiguousarray(np.asarray(p))
            b = h.reshape(-1).view(np.uint8)
            out[off : off + b.nbytes] = b
            off += b.nbytes
        return out

    def crop(self, x: int, y: int, w: int, h: int) -> "Surface":
        """ROI copy (reference Surface.Crop, PySurface.cpp:403-441).

        x/y/w/h are luma coordinates; chroma ROIs scale per plane.
        """
        geometry.validate_even_dims(self.format, w, h)
        specs = geometry.PLANE_SPECS[self.format]
        planes = []
        for spec, p in zip(specs, self.planes):
            py = (y * spec.height_num) // spec.height_den
            ph = (h * spec.height_num) // spec.height_den
            px = (x * spec.width_num) // spec.width_den * spec.channels
            pw = (w * spec.width_num) // spec.width_den * spec.channels
            sl = p[..., py : py + ph, px : px + pw]
            planes.append(sl.copy() if isinstance(sl, np.ndarray) else sl)
        return Surface(self.format, w, h, planes)

    def __repr__(self) -> str:
        where = "device" if self.is_on_device else "host"
        return (
            f"Surface(format={self.format.name}, width={self.width}, "
            f"height={self.height}, planes={self.num_planes}, mem={where})"
        )

    def __del__(self):
        try:
            _alloc.unregister(getattr(self, "_alloc_id", None))
        except Exception:
            pass  # interpreter shutdown: alloc module may be gone
