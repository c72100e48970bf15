"""StreamMuxer — write encoded packets into a container (mp4/mkv/ts…).

Beyond-parity addition (the reference writes raw elementary streams only):
closes the container→container transcode loop. Wraps io/native/muxer.cpp.

Containers verified with the framework encoder's Annex.B output: mp4
(auto-converted by libavformat's bitstream filter) and mpeg-ts (native
Annex.B). Matroska requires avcC ``extradata`` (pass it explicitly when
remuxing from a source that provides it).
"""

from __future__ import annotations

import ctypes as C
from typing import Optional, Union

import numpy as np

from ..core.enums import CodecId
from ..core.packet import PacketData
from . import _lib

AV_NOPTS = -(2**63)


class StreamMuxer:
    """Mux one video stream. Timestamps are in 1/fps units (frame index
    granularity, matching the encoder's default pts assignment)."""

    def __init__(
        self,
        url: str,
        codec: CodecId,
        width: int,
        height: int,
        fps: float = 30.0,
        format: Optional[str] = None,
        extradata: bytes = b"",
    ):
        self._lib = _lib.load()
        fps_num, fps_den = (
            (int(round(fps * 1001)), 1001)
            if abs(fps - round(fps)) > 1e-6
            else (int(round(fps)), 1)
        )
        extra = (
            (C.c_uint8 * len(extradata)).from_buffer_copy(extradata)
            if extradata
            else None
        )
        self._h = self._lib.vpf_muxer_open(
            url.encode(),
            (format or "").encode(),
            int(codec),
            width,
            height,
            fps_num,
            fps_den,
            C.cast(extra, C.POINTER(C.c_uint8)) if extra else None,
            len(extradata),
        )
        if not self._h:
            raise RuntimeError(f"muxer open failed: {_lib.last_error()}")

    def write(
        self,
        packet: Union[np.ndarray, bytes],
        pkt_data: Optional[PacketData] = None,
        pts: Optional[int] = None,
    ) -> None:
        buf = np.frombuffer(bytes(packet), np.uint8) if isinstance(
            packet, (bytes, bytearray)
        ) else np.ascontiguousarray(packet, np.uint8)
        if pkt_data is not None:
            p, d, k = pkt_data.pts, pkt_data.dts, pkt_data.key
        else:
            p, d, k = (pts if pts is not None else 0), AV_NOPTS, 1
        r = self._lib.vpf_muxer_write(
            self._h,
            buf.ctypes.data_as(C.POINTER(C.c_uint8)),
            buf.nbytes,
            p,
            d,
            int(bool(k)),
        )
        if r != _lib.OK:
            raise RuntimeError(_lib.last_error())

    def close(self) -> None:
        if self._h:
            self._lib.vpf_muxer_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
