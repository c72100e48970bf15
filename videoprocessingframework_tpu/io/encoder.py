"""VideoEncoder — software encode session with the reference's options
vocabulary and session semantics.

Python face of io/native/encoder.cpp. Parity target: PyNvEncoder
(src/PyNvCodec/src/PyNvEncoder.cpp): dict options validated against the
29-key vocabulary, frame size from 's', lazy session creation at first
encode (so the sync flag can shape the session), delayed-output FIFO,
Flush/FlushSinglePacket, Reconfigure(force_idr, reset).
"""

from __future__ import annotations

import ctypes as C
from typing import Optional, Union

import numpy as np

from ..core.enums import PixelFormat
from ..core.exceptions import EncoderException
from ..core.packet import PacketData
from ..core.surface import Surface
from ..utils.tracing import trace_range
from . import _lib

#: the reference's option vocabulary (NvCodecCliOptions.cpp:46-83)
ENCODER_OPTIONS = {
    "codec": "video codec: {'codec' : 'h264'}",
    "preset": "encode preset: {'preset' : 'P4'}",
    "tuning_info": "how to tune the encoder: {'tuning_info' : 'high_quality'}",
    "profile": "h.264 profile: {'profile' : 'high'}",
    "max_res": "max resolution: {'max_res' : '3840x2160'}",
    "s": "video frame size: {'s' : '1920x1080'}",
    "fps": "video fps: {'fps' : '30'}",
    "bf": "number of b frames: {'bf' : '3'}",
    "gop": "gop size: {'gop' : '30'}",
    "bitrate": "bitrate: {'bitrate' : '10M'}",
    "multipass": "multi-pass encoding: {'multipass' : 'fullres'}",
    "ldkfs": "low-delay key frame scale: {'ldkfs' : ''}",
    "maxbitrate": "max bitrate: {'maxbitrate' : '20M'}",
    "vbvbufsize": "vbv buffer size: {'vbvbufsize' : '10M'}",
    "vbvinit": "init vbv buffer size: {'vbvinit' : '10M'}",
    "cq": "cq parameter: {'cq' : ''}",
    "rc": "rc mode: {'rc' : 'cbr'}",
    "initqp": "initial qp parameter value: {'initqp' : '32'}",
    "qmin": "minimum qp: {'qmin' : '28'}",
    "qmax": "maximum qp: {'qmax' : '36'}",
    "constqp": "const qp mode: {'constqp' : ''}",
    "temporalaq": "temporal adaptive quantization: {'temporalaq' : ''}",
    "lookahead": "look ahead encoding: {'lookahead' : '8'}",
    "aq": "adaptive quantization: {'aq' : ''}",
    "fmt": "pixel format: {'fmt' : 'YUV444'}",
    "idrperiod": "distance between I frames: {'idrperiod' : '256'}",
    "numrefl0": "number of ref frames in l0 list: {'numrefl0' : '4'}",
    "numrefl1": "number of ref frames in l1 list: {'numrefl1' : '4'}",
    "repeatspspps": "write SPS/PPS for every IDR frame: {'repeatspspps' : '0'}",
}


def get_encoder_params() -> dict:
    """GetNvencParams analog (PyNvCodec.cpp:431-433)."""
    return dict(ENCODER_OPTIONS)


class VideoEncoder:
    """Encode packed frames / Surfaces into an elementary stream."""

    def __init__(self, opts: dict, device=None):
        self._lib = _lib.load()
        self.opts = {str(k): str(v) for k, v in opts.items()}
        for k in self.opts:
            if k not in ENCODER_OPTIONS:
                raise ValueError(
                    f'Invalid parameter name"{k}" for NvEncoderClInterface'
                )
        s = self.opts.get("s", "")
        try:
            w, h = s.split("x")
            self._width, self._height = int(w), int(h)
        except ValueError:
            raise ValueError(f"Invalid frame size option 's': {s!r}")
        fmt = self.opts.get("fmt", "NV12")
        by_name = {m.name.upper(): m for m in PixelFormat}
        try:
            self.format = by_name[fmt.upper()]
        except KeyError:
            raise ValueError(f"Unsupported encoder input format: {fmt}")
        # reference input-format set (PyNvEncoder.cpp:204-221): NV12,
        # YUV444, 10-bit 4:2:0 (P10/YUV420_10bit/P12), YUV444_10bit; plus
        # planar YUV420 and 12-bit gray (hevc gray12le —
        # FfmpegSwDecoder.cpp GRAY12LE analog)
        if self.format not in (
            PixelFormat.NV12,
            PixelFormat.YUV420,
            PixelFormat.YUV422,
            PixelFormat.YUV444,
            PixelFormat.P10,
            PixelFormat.P12,
            PixelFormat.YUV420_10bit,
            PixelFormat.YUV444_10bit,
            PixelFormat.GRAY12,
        ):
            raise ValueError(f"Unsupported encoder input format: {fmt}")
        if self.format == PixelFormat.YUV420_10bit:
            # packed wire format is P010-style 16-bit
            self.format = PixelFormat.P10
        self.device = device
        self._h = None  # lazy: first encode knows the sync flag
        self._sync = False
        self._frames_in = 0

    @property
    def width(self) -> int:
        return self._width

    @property
    def height(self) -> int:
        return self._height

    def frame_size_in_bytes(self) -> int:
        from ..core import geometry

        return geometry.host_frame_size(self.format, self._width, self._height)

    def _ensure_session(self, sync: bool) -> None:
        if self._h:
            return
        self._sync = sync
        keys, vals, n = _lib.make_string_arrays(self.opts)
        self._h = self._lib.vpf_encoder_create(keys, vals, n, 1 if sync else 0)
        if not self._h:
            raise EncoderException(f"Encoder create failed: {_lib.last_error()}")

    def _take_packet(self) -> tuple[np.ndarray, PacketData]:
        data = C.POINTER(C.c_uint8)()
        size = C.c_size_t()
        meta = _lib.VpfPacketData()
        self._lib.vpf_encoder_packet(
            self._h, C.byref(data), C.byref(size), C.byref(meta)
        )
        pkt = np.ctypeslib.as_array(data, shape=(size.value,)).copy()
        pd = PacketData(
            key=meta.key,
            pts=meta.pts,
            dts=meta.dts,
            pos=meta.pos,
            bsl=size.value,
            duration=meta.duration,
        )
        return pkt, pd

    def encode(
        self,
        frame: Union[np.ndarray, Surface, None],
        sei: Optional[bytes] = None,
        sync: bool = False,
        pts: int = -1,
    ) -> Optional[tuple[np.ndarray, PacketData]]:
        """Encode one frame (packed numpy or Surface); None → flush step.

        Returns (packet, meta) when a packet is ready, else None (output
        delay). With ``sync=True`` the session is built zero-delay so every
        frame yields its packet immediately.
        """
        self._ensure_session(sync)
        if frame is None:
            return self.flush_single_packet()

        if isinstance(frame, Surface):
            if (frame.width, frame.height) != (self._width, self._height):
                raise ValueError(
                    f"Surface size {frame.width}x{frame.height} != encoder "
                    f"size {self._width}x{self._height}"
                )
            if frame.format != self.format:
                raise ValueError(
                    f"Surface format {frame.format.name} != encoder input "
                    f"format {self.format.name}"
                )
            buf = frame.download()
        else:
            buf = np.ascontiguousarray(frame).reshape(-1).view(np.uint8)
            if buf.nbytes != self.frame_size_in_bytes():
                raise ValueError(
                    f"frame has {buf.nbytes} bytes, expected "
                    f"{self.frame_size_in_bytes()}"
                )

        sei_ptr, sei_len = None, 0
        if sei is not None and len(sei):
            sei_arr = np.frombuffer(bytes(sei), dtype=np.uint8)
            sei_ptr = sei_arr.ctypes.data_as(C.POINTER(C.c_uint8))
            sei_len = sei_arr.nbytes

        with trace_range("EncodeFrame"):
            r = self._lib.vpf_encoder_encode(
                self._h,
                buf.ctypes.data_as(C.POINTER(C.c_uint8)),
                buf.nbytes,
                sei_ptr,
                sei_len,
                pts if pts >= 0 else self._frames_in,
            )
        self._frames_in += 1
        if r == _lib.OK:
            return self._take_packet()
        if r == _lib.NEED_MORE:
            return None
        raise EncoderException(_lib.last_error())

    def flush_single_packet(self) -> Optional[tuple[np.ndarray, PacketData]]:
        """Drain one packet after EOS; None when fully drained."""
        self._ensure_session(self._sync)
        r = self._lib.vpf_encoder_encode(self._h, None, 0, None, 0, -1)
        if r == _lib.OK:
            return self._take_packet()
        if r in (_lib.NEED_MORE, _lib.ERR_EOF):
            return None
        raise EncoderException(_lib.last_error())

    def flush(self) -> list[tuple[np.ndarray, PacketData]]:
        out = []
        while True:
            pkt = self.flush_single_packet()
            if pkt is None:
                return out
            out.append(pkt)

    def reconfigure(
        self, opts: dict, force_idr: bool = False, reset_encoder: bool = False
    ) -> bool:
        """Update options; optionally force next IDR / rebuild the session
        (reference: PyNvEncoder::Reconfigure, Tasks.cpp:146-158)."""
        new = {str(k): str(v) for k, v in opts.items()}
        for k in new:
            if k not in ENCODER_OPTIONS:
                raise ValueError(
                    f'Invalid parameter name"{k}" for NvEncoderClInterface'
                )
        self.opts.update(new)
        if "s" in new:
            w, h = new["s"].split("x")
            self._width, self._height = int(w), int(h)
        if self._h is None:
            return True  # session not built yet; new opts apply at build
        keys, vals, n = _lib.make_string_arrays(new)
        r = self._lib.vpf_encoder_reconfigure(
            self._h, keys, vals, n, 1 if force_idr else 0, 1 if reset_encoder else 0
        )
        if r != _lib.OK:
            raise EncoderException(_lib.last_error())
        return True

    def close(self) -> None:
        if self._h:
            self._lib.vpf_encoder_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
