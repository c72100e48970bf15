"""FFmpegDemuxer — container demux with Annex.B output, SEI extraction and
frame/timestamp seek.

Python face of the native demuxer (io/native/demuxer.cpp). API parity
target: the reference's PyFFmpegDemuxer (src/PyNvCodec/PyFFMpegDemuxer.cpp)
plus the DemuxFrame task semantics (src/TC/src/Tasks.cpp:900-1130).
"""

from __future__ import annotations

import ctypes as C
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..core.enums import CodecId, ColorRange, ColorSpace, PixelFormat, SeekMode
from ..core.exceptions import BitstreamParserException
from ..core.packet import MuxingParams, PacketData, SeekContext
from ..utils.tracing import trace_range
from . import _lib


@dataclass
class DemuxResult:
    packet: np.ndarray  # Annex.B bytes (uint8)
    pkt_data: PacketData
    sei: Optional[np.ndarray] = None


def _pkt_from_c(c: _lib.VpfPacketData) -> PacketData:
    return PacketData(
        key=c.key,
        pts=c.pts,
        dts=c.dts,
        pos=c.pos,
        bsl=c.bsl,
        duration=c.duration,
    )


class FFmpegDemuxer:
    """Demultiplex one video stream from a URL, file, or byte-reader.

    ``source`` may be a path/URL string or any object with a
    ``read(n) -> bytes`` method (DataProvider analog; 8 MB AVIO buffer).
    """

    def __init__(self, source, opts: Optional[dict] = None):
        self._lib = _lib.load()
        self._h = None
        self._read_ref = None  # keep callback alive
        if isinstance(source, (str, bytes)):
            url = source.encode() if isinstance(source, str) else source
            opts = opts or {}
            keys, vals, n = _lib.make_string_arrays(opts)
            self._h = self._lib.vpf_demuxer_open(url, keys, vals, n)
        elif hasattr(source, "read"):

            def read_cb(_opaque, buf, n):
                try:
                    chunk = source.read(n)
                except Exception:
                    return 0
                if not chunk:
                    return 0
                m = len(chunk)
                C.memmove(buf, chunk, m)
                return m

            self._read_ref = _lib.READ_CB(read_cb)
            self._h = self._lib.vpf_demuxer_open_reader(self._read_ref, None)
        else:
            raise TypeError(f"unsupported demuxer source: {type(source)}")
        if not self._h:
            raise RuntimeError(f"Demuxer open failed: {_lib.last_error()}")

        props = _lib.VpfStreamProps()
        self._lib.vpf_demuxer_get_props(self._h, C.byref(props))
        self._props = props
        self.last_packet_data = PacketData()

    # -- stream properties --------------------------------------------------

    @property
    def width(self) -> int:
        return self._props.width

    @property
    def height(self) -> int:
        return self._props.height

    @property
    def framerate(self) -> float:
        return self._props.frame_rate

    @property
    def avg_framerate(self) -> float:
        return self._props.avg_frame_rate

    @property
    def is_vfr(self) -> bool:
        return bool(self._props.is_vfr)

    @property
    def timebase(self) -> float:
        return self._props.time_base

    @property
    def num_frames(self) -> int:
        return self._props.num_frames

    @property
    def codec(self) -> CodecId:
        return CodecId(self._props.codec)

    @property
    def format(self) -> PixelFormat:
        return PixelFormat(self._props.pixel_format)

    @property
    def color_space(self) -> ColorSpace:
        return ColorSpace(self._props.color_space)

    @property
    def color_range(self) -> ColorRange:
        return ColorRange(self._props.color_range)

    @property
    def bit_depth(self) -> int:
        return self._props.bit_depth

    def muxing_params(self) -> MuxingParams:
        return MuxingParams(
            width=self.width,
            height=self.height,
            num_frames=self.num_frames,
            is_vfr=self.is_vfr,
            frame_rate=self.framerate,
            avg_frame_rate=self.avg_framerate,
            time_base=self.timebase,
            stream_index=self._props.stream_index,
            codec=self.codec,
            format=self.format,
            color_space=self.color_space,
            color_range=self.color_range,
        )

    @property
    def extradata(self) -> bytes:
        ptr = C.POINTER(C.c_uint8)()
        size = C.c_size_t()
        self._lib.vpf_demuxer_extradata(self._h, C.byref(ptr), C.byref(size))
        if not size.value:
            return b""
        return bytes(bytearray(ptr[: size.value]))

    @property
    def annexb_extradata(self) -> bytes:
        """Parameter sets in the same form as the demuxed packets
        (Annex.B start codes after the mp4toannexb BSF). Hand this to
        the decoder so SPS/PPS are known at open — before the first
        access unit's SEI, which otherwise precedes the in-band SPS in
        BSF output order (libav then warns "non-existing SPS 0
        referenced in buffering period" once per stream)."""
        ptr = C.POINTER(C.c_uint8)()
        size = C.c_size_t()
        self._lib.vpf_demuxer_annexb_extradata(
            self._h, C.byref(ptr), C.byref(size)
        )
        if not size.value:
            return b""
        return bytes(bytearray(ptr[: size.value]))

    # -- demux / seek --------------------------------------------------------

    def demux(self, need_sei: bool = False) -> Optional[DemuxResult]:
        """Next video packet as Annex.B bytes, or None at EOF."""
        data = C.POINTER(C.c_uint8)()
        size = C.c_size_t()
        pkt = _lib.VpfPacketData()
        sei = C.POINTER(C.c_uint8)()
        sei_size = C.c_size_t()
        with trace_range("DemuxFrame"):
            r = self._lib.vpf_demuxer_demux(
                self._h,
                C.byref(data),
                C.byref(size),
                C.byref(pkt),
                C.byref(sei) if need_sei else None,
                C.byref(sei_size) if need_sei else None,
            )
        if r == _lib.NEED_MORE:
            return None
        if r != _lib.OK:
            raise BitstreamParserException(_lib.last_error())
        packet = np.ctypeslib.as_array(data, shape=(size.value,)).copy()
        out = DemuxResult(packet=packet, pkt_data=_pkt_from_c(pkt))
        self.last_packet_data = out.pkt_data
        if need_sei and sei_size.value:
            out.sei = np.ctypeslib.as_array(sei, shape=(sei_size.value,)).copy()
        return out

    def seek(self, ctx: SeekContext) -> Optional[DemuxResult]:
        """Seek and return the packet landed on; fills ctx out-fields."""
        data = C.POINTER(C.c_uint8)()
        size = C.c_size_t()
        pkt = _lib.VpfPacketData()
        out_pts = C.c_int64(-1)
        out_dur = C.c_int64(-1)
        criteria = 0 if ctx.is_by_number else 1
        with trace_range("DemuxSeek"):
            r = self._lib.vpf_demuxer_seek(
                self._h,
                ctx.seek_frame,
                ctx.seek_tssec,
                criteria,
                int(SeekMode(ctx.mode)),
                C.byref(data),
                C.byref(size),
                C.byref(pkt),
                C.byref(out_pts),
                C.byref(out_dur),
            )
        if r == _lib.ERR_EOF:
            return None
        if r != _lib.OK:
            raise RuntimeError(f"Seek failed: {_lib.last_error()}")
        ctx.out_frame_pts = out_pts.value
        ctx.out_frame_duration = out_dur.value
        packet = np.ctypeslib.as_array(data, shape=(size.value,)).copy()
        self.last_packet_data = _pkt_from_c(pkt)
        return DemuxResult(packet=packet, pkt_data=self.last_packet_data)

    def ts_from_time(self, sec: float) -> int:
        """Seconds → stream-timebase units, with libav's exact rounding."""
        return self._lib.vpf_demuxer_ts_from_time(self._h, sec)

    def ts_from_frame_number(self, n: int) -> int:
        return self._lib.vpf_demuxer_ts_from_frame(self._h, n)

    def flush(self) -> None:
        self._lib.vpf_demuxer_flush(self._h)

    def close(self) -> None:
        if self._h:
            self._lib.vpf_demuxer_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __iter__(self):
        while True:
            r = self.demux()
            if r is None:
                return
            yield r
