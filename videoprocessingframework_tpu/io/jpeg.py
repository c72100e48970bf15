"""MJPEG decode, TPU-offloaded: host entropy decode → device IDCT.

The reference decodes MJPEG on the GPU's dedicated bitstream engine
(reference: src/TC/inc/FFmpegDemuxer.h:261 maps AV_CODEC_ID_MJPEG →
cudaVideoCodec_JPEG). A TPU has no bitstream engine, so the codec is
split where the hardware is:

* :class:`JpegCoefDecoder` (here, over io/native/jpeg.cpp) runs the
  serial Huffman entropy decode on the host — the only part of JPEG that
  cannot vectorize — emitting quantized DCT coefficients.
* :class:`~videoprocessingframework_tpu.ops.jpeg.JpegDevicePipeline`
  runs everything after the coefficients (dequant + IDCT + plane
  reassembly + CSC + resize) as batched MXU matmuls in ONE XLA program.

:class:`MjpegReader` is the high-level tie: demux an MJPEG container,
entropy-decode on host, hand coefficient batches to the device. Both
baseline (SOF0/1) and progressive (SOF2) streams decode through the
split path — progressive scans accumulate into the same zigzag
coefficient planes, so the device half is identical. Streams the device
path cannot take (12-bit, hierarchical/arithmetic, exotic sampling)
raise :class:`JpegStreamError`; callers fall back to the libav software
path (:class:`~videoprocessingframework_tpu.io.decoder.VideoReader`
handles MJPEG like any other codec).
"""

from __future__ import annotations

import ctypes as C
import time
from typing import Iterator, Optional, Sequence

import numpy as np

from ..core.enums import CodecId
from . import _lib
from .demuxer import FFmpegDemuxer

__all__ = [
    "JpegStreamError",
    "JpegCoefDecoder",
    "JpegCoefEncoder",
    "MjpegReader",
    "MjpegWriter",
    "MjpegTranscoder",
]


class JpegStreamError(RuntimeError):
    """Stream outside the device path's scope (12-bit, hierarchical/
    arithmetic, sampling > 2). Fall back to VideoReader."""


_u8p = C.POINTER(C.c_uint8)
_i16p = C.POINTER(C.c_int16)


def _snapshot(info: "_lib.VpfJpegInfo"):
    """Plain-Python copy of the probe fields the device classes read —
    safe to hand across threads (the ctypes struct is reused per
    decoder) and cheap to compare."""
    from types import SimpleNamespace

    n = int(info.ncomp)
    return SimpleNamespace(
        ncomp=n,
        width=int(info.width),
        height=int(info.height),
        hs=[int(info.hs[c]) for c in range(n)],
        vs=[int(info.vs[c]) for c in range(n)],
        bh=[int(info.bh[c]) for c in range(n)],
        bw=[int(info.bw[c]) for c in range(n)],
        qt=[tuple(info.qt[c][:64]) for c in range(n)],
        restart_interval=int(info.restart_interval),
        progressive=bool(info.progressive),
    )


def _bounded_ordered_map(fn, items, workers: int, depth: int = 4):
    """`map(fn, items)` over a thread pool, yielding IN ORDER with at
    most ``workers * depth`` tasks in flight (Executor.map would consume
    the whole packet iterator up front)."""
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=workers) as ex:
        window: deque = deque()
        it = iter(items)
        try:
            while True:
                while len(window) < workers * depth:
                    window.append(ex.submit(fn, next(it)))
                yield window.popleft().result()
        except StopIteration:
            pass
        while window:
            yield window.popleft().result()


def _as_u8(data) -> np.ndarray:
    a = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) \
        else np.ascontiguousarray(data).view(np.uint8).reshape(-1)
    return a


class JpegCoefDecoder:
    """Entropy-decode baseline JPEG images to zigzag DCT coefficients.

    Stateful per stream: geometry and quant tables are captured at the
    first :meth:`decode` (or explicit :meth:`probe`) and coefficient
    buffers are allocated once; a mid-stream geometry change re-probes
    and reallocates transparently (the native layer bounds-checks and
    refuses to write out-of-capacity, mirroring the video decoder's
    res-change contract).

    ``decode`` returns per-component int16 ``[blocks, 64]`` arrays in
    zigzag order — feed batches of them to ``JpegDevicePipeline``.
    """

    def __init__(self):
        self._lib = _lib.load()
        self.info: Optional[_lib.VpfJpegInfo] = None
        self._bufs: list[np.ndarray] = []
        self.quant_dirty = False  # set when a decode changed the tables

    def probe(self, data) -> _lib.VpfJpegInfo:
        """Parse headers only (through SOS): geometry + quant tables."""
        info = self.peek(data)
        self._adopt(info)
        return info

    def peek(self, data) -> _lib.VpfJpegInfo:
        """Header-only parse WITHOUT adopting (no scratch reallocation,
        no state change) — microseconds, vs milliseconds for the entropy
        decode. Lets callers detect geometry/table changes BEFORE
        decoding into preallocated buffers."""
        a = _as_u8(data)
        info = _lib.VpfJpegInfo()
        rc = self._lib.vpf_jpeg_probe(
            a.ctypes.data_as(_u8p), a.size, C.byref(info)
        )
        if rc != _lib.OK:
            raise JpegStreamError(_lib.last_error())
        return info

    def _adopt(self, info: _lib.VpfJpegInfo) -> None:
        old = self.info
        self.info = info
        self._bufs = [
            np.zeros((int(info.bh[c]) * int(info.bw[c]), 64), np.int16)
            for c in range(int(info.ncomp))
        ]
        if old is not None and any(
            not np.array_equal(
                np.array(old.qt[c][:64]), np.array(info.qt[c][:64])
            )
            for c in range(int(info.ncomp))
        ):
            self.quant_dirty = True

    def _parse_into(self, a: np.ndarray, get_bufs):
        """Run the native parse writing straight into the arrays
        ``get_bufs()`` returns (one contiguous int16 array per
        component). Returns the image's own info struct; re-probes +
        retries once if the geometry grew (``get_bufs`` is re-queried so
        a reallocated scratch is picked up)."""
        assert self.info is not None
        n = int(self.info.ncomp)
        out = _lib.VpfJpegInfo()
        for _ in range(2):  # second pass after a geometry re-probe
            bufs = get_bufs()
            ptrs = (_i16p * n)(
                *(bufs[c].ctypes.data_as(_i16p) for c in range(n))
            )
            caps = (C.c_uint32 * 4)(
                *(b.shape[0] for b in bufs[:n]), *([0] * (4 - n)),
            )
            rc = self._lib.vpf_jpeg_parse(
                a.ctypes.data_as(_u8p), a.size, C.byref(out), ptrs, caps
            )
            if rc == _lib.OK:
                break
            if rc == _lib.ERR_DECODE:  # geometry grew: re-probe, retry
                self.probe(a)
                n = int(self.info.ncomp)
                continue
            raise JpegStreamError(_lib.last_error())
        else:
            raise RuntimeError(_lib.last_error())
        # NOTE: _track_changes may _adopt (reallocating self._bufs), so
        # the buffers the parse actually wrote are returned alongside
        self._track_changes(out, n)
        return out, bufs

    def _track_changes(self, out, n: int) -> None:
        """Adopt structural/table changes (cheap byte-compares — this
        runs per frame on the hot path)."""
        info = self.info
        structural = (
            (out.width, out.height, int(out.ncomp)) !=
            (info.width, info.height, int(info.ncomp))
        ) or bytes(out.hs)[:n] != bytes(info.hs)[:n] \
          or bytes(out.vs)[:n] != bytes(info.vs)[:n]
        tables = any(
            bytes(out.qt[c]) != bytes(info.qt[c]) for c in range(n)
        )
        if structural or tables:
            self._adopt(out)  # sets quant_dirty on table change

    def decode_into(self, data, outs) -> "_lib.VpfJpegInfo":
        """Entropy-decode one image DIRECTLY into caller arrays (one
        contiguous ``[blocks, 64]`` int16 per component) — the zero-copy
        hot path the clip loaders use (the copy-out of :meth:`decode`
        costs ~0.5 ms/frame at 1080p). The caller guarantees capacity;
        returns the image's info struct."""
        a = _as_u8(data)
        if self.info is None:
            self.probe(a)
        out, _ = self._parse_into(a, lambda: outs)
        return out

    def decode(self, data) -> tuple[np.ndarray, ...]:
        """One image → per-component ``[blocks, 64]`` int16 (zigzag).

        Returned arrays are fresh copies (the internal scratch is reused
        across calls). Raises :class:`JpegStreamError` for streams the
        device path cannot take, RuntimeError for corrupt bitstreams.
        """
        a = _as_u8(data)
        if self.info is None:
            self.probe(a)
        out, bufs = self._parse_into(a, lambda: self._bufs)
        n = int(out.ncomp)
        # copy out with the geometry THIS image declared (a shrinking
        # mid-stream change fits the old scratch; slice to the new count)
        return tuple(
            bufs[c][: int(out.bh[c]) * int(out.bw[c])].copy()
            for c in range(n)
        )

    def decode_batch(
        self, packets: Sequence
    ) -> tuple[np.ndarray, ...]:
        """Decode packets into stacked ``[N, blocks, 64]`` batches.

        All packets must share one geometry (a mid-batch geometry change
        raises — split the batch at the boundary like the video pool's
        res-change contract). Quant-table changes within the batch are
        NOT representable in one batch (the device folds the table into
        the basis matrix) and raise too; MJPEG encoders in practice emit
        per-stream constant tables.
        """
        frames = [self.decode(p) for p in packets]
        if self.quant_dirty:
            self.quant_dirty = False
            raise JpegStreamError(
                "quant tables changed mid-batch; decode frame-by-frame "
                "and rebuild the pipeline bases (set_quant_tables)"
            )
        n = len(frames[0])
        shapes = {tuple(c.shape for c in f) for f in frames}
        if len(shapes) != 1:
            raise JpegStreamError(
                "geometry changed mid-batch; split the batch at the change"
            )
        return tuple(
            np.stack([f[c] for f in frames]) for c in range(n)
        )


class JpegCoefEncoder:
    """Entropy-encode quantized DCT coefficients into baseline JFIF.

    The host half of the split MJPEG *encoder*
    (:class:`~videoprocessingframework_tpu.ops.jpeg.JpegDeviceEncoder`
    runs CSC/downsample/fDCT/quant on device); only the serial Huffman
    bit-packing runs here (io/native/jpeg.cpp vpf_jpeg_encode, Annex K
    tables). Output of :meth:`encode` is a complete self-contained JPEG —
    concatenate for raw MJPEG, or hand to :class:`MjpegWriter` for a
    container.
    """

    def __init__(
        self,
        width: int,
        height: int,
        quality: int = 90,
        subsampled=True,
        quant_tables=None,
        restart_interval: int = 0,
    ):
        from ..ops.jpeg import _norm_sampling, encode_geometry, \
            std_quant_tables

        self._lib = _lib.load()
        sampling = _norm_sampling(subsampled)
        if sampling == "420" and (height % 2 or width % 2):
            raise ValueError("4:2:0 JPEG size must be even")
        if sampling == "422" and width % 2:
            raise ValueError("4:2:2 JPEG width must be even")
        if quant_tables is None:
            quant_tables = std_quant_tables(quality)
        ql, qc = (np.asarray(t, np.uint16).reshape(64) for t in quant_tables)
        if max(int(ql.max()), int(qc.max())) > 255:
            raise ValueError(
                "baseline JPEG quant tables are 8-bit (all values <= 255)"
            )
        self.width, self.height = int(width), int(height)
        self.sampling = sampling
        self.subsampled = sampling == "420"  # legacy flag
        self.ncomp = 1 if sampling == "gray" else 3
        self.quant_tables = (ql, qc)
        self._params = _lib.VpfJpegEncParams(
            width=self.width,
            height=self.height,
            ncomp=self.ncomp,
            # native mode: 0 = 4:4:4, 1 = 4:2:0, 2 = 4:2:2
            subsampled={"444": 0, "420": 1, "422": 2, "gray": 0}[sampling],
            restart_interval=int(restart_interval),
        )
        self._params.qt_luma[:] = [int(x) for x in ql]
        self._params.qt_chroma[:] = [int(x) for x in qc]
        (bhy, bwy), (bhc, bwc), _, _ = encode_geometry(
            self.height, self.width, sampling
        )
        self._nblocks = (int(bhy * bwy),) if self.ncomp == 1 else (
            int(bhy * bwy), int(bhc * bwc), int(bhc * bwc)
        )
        # worst case per block ≈ (27 + 63·26) bits, doubled for 0xFF
        # stuffing, plus headers — reused across frames
        self._cap = sum(self._nblocks) * 420 + 8192
        self._out = np.empty(self._cap, np.uint8)

    def encode(self, *coeffs) -> bytes:
        """One frame of ``[blocks, 64]`` int16 zigzag coefficients per
        component (1 for grayscale, 3 otherwise) → complete JPEG bytes."""
        if len(coeffs) != self.ncomp:
            raise ValueError(
                f"expected {self.ncomp} coefficient arrays, got {len(coeffs)}"
            )
        comps = []
        for c, want in zip(coeffs, self._nblocks):
            a = np.ascontiguousarray(c, np.int16)
            if a.shape != (want, 64):
                raise ValueError(
                    f"coefficient shape {a.shape} != ({want}, 64)"
                )
            comps.append(a)
        ptrs = (_i16p * self.ncomp)(
            *(c.ctypes.data_as(_i16p) for c in comps)
        )
        size = C.c_size_t(0)
        rc = self._lib.vpf_jpeg_encode(
            C.byref(self._params),
            ptrs,
            self._out.ctypes.data_as(_u8p),
            self._cap,
            C.byref(size),
        )
        if rc != _lib.OK:
            raise RuntimeError(_lib.last_error())
        return bytes(self._out[: size.value])

    def encode_batch(self, *coeffs) -> list[bytes]:
        """Stacked ``[N, blocks, 64]`` batches (device arrays accepted) →
        one JPEG per frame."""
        coeffs = tuple(np.asarray(c, np.int16) for c in coeffs)
        return [
            self.encode(*(c[i] for c in coeffs))
            for i in range(coeffs[0].shape[0])
        ]


class MjpegWriter:
    """Write an MJPEG stream via the TPU-split encoder.

    Frames go device-first: resize+CSC+fDCT+quant as batched MXU matmuls
    (:class:`~videoprocessingframework_tpu.ops.jpeg.JpegDeviceEncoder`),
    then host entropy packing. ``container=None`` writes raw concatenated
    JPEGs (a valid MJPEG stream libav demuxes directly — feed it back to
    :class:`MjpegReader`); or name a container (``"avi"``…) to mux
    through :class:`~videoprocessingframework_tpu.io.muxer.StreamMuxer`.
    """

    def __init__(
        self,
        url: str,
        width: int,
        height: int,
        quality: int = 90,
        fps: float = 30.0,
        container: Optional[str] = None,
        method: str = "lanczos",
        restart_interval: int = 0,
        sampling="420",
    ):
        from ..ops.jpeg import JpegDeviceEncoder

        self.device = JpegDeviceEncoder(
            height, width, quality=quality, method=method,
            subsampled=sampling,
        )
        self.coef = JpegCoefEncoder(
            width,
            height,
            quant_tables=self.device.quant_tables,
            subsampled=sampling,
            restart_interval=restart_interval,
        )
        self._mux = None
        self._file = None
        if container is not None:
            from .muxer import StreamMuxer

            self._mux = StreamMuxer(
                url, CodecId.MJPEG, width, height, fps=fps, format=container
            )
        else:
            self._file = open(url, "wb")
        self.frames_written = 0

    def write_rgb(self, rgb) -> None:
        """(N, H, W, 3) u8 RGB batch (any size — device resize included)."""
        self._emit(self.device.encode_rgb(rgb))

    def write_planes(self, *planes) -> None:
        """u8 plane batches at the target geometry — (y, u, v), or just
        (y,) for a grayscale writer."""
        self._emit(self.device.encode_planes(*planes))

    def _emit(self, coeffs) -> None:
        for pkt in self.coef.encode_batch(*coeffs):
            if self._mux is not None:
                self._mux.write(pkt, pts=self.frames_written)
            else:
                self._file.write(pkt)
            self.frames_written += 1

    def close(self) -> None:
        if self._mux is not None:
            self._mux.close()
            self._mux = None
        if self._file is not None:
            self._file.close()
            self._file = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class MjpegTranscoder:
    """MJPEG→MJPEG transcode with the whole pixel path on the TPU.

    Host work is entropy coding only: packets entropy-decode to DCT
    coefficients (io/native/jpeg.cpp), one XLA dispatch per batch runs
    dequant/IDCT → optional resize (pixel-domain YUV, no CSC) →
    fDCT/requant on the MXU
    (:class:`~videoprocessingframework_tpu.ops.jpeg.JpegDeviceTranscoder`),
    and the output coefficients entropy-encode back to JFIF. Dispatch is
    async, so the host entropy-decodes batch *i+1* while the device
    transforms batch *i* — the same overlap the reference gets from its
    NVDEC/NVENC engines running async to the CPU
    (samples/SampleMeasureVideoQuality.py is the serial analog). With
    ``workers > 1`` (default: one per core, capped at 8) BOTH host
    halves additionally fan out per-frame across threads — every MJPEG
    packet is a standalone JPEG, and the native entropy calls run
    GIL-free — so the host side scales with cores while output order
    and bytes stay identical to the serial path.

    ``sink``: output path (raw concatenated JPEGs, or a container via
    ``container=``), or ``None`` to drop packets (benchmark mode); pass
    ``on_packet`` to :meth:`run` to stream them elsewhere.
    """

    def __init__(
        self,
        source,
        sink: Optional[str] = None,
        quality: int = 90,
        out_size: Optional[tuple[int, int]] = None,
        container: Optional[str] = None,
        restart_interval: int = 0,
        batch: int = 8,
        method: str = "lanczos",
        compute: str = "auto",
        max_frames: int = 0,
        workers: int = 0,
    ):
        from ..ops.jpeg import JpegDeviceTranscoder

        self._mux = None
        self._file = None
        self._enc_ex = None  # persistent encode pool (workers > 1)
        self.demuxer = FFmpegDemuxer(source)
        try:
            if self.demuxer.codec != CodecId.MJPEG:
                raise JpegStreamError(
                    f"stream codec is {self.demuxer.codec.name}, not MJPEG"
                )
        except BaseException:
            self.close()
            raise
        self.coef = JpegCoefDecoder()
        self.batch = int(batch)
        self.max_frames = int(max_frames)
        # host entropy halves scale per-frame across cores (each MJPEG
        # packet is a standalone JPEG); 0 = auto, same min(work, cores)
        # policy as the native decode pool
        import os as _os

        self.workers = int(workers) if workers > 0 else min(
            8, _os.cpu_count() or 1
        )
        self._cfg = dict(
            quality=quality, out_size=out_size, method=method,
            compute=compute, restart_interval=restart_interval,
        )
        try:
            first = self.demuxer.demux()
            if first is None:
                raise JpegStreamError("empty MJPEG stream")
            self._pending = [first.packet.copy()]
            info = self.coef.probe(self._pending[0])
            self.device = JpegDeviceTranscoder(
                info, quality=quality, out_size=out_size,
                method=method, compute=compute,
            )
            self._new_sink_encoder()
            if sink is not None:
                if container is not None:
                    from .muxer import StreamMuxer

                    fps = self.demuxer.framerate or 30.0
                    self._mux = StreamMuxer(
                        sink, CodecId.MJPEG,
                        self.device.out_w, self.device.out_h,
                        fps=fps, format=container,
                    )
                else:
                    self._file = open(sink, "wb")
        except BaseException:
            self.close()
            raise

    def _new_sink_encoder(self) -> None:
        self.sink_coef = JpegCoefEncoder(
            self.device.out_w,
            self.device.out_h,
            subsampled=self.device.sampling,
            quant_tables=self.device.quant_tables,
            restart_interval=self._cfg["restart_interval"],
        )

    def _packets(self):
        n = 0
        while self._pending:
            if self.max_frames and n >= self.max_frames:
                return
            n += 1
            yield self._pending.pop(0)
        while True:
            if self.max_frames and n >= self.max_frames:
                return
            r = self.demuxer.demux()
            if r is None:
                return
            n += 1
            yield r.packet.copy()

    def _frames(self):
        """Yield ``(frame_coeffs, snapshot)`` in stream order.

        MJPEG images are standalone JPEGs (own DQT/SOF per packet), so
        with ``workers > 1`` packets entropy-decode on a thread pool —
        one :class:`JpegCoefDecoder` per thread, the native call runs
        GIL-free — with a bounded in-order window. This is the serial
        host half made core-scalable (same policy as the decode pool's
        worker threads, io/native/pool.cpp).
        """
        if self.workers <= 1:
            for pkt in self._packets():
                f = self.coef.decode(pkt)
                yield f, _snapshot(self.coef.info)
            return

        import threading

        local = threading.local()

        def one(pkt):
            dec = getattr(local, "dec", None)
            if dec is None:
                dec = local.dec = JpegCoefDecoder()
            f = dec.decode(pkt)
            return f, _snapshot(dec.info)

        yield from _bounded_ordered_map(one, self._packets(), self.workers)

    def _coef_batches(self):
        """Entropy-decode into stacked coefficient batches, splitting at
        quant-table or geometry changes (same contract as MjpegReader)."""
        from ..ops.jpeg import JpegDeviceTranscoder

        if self.workers <= 1:
            yield from self._coef_batches_serial()
            return
        pend: list = []
        key0 = None
        for f, snap in self._frames():
            # geometry key covers everything that changes block layout:
            # dims, component count, sampling factors; qt alone is a
            # cheap basis swap
            geo = (
                snap.width, snap.height, snap.ncomp,
                tuple(snap.hs), tuple(snap.vs),
            )
            key = (geo, tuple(snap.qt))
            if key0 is None:
                key0 = key
            elif key != key0:
                if pend:
                    yield self._stack(pend)
                    pend = []
                self._on_key_change(key0, key, snap)
                key0 = key
            pend.append(f)
            if len(pend) >= self.batch:
                yield self._stack(pend)
                pend = []
        if pend:
            yield self._stack(pend)

    def _on_key_change(self, key0, key, snap) -> None:
        """Rebuild for a mid-stream configuration change (the caller has
        flushed pending frames)."""
        from ..ops.jpeg import JpegDeviceTranscoder

        if key[0] != key0[0]:  # geometry change: rebuild
            resizing = self._cfg["out_size"] is not None
            if not resizing and self._mux is not None:
                raise JpegStreamError(
                    "mid-stream geometry change with a container "
                    "sink needs a fixed out_size (the muxed "
                    "stream has one geometry)"
                )
            self.device = JpegDeviceTranscoder(
                snap,
                quality=self._cfg["quality"],
                out_size=self._cfg["out_size"],
                method=self._cfg["method"],
                compute=self._cfg["compute"],
            )
            if not resizing:  # output geometry follows source
                self._new_sink_encoder()
        else:  # DQT-only change: swap the inverse bases
            self.device.set_src_quant_tables(list(snap.qt))

    def _coef_batches_serial(self):
        """Zero-copy serial batcher: a µs header peek per packet decides
        configuration changes BEFORE the entropy decode writes straight
        into double-buffered coefficient rings (no per-frame copy-out,
        no np.stack — the same ring discipline as the clip loaders; two
        rings alternate against run()'s single in-flight batch)."""
        dec = self.coef

        def key_and_snap(pkt):
            info = dec.peek(pkt)
            snap = _snapshot(info)
            geo = (
                snap.width, snap.height, snap.ncomp,
                tuple(snap.hs), tuple(snap.vs),
            )
            return (geo, tuple(snap.qt)), snap

        def new_rings(snap):
            nblocks = [
                int(snap.bh[c]) * int(snap.bw[c])
                for c in range(int(snap.ncomp))
            ]
            return [
                tuple(
                    np.zeros((self.batch, nb, 64), np.int16)
                    for nb in nblocks
                )
                for _ in range(2)
            ]

        rings = None
        ring_i = 0
        fill = 0
        key0 = None
        for pkt in self._packets():
            key, snap = key_and_snap(pkt)
            if key0 is None:
                key0 = key
                rings = new_rings(snap)
            elif key != key0:
                if fill:
                    ring = rings[ring_i]
                    yield tuple(c[:fill] for c in ring)
                    ring_i ^= 1
                    fill = 0
                if key[0] != key0[0]:
                    rings = new_rings(snap)  # block layout changed
                self._on_key_change(key0, key, snap)
                key0 = key
            ring = rings[ring_i]
            dec.decode_into(
                pkt, [ring[c][fill] for c in range(len(ring))]
            )
            fill += 1
            if fill >= self.batch:
                yield ring
                ring_i ^= 1
                fill = 0
        if fill:
            yield tuple(c[:fill] for c in rings[ring_i])

    @staticmethod
    def _stack(frames):
        return tuple(
            np.stack([f[c] for f in frames]) for c in range(len(frames[0]))
        )

    def run(self, on_packet=None) -> "TranscodeStats":
        """Pump the whole stream → :class:`~.transcode.TranscodeStats`.

        ``on_packet(jpeg_bytes, frame_index)`` additionally receives
        every output image.
        """
        from .transcode import TranscodeStats

        st = TranscodeStats()
        t0 = time.perf_counter()
        inflight = None  # (device coeff batch, sink encoder at dispatch)
        try:
            for coeffs in self._coef_batches():
                out = (self.device(*coeffs), self.sink_coef)
                if inflight is not None:
                    self._drain(inflight, st, on_packet)
                inflight = out  # device computes while we entropy-decode
            if inflight is not None:
                self._drain(inflight, st, on_packet)
            st.wall_s = time.perf_counter() - t0
            return st
        finally:
            self.close()

    def _drain(self, inflight, st, on_packet) -> None:
        coeffs, coder = inflight
        if self.workers <= 1:
            pkts = coder.encode_batch(*coeffs)
        else:
            # per-frame fan-out: each worker packs a stride of frames
            # with its own encoder (the scratch buffer is per-instance);
            # the native pack call runs GIL-free. One persistent pool
            # for the whole run — not per batch.
            from concurrent.futures import ThreadPoolExecutor

            if self._enc_ex is None:
                self._enc_ex = ThreadPoolExecutor(
                    max_workers=self.workers
                )
            coeffs = tuple(np.asarray(c, np.int16) for c in coeffs)
            n = coeffs[0].shape[0]
            w = min(self.workers, n)
            encs = self._enc_pool(coder, w)
            out: list = [None] * n

            def pack(widx):
                e = encs[widx]
                for i in range(widx, n, w):
                    out[i] = e.encode(*(c[i] for c in coeffs))

            list(self._enc_ex.map(pack, range(w)))
            pkts = out
        for pkt in pkts:
            if self._mux is not None:
                self._mux.write(pkt, pts=st.frames)
            elif self._file is not None:
                self._file.write(pkt)
            if on_packet is not None:
                on_packet(pkt, st.frames)
            st.frames += 1
            st.out_bytes += len(pkt)

    def _enc_pool(self, coder: JpegCoefEncoder, w: int):
        """Per-worker clones of the sink encoder (config-identical;
        cached until the sink encoder is rebuilt)."""
        cache = getattr(self, "_enc_cache", None)
        if cache is None or cache[0] is not coder or len(cache[1]) < w:
            clones = [coder] + [
                JpegCoefEncoder(
                    coder.width, coder.height,
                    subsampled=coder.sampling,
                    quant_tables=coder.quant_tables,
                    restart_interval=int(
                        coder._params.restart_interval
                    ),
                )
                for _ in range(w - 1)
            ]
            self._enc_cache = cache = (coder, clones)
        return cache[1]

    def close(self) -> None:
        if self._enc_ex is not None:
            self._enc_ex.shutdown(wait=True)
            self._enc_ex = None
        if self._mux is not None:
            self._mux.close()
            self._mux = None
        if self._file is not None:
            self._file.close()
            self._file = None
        dm = getattr(self, "demuxer", None)
        if dm is not None:
            dm.close()
            self.demuxer = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class MjpegReader:
    """Demux + decode an MJPEG stream end-to-end on the TPU path.

    ``source`` is anything :class:`FFmpegDemuxer` accepts (path/URL or a
    ``read()`` byte provider). Yields device-array batches from
    :class:`JpegDevicePipeline` — ``output='planes'`` for the raw
    (y, u, v) planes, or any fused mode (``rgb_u8``/``normalized``…)
    with resize in the same program.

    The reference exposes MJPEG through the same PyNvDecoder surface
    (cudaVideoCodec_JPEG); here the dedicated reader exists because the
    work split (host entropy / device pixels) is TPU-specific. Streams
    the device path can't handle raise :class:`JpegStreamError` at
    construction — fall back to ``VideoReader(source)``.
    """

    def __init__(
        self,
        source,
        out_size: Optional[tuple[int, int]] = None,
        output: str = "rgb_u8",
        method: str = "lanczos",
        compute: str = "auto",
        batch: int = 8,
    ):
        self.demuxer = FFmpegDemuxer(source)
        if self.demuxer.codec != CodecId.MJPEG:
            raise JpegStreamError(
                f"stream codec is {self.demuxer.codec.name}, not MJPEG"
            )
        self.coef = JpegCoefDecoder()
        self.batch = int(batch)
        first = self.demuxer.demux()
        if first is None:
            raise JpegStreamError("empty MJPEG stream")
        self._pending = [first.packet.copy()]
        info = self.coef.probe(self._pending[0])
        from ..ops.jpeg import JpegDevicePipeline

        self._out_size = out_size  # None = follow the source geometry
        self.pipeline = JpegDevicePipeline(
            info, out_size=out_size, output=output,
            method=method, compute=compute,
        )
        self.width = self.pipeline.width
        self.height = self.pipeline.height

    @staticmethod
    def _geo_key(snap):
        """Everything that changes the block layout or the crop: dims,
        component count, sampling factors. Coefficient-array shapes
        alone under-detect (a dims change inside the same MCU grid keeps
        every [blocks, 64] shape)."""
        return (
            snap.width, snap.height, snap.ncomp,
            tuple(snap.hs), tuple(snap.vs),
        )

    def _packets(self) -> Iterator[np.ndarray]:
        while self._pending:
            yield self._pending.pop(0)
        while True:
            r = self.demuxer.demux()
            if r is None:
                return
            yield r.packet.copy()

    def batches(self):
        """Yield device batches of up to ``batch`` frames (ragged tail).

        Per-frame quant-table changes rebuild the bases (cheap, no
        recompile); geometry changes mid-stream are split at the
        boundary and the pipeline is rebuilt. The decode path is
        zero-copy: a µs header peek per packet decides changes BEFORE
        the entropy decode writes straight into double-buffered
        coefficient rings (same discipline as the clip loaders; two
        rings alternate against one in-flight device batch)."""
        def new_rings(snap):
            nblocks = [
                int(snap.bh[c]) * int(snap.bw[c])
                for c in range(int(snap.ncomp))
            ]
            return [
                tuple(
                    np.zeros((self.batch, nb, 64), np.int16)
                    for nb in nblocks
                )
                for _ in range(2)
            ]

        import jax

        rings = None
        ring_i = 0
        fill = 0
        key0 = None
        # block_until_ready is the correctness barrier before recycling
        # host buffers: track the output dispatched from each ring and
        # wait on it before the ring is refilled (consumers may hold
        # yielded batches without materializing them)
        pending = [None, None]

        def dispatch(coeffs):
            out = self.pipeline(*coeffs)
            pending[ring_i] = out
            return out

        for pkt in self._packets():
            snap = _snapshot(self.coef.peek(pkt))
            key = (self._geo_key(snap), tuple(snap.qt))
            if key0 is None:
                key0 = key
                rings = new_rings(snap)
            elif key != key0:
                if fill:
                    yield dispatch(c[:fill] for c in rings[ring_i])
                    ring_i ^= 1
                    fill = 0
                if key[0] != key0[0]:  # geometry change: rebuild
                    rings = new_rings(snap)
                    pending = [None, None]  # fresh buffers, no waits
                    # out_size=None keeps following the source geometry
                    # — never silently pin the OLD size as a resize
                    self.pipeline = self.pipeline.__class__(
                        snap,
                        out_size=self._out_size,
                        output=self.pipeline.output,
                        method=self.pipeline.method,
                        compute=self.pipeline.compute,
                    )
                    self.width = self.pipeline.width
                    self.height = self.pipeline.height
                else:  # DQT-only: swap the bases
                    self.pipeline.set_quant_tables(snap)
                key0 = key
            if fill == 0 and pending[ring_i] is not None:
                jax.block_until_ready(pending[ring_i])
                pending[ring_i] = None
            ring = rings[ring_i]
            self.coef.decode_into(
                pkt, [ring[c][fill] for c in range(len(ring))]
            )
            self.coef.quant_dirty = False  # handled via the peek key
            fill += 1
            if fill >= self.batch:
                yield dispatch(rings[ring_i])
                ring_i ^= 1
                fill = 0
        if fill:
            yield dispatch(c[:fill] for c in rings[ring_i])

    def frames(self):
        """Per-frame convenience iterator over :meth:`batches`."""
        for out in self.batches():
            if isinstance(out, tuple):  # planes mode
                for i in range(out[0].shape[0]):
                    yield tuple(p[i] for p in out)
            else:
                for i in range(out.shape[0]):
                    yield out[i]
