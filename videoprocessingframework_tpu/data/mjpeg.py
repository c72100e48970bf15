"""Training clips straight from MJPEG corpora through the split codec.

MJPEG is the ideal training-corpus codec for random clip access: every
frame is a standalone JPEG (all-intra), so a shuffled clip sample costs
exactly its own frames — no GOP replay like H.264 (the pixel loader's
seek decodes from the previous keyframe). This loader keeps the whole
pixel path on the TPU: packets entropy-decode to DCT coefficients on the
host (io/native/jpeg.cpp, GIL-free), and ONE device program per batch
runs dequant + IDCT + resize + CSC + normalize
(ops/jpeg.py:JpegDevicePipeline) — coefficients in, model-ready
[B, T, H, W, C] out. Host work per frame is entropy decode only
(measured 1.5-1.8x faster than libav's full software decode per core).

Skipped frames (``frame_stride`` > 1) are never even entropy-decoded —
the demuxer just drops the packets, a luxury no inter-coded codec
allows.

Reference analog: the reference decodes MJPEG through the same engine
surface as every codec (cudaVideoCodec_JPEG) and has no dataset layer;
this composes the repo's split MJPEG codec with its clip sampler.
"""

from __future__ import annotations

import os
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

from ..core.enums import CodecId, SeekMode
from ..core.packet import SeekContext
from ..utils.tracing import trace_range
from .loader import ClipSampler, VideoCorpus, _ClipLoaderBase

__all__ = ["MjpegClipLoader"]


class _JpegClipReader:
    """One MJPEG source: random-access clip extraction to coefficients."""

    def __init__(self, path: str):
        from ..io.demuxer import FFmpegDemuxer
        from ..io.jpeg import JpegCoefDecoder

        self.dmx = FFmpegDemuxer(path)
        self.dec = JpegCoefDecoder()
        self.path = path
        self.next_idx = 0

    def _packet(self, seek_to: Optional[int]) -> np.ndarray:
        if seek_to is not None:
            res = self.dmx.seek(SeekContext(
                seek_frame=int(seek_to), mode=SeekMode.PREV_KEY_FRAME
            ))
        else:
            res = self.dmx.demux()
        if res is None:
            raise RuntimeError(
                f"{self.path}: EOF during clip read (container frame "
                f"count was optimistic; pass lengths= to the loader)"
            )
        return res.packet

    def read_clip(self, start: int, clip_len: int, stride: int,
                  dest) -> None:
        """Entropy-decode frames start, start+stride, … straight into
        the caller's buffers: ``dest(t)`` returns the per-component
        ``[blocks, 64]`` int16 destinations for clip frame t (zero-copy
        — the native parse writes the ring slot directly). Skipped
        frames are demuxed but never entropy-decoded."""
        t = 0
        if start != self.next_idx:
            # all-intra: the PREV_KEY_FRAME seek lands exactly on frame
            # `start` — zero replay
            self.dec.decode_into(self._packet(start), dest(0))
            self.next_idx = start + 1
            t = 1
        idx = self.next_idx
        want = start + t * stride
        while t < clip_len:
            pkt = self._packet(None)
            if idx == want:
                self.dec.decode_into(pkt, dest(t))
                t += 1
                want = start + t * stride
            idx += 1
        self.next_idx = idx


class MjpegClipLoader(_ClipLoaderBase):
    """Shuffled clip batches from MJPEG files, device-decoded.

    Same sampling semantics as :class:`~.loader.VideoClipLoader`
    (deterministic per (seed, epoch), worker-order-invariant,
    ``state_dict``/``load_state_dict`` resume, per-file ``labels``), but
    the decode path is the split JPEG codec: host entropy decode into a
    persistent coefficient ring, one fused device program per batch.

    All files must share geometry, chroma sampling, AND quant tables
    (the tables fold into the device basis matrices; one encoder
    configuration per corpus — re-encode or bucket otherwise). ``output``
    is any fused mode (``rgb_u8`` / ``rgb_f32`` / ``normalized`` /
    ``normalized_nchw``) or ``"planes"`` for raw (y, u, v) batches.
    """

    def __init__(
        self,
        sources,
        clip_len: int = 8,
        frame_stride: int = 1,
        batch_size: int = 4,
        out_size: Optional[tuple[int, int]] = None,
        output: str = "normalized",
        method: str = "lanczos",
        compute: str = "auto",
        shuffle: bool = True,
        seed: int = 0,
        hop: Optional[int] = None,
        drop_last: bool = False,
        workers: int = 0,
        prefetch: int = 2,
        device=None,
        sharding=None,
        shard_index: int = 0,
        shard_count: int = 1,
        labels: Optional[Sequence] = None,
        lengths: Optional[Sequence[int]] = None,
        augment=None,
    ):
        from ..io.demuxer import FFmpegDemuxer
        from ..io.jpeg import JpegCoefDecoder, JpegStreamError, _snapshot
        from ..ops.jpeg import JpegDevicePipeline

        if isinstance(sources, (str, os.PathLike)):
            sources = [sources]
        sources = [str(s) for s in sources]
        # ONE open per file: codec check + first-packet JPEG probe
        # together (VideoCorpus below opens each once more for the
        # stream properties). One configuration per corpus: geometry +
        # sampling pinned by the device pipeline, quant tables fold into
        # its basis matrices.
        snap0 = None
        for s in sources:
            d = FFmpegDemuxer(s)
            try:
                if d.codec != CodecId.MJPEG:
                    raise JpegStreamError(
                        f"{s}: codec is {d.codec.name}, not MJPEG — use "
                        "VideoClipLoader for inter-coded corpora"
                    )
                first = d.demux()
            finally:
                d.close()
            if first is None:
                raise JpegStreamError(f"{s}: empty MJPEG stream")
            dec = JpegCoefDecoder()
            dec.probe(first.packet)
            snap = _snapshot(dec.info)
            if snap0 is None:
                snap0 = snap
            elif (snap.hs, snap.vs, snap.qt) != (
                snap0.hs, snap0.vs, snap0.qt
            ):
                raise JpegStreamError(
                    f"{s}: sampling/quant tables differ from "
                    f"{sources[0]} — one encoder configuration per "
                    "corpus (bucket or re-encode)"
                )
        self.corpus = VideoCorpus(sources, lengths=lengths)
        self._info = snap0
        self._augmented = augment is not None
        self.pipeline = JpegDevicePipeline(
            snap0,
            out_size=out_size,
            output=output,
            method=method,
            compute=compute,
            augment=augment,
            clip_len=clip_len,
            seed=seed,
        )
        self.ncomp = self.pipeline.ncomp
        # per-component block counts from the probe grid
        self._nblocks = [
            int(snap0.bh[c]) * int(snap0.bw[c]) for c in range(self.ncomp)
        ]
        self._qt0 = tuple(snap0.qt[: self.ncomp])
        self._geo0 = (
            snap0.width, snap0.height, snap0.ncomp,
            tuple(snap0.hs), tuple(snap0.vs),
        )
        self._init_common(
            clip_len=clip_len, frame_stride=frame_stride,
            batch_size=batch_size, shuffle=shuffle, seed=seed, hop=hop,
            drop_last=drop_last, workers=workers, prefetch=prefetch,
            device=device, sharding=sharding, shard_index=shard_index,
            shard_count=shard_count, labels=labels, output=output,
        )

    # -- decode --------------------------------------------------------------

    def _coef_buffers(self, count: int) -> list:
        """Persistent per-component coefficient rings
        [B·T, nblocks, 64] int16 (fresh-page faults are ~35 ms/MB on the
        bench host — same rationale as the pixel loader's ring)."""
        bufs = getattr(self, "_bufs", None)
        if bufs is None or len(bufs) < count:
            n = self.batch_size * self.clip_len
            bufs = [
                tuple(
                    np.zeros((n, nb, 64), np.int16) for nb in self._nblocks
                )
                for _ in range(count)
            ]
            self._bufs = bufs
        return bufs

    def _reader_for(self, cache: dict, fi: int) -> _JpegClipReader:
        rd = cache.get(fi)
        if rd is None:
            rd = cache[fi] = _JpegClipReader(self.corpus.streams[fi].path)
        return rd

    def _batches_of_clips(self, samples: np.ndarray) -> Iterator:
        B, T = self.batch_size, self.clip_len
        nbuf = self.prefetch + 1
        bufs = self._coef_buffers(nbuf)
        free: list[int] = list(range(nbuf))
        self._free = free
        groups = [samples[i: i + B] for i in range(0, len(samples), B)]

        def fill_one(cache, ring, s, fi, start):
            rd = self._reader_for(cache, fi)
            rd.read_clip(
                int(start), T, self.frame_stride,
                lambda t: [ring[c][s * T + t] for c in range(self.ncomp)],
            )
            # pinned-configuration guards (checked per clip — any change
            # the decoder adopted mid-clip shows in its info):
            # geometry/sampling changes break the ring layout, and the
            # device bases fold ONE quant-table set — decoding frames
            # quantized with other tables would be silently wrong
            # (adaptive-DQT encoders do this)
            from ..io.jpeg import JpegStreamError, _snapshot

            snap = _snapshot(rd.dec.info)
            geo = (
                snap.width, snap.height, snap.ncomp,
                tuple(snap.hs), tuple(snap.vs),
            )
            if geo != self._geo0:
                raise JpegStreamError(
                    f"{self.corpus.streams[fi].path}: mid-stream "
                    "geometry change inside a clip corpus"
                )
            if tuple(snap.qt[: self.ncomp]) != self._qt0:
                raise JpegStreamError(
                    f"{self.corpus.streams[fi].path}: quant tables "
                    "changed mid-stream — MjpegClipLoader folds one "
                    "table set into the device bases (re-encode, or "
                    "decode this file via MjpegReader which rebuilds "
                    "bases per change)"
                )

        if self.workers <= 1:
            cache: dict = {}
            for grp in groups:
                if not free:
                    raise RuntimeError("coefficient ring exhausted")
                bi = free.pop(0)
                ring = bufs[bi]
                with trace_range("JpegClipDecode"):
                    for s, (fi, start) in enumerate(grp):
                        fill_one(cache, ring, s, int(fi), int(start))
                yield bi, len(grp), [int(fi) for fi, _ in grp]
            return

        from concurrent.futures import ThreadPoolExecutor

        local = threading.local()

        def one(args):
            ring, s, fi, start = args
            cache = getattr(local, "cache", None)
            if cache is None:
                cache = local.cache = {}
            fill_one(cache, ring, s, fi, start)

        with ThreadPoolExecutor(max_workers=self.workers) as ex:
            for grp in groups:
                if not free:
                    raise RuntimeError("coefficient ring exhausted")
                bi = free.pop(0)
                ring = bufs[bi]
                with trace_range("JpegClipDecode"):
                    list(ex.map(one, [
                        (ring, s, int(fi), int(start))
                        for s, (fi, start) in enumerate(grp)
                    ]))
                yield bi, len(grp), [int(fi) for fi, _ in grp]

    # -- dispatch ------------------------------------------------------------

    def _dispatch(self, bi: int, count: int, files: list) -> tuple:
        import jax

        labels = self._batch_labels(files)
        n = count * self.clip_len
        coeffs = tuple(c[:n] for c in self._bufs[bi])
        with trace_range("JpegClipDispatch"):
            if self.sharding is not None:
                try:
                    coeffs = tuple(
                        jax.device_put(c, self.sharding) for c in coeffs
                    )
                except ValueError as e:
                    raise ValueError(
                        f"flat clip batch of {n} frames does not fit "
                        f"{self.sharding}: batch_size*clip_len must be "
                        "divisible by the data-axis size (use "
                        "drop_last=True to keep batches full)"
                    ) from e
            elif self.device is not None:
                coeffs = tuple(
                    jax.device_put(c, self.device) for c in coeffs
                )
            if self._augmented:
                idx = self._dispatch_index
                self._dispatch_index += 1
                # shard-unique counter (see loader.py: shards share the
                # seed, so a bare index would replicate augmentations)
                out = self.pipeline(
                    *coeffs,
                    epoch=self._dispatch_epoch,
                    batch_index=idx * self.shard_count + self.shard_index,
                )
            else:
                out = self.pipeline(*coeffs)
        return out, labels, count, bi
