"""Clip-sampling data loader: video corpus → batched device tensors.

The pipeline per batch:

  sample (file, start) windows → seek + decode ``clip_len`` frames per
  clip into packed YUV420 host slots (native decoder packs straight into
  the batch buffer, no intermediate copy) → ONE ``jax.device_put`` of the
  flat [B·T, rows, W] batch (optionally with a ``jax.sharding`` layout so
  the batch lands sharded across a mesh) → ONE fused postproc program
  (CSC + resize + normalize, ops/fused.py) → reshape to [B, T, ...].

Determinism: sampling is a pure function of (seed, epoch); with worker
threads the clips are decoded concurrently but yielded in sample order,
so the batch stream is bit-identical to the serial path.

Reference analog: none — the reference's ML samples drive one stream
sequentially (samples/SampleTorchResnet.py:1095-1151); random access is
its SeekContext machinery (FFmpegDemuxer.cpp:259-388), which this loader
drives per clip. The multi-process sharding hooks (``shard_index``/
``shard_count``) mirror how its RTSP sample splits cameras across
processes (samples/SampleDecodeRTSP.py).
"""

from __future__ import annotations

import os
import threading
from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

import numpy as np

from ..core.enums import ColorRange, ColorSpace, PixelFormat
from ..utils.tracing import trace_range

__all__ = ["VideoCorpus", "ClipSampler", "VideoClipLoader"]


@dataclass(frozen=True)
class _StreamInfo:
    path: str
    width: int
    height: int
    num_frames: int
    color_space: ColorSpace
    color_range: ColorRange
    is_vfr: bool


class VideoCorpus:
    """Probe a set of video files once and pin the shared geometry.

    All files must share (width, height): the loader compiles ONE fused
    program per batch shape, and a static-shape program is what keeps the
    whole pipeline a single XLA dispatch (heterogeneous sources should be
    bucketed into one corpus per size). Colorimetry may vary per file —
    it is resolved to one (space, range) for the fused kernel: pass
    ``color_space=``/``color_range=`` to the loader to override the
    corpus majority.

    ``lengths``: optional explicit frame counts (containers that don't
    declare ``nb_frames`` probe as 0 — supply the count, or the file is
    rejected).
    """

    def __init__(self, sources: Sequence[str],
                 lengths: Optional[Sequence[int]] = None):
        from ..io.demuxer import FFmpegDemuxer

        if not sources:
            raise ValueError("empty corpus")
        self.streams: list[_StreamInfo] = []
        for i, src in enumerate(sources):
            d = FFmpegDemuxer(src)
            try:
                n = int(d.num_frames)
                if lengths is not None and lengths[i]:
                    n = int(lengths[i])
                if n <= 0:
                    raise ValueError(
                        f"{src}: container declares no frame count; pass "
                        f"lengths=[...] to VideoCorpus"
                    )
                self.streams.append(_StreamInfo(
                    path=src,
                    width=d.width,
                    height=d.height,
                    num_frames=n,
                    color_space=d.color_space,
                    color_range=d.color_range,
                    is_vfr=d.is_vfr,
                ))
            finally:
                d.close()
        w0, h0 = self.streams[0].width, self.streams[0].height
        for s in self.streams:
            if (s.width, s.height) != (w0, h0):
                raise ValueError(
                    f"corpus geometry mismatch: {s.path} is "
                    f"{s.width}x{s.height}, expected {w0}x{h0} — bucket "
                    f"sources by size (one loader per bucket)"
                )
        self.width, self.height = w0, h0

    def __len__(self) -> int:
        return len(self.streams)

    def keyframe_indices(self, file_index: int) -> np.ndarray:
        """Display-order frame indices of the stream's keyframes.

        One demux-only pass (no decode — packet metadata carries the key
        flag); cached per file. Packets arrive in decode order, so the
        display index of each keyframe is its rank by pts."""
        cache = getattr(self, "_kf_cache", None)
        if cache is None:
            cache = self._kf_cache = {}
        if file_index in cache:
            return cache[file_index]
        from ..io.demuxer import FFmpegDemuxer

        d = FFmpegDemuxer(self.streams[file_index].path)
        pts, keys = [], []
        try:
            while True:
                r = d.demux()
                if r is None:
                    break
                pts.append(r.pkt_data.pts)
                keys.append(bool(r.pkt_data.key))
        finally:
            d.close()
        order = np.argsort(np.asarray(pts, np.int64), kind="stable")
        keys = np.asarray(keys, bool)[order]
        idx = np.flatnonzero(keys).astype(np.int64)
        cache[file_index] = idx
        return idx

    def majority_colorimetry(self) -> tuple[ColorSpace, ColorRange]:
        """Most common (space, range) pair; UNSPEC/UDEF resolve to the
        BT.601/MPEG defaults the reference's converters assume
        (TasksColorCvt.cpp:136-137)."""
        from collections import Counter

        pairs = Counter()
        for s in self.streams:
            sp = s.color_space
            rg = s.color_range
            if sp == ColorSpace.UNSPEC:
                sp = ColorSpace.BT_601
            if rg == ColorRange.UDEF:
                rg = ColorRange.MPEG
            pairs[(sp, rg)] += 1
        return pairs.most_common(1)[0][0]


class ClipSampler:
    """Deterministic shuffled enumeration of clip windows.

    The index space is every (file, start) with
    ``start ∈ {0, hop, 2·hop, …}`` such that the clip's last frame
    ``start + (clip_len-1)·stride`` is in range. ``epoch(e)`` returns the
    windows permuted by a pure function of ``(seed, e)`` — rerunning an
    epoch reproduces it exactly, on any worker count.
    """

    def __init__(
        self,
        corpus: VideoCorpus,
        clip_len: int,
        stride: int = 1,
        hop: Optional[int] = None,
        shuffle: bool = True,
        seed: int = 0,
        starts_per_file: Optional[Sequence] = None,
    ):
        if clip_len < 1 or stride < 1:
            raise ValueError("clip_len and stride must be >= 1")
        self.clip_len = clip_len
        self.stride = stride
        span = (clip_len - 1) * stride + 1
        self.span = span
        self.hop = int(hop) if hop is not None else span
        if self.hop < 1:
            raise ValueError("hop must be >= 1")
        self.shuffle = shuffle
        self.seed = int(seed)
        windows = []
        if starts_per_file is not None:
            # explicit start positions (e.g. keyframe-aligned sampling):
            # the positions replace the hop grid
            for fi, s in enumerate(corpus.streams):
                last_start = s.num_frames - span
                for st in starts_per_file[fi]:
                    if 0 <= int(st) <= last_start:
                        windows.append((fi, int(st)))
        else:
            for fi, s in enumerate(corpus.streams):
                last_start = s.num_frames - span
                for st in range(0, last_start + 1, self.hop):
                    windows.append((fi, st))
        if not windows:
            raise ValueError(
                f"no clip of span {span} fits any corpus stream "
                f"(shortest has "
                f"{min(s.num_frames for s in corpus.streams)} frames)"
            )
        self._windows = np.asarray(windows, np.int64)

    def __len__(self) -> int:
        return len(self._windows)

    def epoch(self, epoch: int = 0) -> np.ndarray:
        """[(file_idx, start), …] for one epoch, shuffled per (seed, epoch)."""
        if not self.shuffle:
            return self._windows
        rng = np.random.default_rng((self.seed, int(epoch)))
        return self._windows[rng.permutation(len(self._windows))]


class _ClipReader:
    """One source: sequential-aware clip extraction.

    Tracks the next frame index so back-to-back windows decode without a
    seek (the shuffle=False / hop=span configuration never seeks at all);
    any other start runs the PREV_KEY_FRAME seek + decode-to-target loop
    (the reference's EXACT_FRAME semantics, FFmpegDemuxer.cpp:259-388).
    """

    def __init__(self, path: str, out_format: PixelFormat, threads: int):
        from ..io.decoder import VideoReader

        self.reader = VideoReader(path, threads=threads)
        self.reader.decoder.output_format = out_format
        self.path = path
        self.out_format = out_format
        self.threads = threads
        self.next_idx = 0

    def _reopen(self) -> None:
        """Fresh demux+decode session at frame 0 — the rewind path for
        UNSEEKABLE inputs (raw Annex-B elementary streams have no
        container index, so libav refuses av_seek_frame). Persistent
        reader sessions (kept across epochs since r5) made rewinds
        reachable: epoch N+1 revisits windows behind ``next_idx``."""
        from ..io.decoder import VideoReader

        self.reader.decoder.close()
        self.reader.demuxer.close()
        self.reader = VideoReader(self.path, threads=self.threads)
        self.reader.decoder.output_format = self.out_format
        self.next_idx = 0

    def read_clip(self, start: int, clip_len: int, stride: int,
                  out: np.ndarray) -> tuple:
        """Decode frames start, start+stride, … into ``out[t]`` slots.

        The sequential clip body runs as ONE native call
        (``vpf_read_frames_seq``: demux→decode→pack in C) — the
        per-frame ctypes path costs ~1.7 ms/frame of interpreter
        overhead at 1080p (measured r5, 4.1 vs 2.4 ms/frame). The seek
        (when needed) stays on the Python path for its PacketData/
        target-pts logic, then hands the primed sessions to the native
        body.

        Returns ``(kept, skipped, seeks)`` for the loader's stage
        accounting: ``skipped`` counts frames decoded-and-discarded
        (stride gaps + the GOP replay a random seek pays — the dominant
        cost the stage table exists to expose)."""
        from ..core.exceptions import (
            CuvidParserException,
            HwResetException,
        )
        from ..core.packet import SeekContext

        t = 0
        seeks = 0
        skipped = 0
        pre_skip = 0
        if start != self.next_idx:
            ctx = SeekContext(seek_frame=int(start))
            seeks = 1
            try:
                f = self.reader.decode(seek_ctx=ctx, out=out[0])
            except (HwResetException, CuvidParserException):
                raise  # real decode/parse failures, not a seek refusal
            except RuntimeError:
                # unseekable input (raw elementary stream: no container
                # index, av_seek_frame refuses): emulate the seek
                # sequentially — forward gaps decode-and-discard from
                # here; rewinds reopen the session first
                if start < self.next_idx:
                    self._reopen()
                pre_skip = start - self.next_idx
            else:
                if f is None:
                    raise RuntimeError(
                        f"{self.path}: seek to frame {start} hit EOF"
                    )
                # frames the PREV_KEY_FRAME seek decoded AND discarded
                # to reach the target (the GOP replay cost)
                skipped += max(0, int(ctx.num_frames_decoded) - 1)
                self.next_idx = start + 1
                t = 1
        n_want = clip_len - t
        if n_want > 0:
            skip_first = (stride - 1) if t else pre_skip
            kept = self._read_seq(out[t:], n_want, stride, skip_first)
            if kept < n_want:
                raise RuntimeError(
                    f"{self.path}: EOF inside clip "
                    f"[{start}, +{clip_len}x{stride}] — container frame "
                    f"count was optimistic; pass lengths= to VideoCorpus"
                )
            consumed = skip_first + 1 + (kept - 1) * stride
            self.next_idx += consumed
            skipped += skip_first + (kept - 1) * (stride - 1)
        return clip_len, skipped, seeks

    def _read_seq(self, dst: np.ndarray, n_want: int, stride: int,
                  skip_first: int) -> int:
        """Native sequential read into ``dst`` ([n, rows, W] u8 view of
        the ring slot); maps native error codes to the same typed
        exceptions as the per-frame path."""
        import ctypes as C

        from ..core.exceptions import (
            BitstreamParserException,
            HwResetException,
        )
        from ..io import _lib as lib_mod

        reader = self.reader
        lib = lib_mod.load()
        dec = reader.decoder
        frame_bytes = int(dst[0].nbytes)
        r = lib.vpf_read_frames_seq(
            reader.demuxer._h, dec._h, int(dec.output_format),
            dst.ctypes.data_as(C.POINTER(C.c_uint8)), frame_bytes,
            int(n_want), int(stride), int(skip_first),
        )
        if r >= 0:
            return int(r)
        if r == lib_mod.ERR_PARSE:
            raise BitstreamParserException(lib_mod.last_error())
        if r == lib_mod.ERR_DECODE:
            lib.vpf_decoder_recreate(dec._h)
            raise HwResetException(lib_mod.last_error())
        raise RuntimeError(lib_mod.last_error())


class _ClipLoaderBase:
    """Shared epoch machinery for the clip loaders.

    Subclasses provide ``_batches_of_clips(samples)`` yielding
    ``(buffer_index, filled_count, file_indices)`` against a persistent
    buffer ring (set ``self._free`` to the ring's free-list), and
    ``_dispatch(bi, count, files) -> (out, labels, count, bi)``. The
    base contributes batching/len arithmetic, the prefetch/finish loop
    with ring recycling, label pairing, deterministic multi-host sample
    sharding, and mid-epoch ``state_dict``/``load_state_dict`` resume.
    """

    def _init_common(
        self, *, clip_len, frame_stride, batch_size, shuffle, seed, hop,
        drop_last, workers, prefetch, device, sharding, shard_index,
        shard_count, labels, output, sampler_starts=None,
    ) -> None:
        """Shared configuration (requires ``self.corpus`` set): sampler,
        batching/shard/placement params, the measured worker/prefetch
        policy, the VFR seek gate, and label validation."""
        if not (0 <= shard_index < shard_count):
            raise ValueError("need 0 <= shard_index < shard_count")
        self.sampler = ClipSampler(
            self.corpus, clip_len, frame_stride, hop=hop,
            shuffle=shuffle, seed=seed, starts_per_file=sampler_starts,
        )
        self.clip_len = clip_len
        self.frame_stride = frame_stride
        self.batch_size = int(batch_size)
        self.drop_last = bool(drop_last)
        self.shard_index, self.shard_count = int(shard_index), int(shard_count)
        self.device = device
        self.sharding = sharding
        self.output = output
        ncpu = os.cpu_count() or 1
        self.workers = (
            int(workers) if workers > 0
            else (1 if ncpu == 1 else min(self.batch_size, ncpu))
        )
        # measured on small hosts (MultiStreamPipeline): keeping batches
        # in flight serializes badly against the runtime on 1 core —
        # block immediately there, overlap elsewhere
        self.prefetch = 1 if ncpu == 1 else max(1, int(prefetch))
        # frame-number seeks happen whenever per-reader access isn't
        # strictly sequential: shuffled sampling, overlapping hops, or
        # worker fan-out (threads interleave windows across readers)
        needs_seek = (
            shuffle or self.sampler.hop != self.sampler.span
            or self.workers > 1
        )
        if needs_seek:
            vfr = [s.path for s in self.corpus.streams if s.is_vfr]
            if vfr:
                raise ValueError(
                    "random clip access seeks by frame number, which VFR "
                    "streams don't support (reference contract: 'Can't "
                    "seek by frame number in VFR streams') — use "
                    "shuffle=False with contiguous hop and workers=1, or "
                    f"re-mux: {vfr}"
                )
        if labels is not None and len(labels) != len(self.corpus):
            raise ValueError(
                f"{len(labels)} labels for {len(self.corpus)} corpus files"
            )
        self.labels = np.asarray(labels) if labels is not None else None
        self._epoch = 0
        self._resume_clips = 0  # one-shot skip set by load_state_dict
        # per-stage wall clock + frame accounting (VERDICT r4 #5): the
        # loader-vs-decoder gap must be attributable — decode (incl. GOP
        # replay, counted separately), dispatch (staging + program), and
        # drain (the block_until_ready barrier before ring reuse)
        from ..utils.tracing import StageTimer

        self.timer = StageTimer()
        self._lock = threading.Lock()
        self.frame_stats = {"kept": 0, "replayed": 0, "seeks": 0}

    def _note_clip(self, kept: int, skipped: int, seeks: int) -> None:
        with self._lock:
            st = self.frame_stats
            st["kept"] += kept
            st["replayed"] += skipped
            st["seeks"] += seeks

    def stage_summary(self) -> dict:
        """Stage table: mean/total wall clock per pipeline stage plus the
        decode-side frame accounting (kept vs replayed-and-discarded)."""
        out = dict(self.timer.summary())
        out["frames"] = dict(self.frame_stats)
        kept = self.frame_stats["kept"]
        total = kept + self.frame_stats["replayed"]
        out["frames"]["replay_overhead"] = (
            self.frame_stats["replayed"] / kept if kept else 0.0
        )
        out["frames"]["decoded_total"] = total
        return out

    def __len__(self) -> int:
        """Batches per epoch for THIS shard."""
        n = len(self.sampler)
        mine = (n - self.shard_index + self.shard_count - 1) // self.shard_count
        if self.drop_last:
            return mine // self.batch_size
        return (mine + self.batch_size - 1) // self.batch_size

    @property
    def clips_per_epoch(self) -> int:
        return len(self.sampler)

    def _reshape_out(self, out, b: int):
        T = self.clip_len

        def r(a):
            return a.reshape((b, T) + a.shape[1:])

        return tuple(r(p) for p in out) if isinstance(out, tuple) else r(out)

    def epoch(self, epoch: Optional[int] = None) -> Iterator:
        """Yield ``[B, T, ...]`` device batches (``(batch, labels)``
        pairs when the loader has labels) for one epoch."""
        import jax

        e = self._epoch if epoch is None else int(epoch)
        samples = self.sampler.epoch(e)
        if self.shard_count > 1:
            samples = samples[self.shard_index::self.shard_count]
        skip = min(self._resume_clips, len(samples))
        self._resume_clips = 0
        self._pos = [e, skip]
        # deterministic per-dispatch counter (augmentation keys): every
        # mid-epoch resume point sits after whole batches, so the batch
        # index resumes exactly and augmented streams are resume-exact
        self._dispatch_epoch = e
        self._dispatch_index = skip // self.batch_size
        samples = samples[skip:]

        def finish(disp):
            out, labels, b, bi = disp
            # the transfer out of the host buffer must complete before
            # its ring slot is reused (block_until_ready is the
            # correctness barrier for buffer recycling)
            with self.timer.measure("drain"):
                jax.block_until_ready(out)
            self._free.append(bi)
            out = self._reshape_out(out, b)
            self._pos[1] += b
            return (out, labels) if labels is not None else out

        inflight: list = []
        for bi, count, files in self._batches_of_clips(samples):
            if count < self.batch_size and self.drop_last:
                self._free.append(bi)
                continue
            with self.timer.measure("dispatch"):
                inflight.append(self._dispatch(bi, count, files))
            if len(inflight) >= self.prefetch:
                yield finish(inflight.pop(0))
        while inflight:
            yield finish(inflight.pop(0))

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    def __iter__(self) -> Iterator:
        it = self.epoch(self._epoch)
        self._epoch += 1
        return it

    # -- checkpoint/resume ---------------------------------------------------

    def state_dict(self) -> dict:
        """Position after the last yielded batch: resume-exact."""
        e, clips = getattr(self, "_pos", [self._epoch, 0])
        return {"epoch": int(e), "clips": int(clips)}

    def load_state_dict(self, state: dict) -> None:
        """Arm the loader so the next :meth:`epoch` / ``iter()`` call
        resumes exactly after the checkpointed batch (same seed and
        configuration assumed — sampling is deterministic)."""
        self._epoch = int(state["epoch"])
        self._resume_clips = int(state["clips"])

    def _batch_labels(self, files: list):
        return (
            self.labels[np.asarray(files)]
            if self.labels is not None else None
        )


class VideoClipLoader(_ClipLoaderBase):
    """Corpus → shuffled clip batches on device: ``[B, T, ...]`` tensors.

    ``output``: any :class:`~videoprocessingframework_tpu.ops.fused.
    FusedPipeline` mode (``rgb_u8`` / ``rgb_f32`` / ``normalized`` /
    ``normalized_nchw``) — the whole CSC+resize+normalize runs as one
    program over the flat [B·T] batch — or ``"packed"`` for the raw
    uploaded YUV420 batches.

    ``sharding``: an optional :class:`jax.sharding.Sharding` for the flat
    batch (e.g. ``NamedSharding(mesh, P("data"))``): the host batch is
    placed sharded BEFORE the fused program runs, so postproc executes
    data-parallel across the mesh and the yielded batch stays distributed
    (B·T must divide the data-axis size; use ``drop_last=True``).

    ``shard_index``/``shard_count``: multi-host sample-space sharding —
    each process takes every ``shard_count``-th sample of the same
    deterministic epoch permutation.

    ``workers``: decode thread count; 0 = auto (min(batch, cores), serial
    on 1-core hosts — the measured policy from the decode pool). Output
    order (and bytes) are identical on every worker count.

    ``labels``: optional per-source labels (one per corpus file). When
    given, batches are ``(tensor, label_array)`` pairs — the label of
    each clip's source file, shaped [B] (classification corpora are
    (video, label) pairs; labels ride host-side so the consumer decides
    their placement).

    Mid-epoch checkpoint/resume: :meth:`state_dict` captures (epoch,
    clips consumed); a loader constructed with the same configuration
    and :meth:`load_state_dict` resumes yielding the exact remaining
    batch stream (sampling is a pure function of seed+epoch, so the skip
    is deterministic). The reference has no checkpointing at all
    (SURVEY.md §5 — seek is its closest analog); preemption-safe
    training needs it.

    ``augment``: an :class:`~videoprocessingframework_tpu.ops.augment.
    AugmentSpec` — random resized crop / h-flip / color jitter fused
    INTO the postproc program (per-clip interpolation matrices as
    batched MXU matmuls; jitter folded after the CSC). Params are
    per-clip (temporally consistent across the T frames), derived from
    (seed, epoch, batch index) — deterministic and resume-exact like
    everything else here. Requires a postproc ``output`` mode.
    """

    def __init__(
        self,
        sources,
        clip_len: int = 8,
        frame_stride: int = 1,
        batch_size: int = 4,
        out_size: Optional[tuple[int, int]] = None,  # (height, width)
        output: str = "normalized",
        method: str = "lanczos",
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
        color_space: Optional[ColorSpace] = None,
        color_range: Optional[ColorRange] = None,
        decode_threads: int = 0,
        kernel: str = "auto",
        compute: str = "auto",
        lengths: Optional[Sequence[int]] = None,
        labels: Optional[Sequence] = None,
        align_keyframes: bool = False,
        augment=None,
    ):
        if isinstance(sources, VideoCorpus):
            self.corpus = sources
        else:
            if isinstance(sources, (str, os.PathLike)):
                sources = [sources]
            self.corpus = VideoCorpus(
                [str(s) for s in sources], lengths=lengths
            )
        starts = None
        if align_keyframes:
            # snap clip starts to keyframes: a random seek into an
            # inter-coded stream replays from the previous keyframe
            # (GOP/2 wasted decodes per clip on average — with gop=30
            # and 8-frame clips that is ~65% of all decode work);
            # keyframe-aligned windows make every seek land exactly on
            # its first frame. One demux-only indexing pass per file.
            starts = [
                self.corpus.keyframe_indices(fi)
                for fi in range(len(self.corpus))
            ]
        self._init_common(
            clip_len=clip_len, frame_stride=frame_stride,
            batch_size=batch_size, shuffle=shuffle, seed=seed, hop=hop,
            drop_last=drop_last, workers=workers, prefetch=prefetch,
            device=device, sharding=sharding, shard_index=shard_index,
            shard_count=shard_count, labels=labels, output=output,
            sampler_starts=starts,
        )
        self.decode_threads = decode_threads

        from ..core import geometry

        w, h = self.corpus.width, self.corpus.height
        if w % 2 or h % 2:
            raise ValueError(
                f"YUV420 packing needs even dimensions, corpus is {w}x{h}"
            )
        self._rows = geometry.host_frame_size(PixelFormat.YUV420, w, h) // w
        sp, rg = self.corpus.majority_colorimetry()
        self.color_space = color_space if color_space is not None else sp
        self.color_range = color_range if color_range is not None else rg
        self._augmented = augment is not None
        if output == "packed":
            if self._augmented:
                raise ValueError(
                    "augment= needs a postproc output mode (rgb_u8/"
                    "rgb_f32/normalized/normalized_nchw), not 'packed'"
                )
            self.pipeline = None
        elif self._augmented:
            # device-fused augmentation: crop/flip/jitter inside the ONE
            # postproc program, keyed by (seed, epoch, batch index) so
            # the augmented stream is deterministic and resume-exact
            from ..ops.augment import AugmentPipeline, AugmentSpec

            if not isinstance(augment, AugmentSpec):
                raise TypeError(
                    f"augment must be an AugmentSpec, got {type(augment)!r}"
                )
            if kernel == "pallas" or compute == "split_bf16":
                # the augmenting program builds per-clip matrices
                # in-graph: the Pallas kernels (trace-time matrices) and
                # the split-bf16 constant-matrix decomposition don't
                # apply — fail loudly instead of ignoring the request
                raise ValueError(
                    "augment= runs the batched-matrix XLA path at "
                    "precision-highest; kernel='pallas' / "
                    "compute='split_bf16' are not available with it"
                )
            oh, ow = out_size or (h, w)
            self.pipeline = AugmentPipeline(
                PixelFormat.YUV420,
                self.color_space,
                self.color_range,
                out_size=(ow, oh),
                spec=augment,
                clip_len=clip_len,
                method=method,
                output=output,
                seed=seed,
            )
        else:
            from ..ops.fused import FusedPipeline

            oh, ow = out_size or (h, w)
            self.pipeline = FusedPipeline(
                PixelFormat.YUV420,
                self.color_space,
                self.color_range,
                out_size=(ow, oh),
                method=method,
                output=output,
                kernel=kernel,
                compute=compute,
            )

    # -- decode --------------------------------------------------------------

    def _reader_for(self, cache: dict, fi: int) -> _ClipReader:
        rd = cache.get(fi)
        if rd is None:
            rd = cache[fi] = _ClipReader(
                self.corpus.streams[fi].path, PixelFormat.YUV420,
                self.decode_threads,
            )
        return rd

    def _batch_buffers(self, count: int) -> list:
        """Reusable [B, T, rows, W] batch buffers, allocated (and
        page-touched) ONCE per loader. Decoding straight into slots of a
        persistent ring matters twice: it removes the per-clip allocation
        + np.stack copy, and it sidesteps fresh-page faults — measured on
        the bench host at ~35 ms/MB (100 MB of new pages cost 3.5 s
        while a copy into touched pages runs 4 GB/s), which made a
        naive per-batch-allocating loader 6x slower than the decoder
        underneath it. Same design as the decode pool's _BatchRing."""
        bufs = getattr(self, "_bufs", None)
        if bufs is None or len(bufs) < count:
            shape = (self.batch_size, self.clip_len, self._rows,
                     self.corpus.width)
            bufs = [np.zeros(shape, np.uint8) for _ in range(count)]
            self._bufs = bufs
        return bufs

    def _batches_of_clips(self, samples: np.ndarray) -> Iterator:
        """Yield (buffer_index, filled_count, file_indices): each batch
        decoded straight into slots of a persistent buffer. The caller
        (epoch) must release buffers via the returned index after the
        dispatched transfer completes."""
        B, T = self.batch_size, self.clip_len
        nbuf = self.prefetch + 1
        bufs = self._batch_buffers(nbuf)
        free: list[int] = list(range(nbuf))
        self._free = free  # epoch() returns indices here after finish()
        groups = [samples[i: i + B] for i in range(0, len(samples), B)]

        if self.workers <= 1:
            # persistent across epochs: re-opening every source per epoch
            # costs a demuxer+decoder session each (~10-30 ms/file) and
            # loses the sequential no-seek fast path at epoch boundaries
            cache = getattr(self, "_reader_cache", None)
            if cache is None:
                cache = self._reader_cache = {}
            for grp in groups:
                if not free:  # all buffers in flight: caller bug
                    raise RuntimeError("batch buffer ring exhausted")
                bi = free.pop(0)
                buf = bufs[bi]
                with trace_range("ClipDecode"), \
                        self.timer.measure("decode"):
                    for s, (fi, start) in enumerate(grp):
                        self._note_clip(*self._reader_for(
                            cache, int(fi)
                        ).read_clip(
                            int(start), T, self.frame_stride, buf[s]
                        ))
                yield bi, len(grp), [int(fi) for fi, _ in grp]
            return

        # thread fan-out: the B clips of a batch decode concurrently into
        # their slots (per-thread reader caches; native decode is
        # GIL-free). Batches pipeline against dispatch via the buffer
        # ring exactly like the serial path.
        from concurrent.futures import ThreadPoolExecutor

        local = threading.local()

        def one(args):
            buf_slot, fi, start = args
            cache = getattr(local, "cache", None)
            if cache is None:
                cache = local.cache = {}
            self._note_clip(*self._reader_for(cache, int(fi)).read_clip(
                int(start), T, self.frame_stride, buf_slot
            ))

        with ThreadPoolExecutor(max_workers=self.workers) as ex:
            for grp in groups:
                if not free:
                    raise RuntimeError("batch buffer ring exhausted")
                bi = free.pop(0)
                buf = bufs[bi]
                with trace_range("ClipDecode"), \
                        self.timer.measure("decode"):
                    list(ex.map(one, [
                        (buf[s], int(fi), int(start))
                        for s, (fi, start) in enumerate(grp)
                    ]))
                yield bi, len(grp), [int(fi) for fi, _ in grp]

    # -- dispatch ------------------------------------------------------------

    def _dispatch(self, bi: int, count: int, files: list) -> tuple:
        import jax

        labels = self._batch_labels(files)
        # contiguous flat [count·T, rows, W] view of the ring buffer — no
        # copy, no fresh pages
        flat = self._bufs[bi][:count].reshape(
            -1, self._rows, self.corpus.width
        )
        with trace_range("ClipBatchDispatch"):
            if self.sharding is not None:
                try:
                    staged = jax.device_put(flat, self.sharding)
                except ValueError as e:
                    raise ValueError(
                        f"flat clip batch of {flat.shape[0]} frames does "
                        f"not fit {self.sharding}: batch_size*clip_len "
                        "must be divisible by the data-axis size (use "
                        "drop_last=True to keep batches full)"
                    ) from e
            elif self.device is not None:
                staged = jax.device_put(flat, self.device)
            else:
                staged = flat  # jit stages the transfer with the call
            if self.pipeline is None:
                if self.sharding is not None or self.device is not None:
                    out = staged
                else:
                    # jit identity, NOT device_put: (a) CPU-jax
                    # device_put may zero-copy-ALIAS the ring slot's
                    # host memory (the yielded batch would mutate when
                    # the slot is recycled — same hazard pool.py
                    # defends against); a jit call always hands back an
                    # owned buffer; (b) on TPU, feeding host numpy
                    # straight into a jitted call stages the transfer
                    # faster than a separate device_put (measured,
                    # CLAUDE.md perf rules).
                    ident = getattr(self, "_ident_jit", None)
                    if ident is None:
                        ident = self._ident_jit = jax.jit(lambda x: x)
                    out = ident(flat)
            elif self._augmented:
                idx = self._dispatch_index
                self._dispatch_index += 1
                # globally-unique counter across multi-host shards:
                # shards share the seed (disjointness needs an identical
                # epoch permutation), so a bare batch index would give
                # every shard the SAME per-clip augmentations
                out = self.pipeline(
                    staged,
                    epoch=self._dispatch_epoch,
                    batch_index=idx * self.shard_count + self.shard_index,
                )
            else:
                out = self.pipeline(staged)
        return out, labels, count, bi
