"""Mixed-resolution corpora: bucket by geometry, one loader per bucket.

A static-shape fused program per batch is what keeps the whole pipeline
one XLA dispatch, so :class:`~.loader.VideoCorpus` pins one (W, H) per
loader. Real corpora mix resolutions; :class:`BucketedClipLoader` groups
the files by geometry, builds one :class:`~.loader.VideoClipLoader` per
bucket (each with its own compiled program and buffer ring), and
interleaves their batch streams deterministically — batches are drawn
from buckets in proportion to their remaining size, by a pure function
of (seed, epoch), so every file is consumed exactly once per epoch on
any worker count. With a shared ``out_size`` every bucket emits the same
output shape, so the consumer sees one homogeneous batch stream.

Reference analog: none (the reference decodes one stream at a time and
has no dataset layer at all).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .loader import VideoClipLoader, VideoCorpus

__all__ = ["BucketedClipLoader"]


class BucketedClipLoader:
    """Clip loader over a mixed-geometry corpus.

    Accepts the same configuration as :class:`VideoClipLoader` (which
    see) — ``out_size`` is REQUIRED (it is what makes the merged stream
    shape-homogeneous; ``output="packed"`` is rejected for the same
    reason). ``labels`` align with ``sources`` order.
    """

    def __init__(
        self,
        sources: Sequence[str],
        out_size: tuple[int, int],
        labels: Optional[Sequence] = None,
        lengths: Optional[Sequence[int]] = None,
        seed: int = 0,
        loader_cls=None,
        **kw,
    ):
        if kw.get("output", "normalized") == "packed":
            raise ValueError(
                "packed output is per-geometry; use out_size-normalizing "
                "modes with BucketedClipLoader (or one VideoClipLoader "
                "per geometry)"
            )
        sources = [str(s) for s in sources]
        from ..io.demuxer import FFmpegDemuxer

        buckets: dict[tuple[int, int], list[int]] = {}
        for i, src in enumerate(sources):
            d = FFmpegDemuxer(src)
            try:
                buckets.setdefault((d.width, d.height), []).append(i)
            finally:
                d.close()
        self.seed = int(seed)
        # loader_cls: VideoClipLoader (default) or MjpegClipLoader for
        # mixed-geometry MJPEG corpora (same constructor contract)
        if loader_cls is None:
            loader_cls = VideoClipLoader
        self.loaders: list = []
        self.bucket_files: list[list[int]] = []
        for geo in sorted(buckets):
            idxs = buckets[geo]
            self.loaders.append(loader_cls(
                [sources[i] for i in idxs],
                out_size=out_size,
                labels=None if labels is None else [labels[i] for i in idxs],
                lengths=None if lengths is None else [lengths[i] for i in idxs],
                seed=self.seed + len(self.loaders),
                **kw,
            ))
            self.bucket_files.append(idxs)
        self._epoch = 0
        self._resume_batches = 0

    def __len__(self) -> int:
        return sum(len(ld) for ld in self.loaders)

    @property
    def clips_per_epoch(self) -> int:
        return sum(ld.clips_per_epoch for ld in self.loaders)

    def _schedule(self, epoch: int) -> np.ndarray:
        """Deterministic interleave: a shuffled multiset of bucket ids,
        one entry per batch, drawn without replacement."""
        ids = np.concatenate([
            np.full(len(ld), i, np.int64)
            for i, ld in enumerate(self.loaders)
        ])
        rng = np.random.default_rng((self.seed, int(epoch), 0xB))
        return ids[rng.permutation(len(ids))]

    def epoch(self, epoch: Optional[int] = None):
        e = self._epoch if epoch is None else int(epoch)
        sched = self._schedule(e)
        skip = min(self._resume_batches, len(sched))
        self._resume_batches = 0
        # arm each sub-loader to resume past its consumed clips (their
        # own deterministic state machinery does the skipping). A
        # bucket's LAST batch can be ragged (drop_last=False), so clamp
        # k full batches to the bucket's shard-local clip count.
        consumed = np.zeros(len(self.loaders), np.int64)
        for b in sched[:skip]:
            consumed[b] += 1
        for i, ld in enumerate(self.loaders):
            n = len(ld.sampler)
            mine = (n - ld.shard_index + ld.shard_count - 1) // ld.shard_count
            clips = min(int(consumed[i]) * ld.batch_size, mine)
            ld.load_state_dict({"epoch": e, "clips": clips})
        self._pos = [e, skip]
        iters = [iter(ld.epoch()) for ld in self.loaders]
        for b in sched[skip:]:
            out = next(iters[b])
            self._pos[1] += 1
            yield out

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    def __iter__(self):
        it = self.epoch(self._epoch)
        self._epoch += 1
        return it

    # -- checkpoint/resume ---------------------------------------------------

    def state_dict(self) -> dict:
        """Position after the last yielded batch (batch-granular)."""
        e, batches = getattr(self, "_pos", [self._epoch, 0])
        return {"epoch": int(e), "batches": int(batches)}

    def load_state_dict(self, state: dict) -> None:
        self._epoch = int(state["epoch"])
        self._resume_batches = int(state["batches"])
