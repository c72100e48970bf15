"""Training-side data loading: clip sampling over video corpora.

The reference stops at per-stream decode loops (its ML samples decode one
stream and feed frames to a model one by one —
samples/SampleTorchResnet.py:1095-1151). Production training wants the
DALI-shaped layer above that: sample random clips from a corpus of
files, decode + preprocess them into dense batches, and land them on an
accelerator (sharded across a mesh) while the previous step trains.
This subpackage is that layer, built TPU-first on the framework's own
demux/seek/decode stack and the fused postproc kernel.
"""

from ..ops.augment import AugmentSpec  # noqa: F401  (loader augment= spec)
from .bucketed import BucketedClipLoader  # noqa: F401
from .loader import (  # noqa: F401
    ClipSampler,
    VideoClipLoader,
    VideoCorpus,
)
from .mjpeg import MjpegClipLoader  # noqa: F401

__all__ = [
    "VideoCorpus",
    "ClipSampler",
    "VideoClipLoader",
    "BucketedClipLoader",
    "MjpegClipLoader",
    "AugmentSpec",
]
