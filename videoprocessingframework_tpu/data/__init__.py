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


def __getattr__(name):
    # AugmentSpec lives in ops/ (which imports jax); load it lazily so
    # `import videoprocessingframework_tpu.data` stays jax-free like
    # the rest of the data package (loaders import jax inside methods)
    if name == "AugmentSpec":
        from ..ops.augment import AugmentSpec

        return AugmentSpec
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
