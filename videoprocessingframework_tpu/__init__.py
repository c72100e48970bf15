"""videoprocessingframework_tpu — a TPU-native video processing framework.

A ground-up rebuild of the capabilities of NVIDIA/VideoProcessingFramework
(demux, decode, encode, transcode, color-space conversion, resize, remap,
zero-copy model handoff) designed for TPU hardware:

* Host runtime: native C++ (libav) demux / software decode / encode on the
  TPU-VM CPUs, exposed through a C ABI and driven GIL-free from Python.
* Device compute: JAX/XLA + Pallas kernels. Color conversion is per-pixel
  matrix math on the VPU; resizes are separable interpolation matmuls on the
  MXU; the whole per-frame pipeline (CSC + resize + normalize) fuses into a
  single compiled function per configuration instead of the reference's
  clone-per-stage NPP chain (reference: /root/reference/src/TC/src/
  TasksColorCvt.cpp, Tasks.cpp).
* Parallelism: multi-stream host decode pools feeding batched async uploads,
  and ``jax.sharding.Mesh`` based data/model parallel execution.

The reference-compatible API surface (``PyNvDecoder``, ``PyNvEncoder``,
``PyFFmpegDemuxer``, ``PySurfaceConverter`` …) lives in
:mod:`videoprocessingframework_tpu.compat` and the top-level ``PyNvCodec``
shim package.
"""

__version__ = "0.1.0"

from .core.enums import (  # noqa: F401
    PixelFormat,
    ColorSpace,
    ColorRange,
    SeekMode,
    CodecId,
)
from .core.packet import (  # noqa: F401
    PacketData,
    SeekContext,
    ColorspaceConversionContext,
    MuxingParams,
)
from .core.surface import Surface, SurfacePlane, HostBuffer  # noqa: F401
from .core.exceptions import (  # noqa: F401
    CudaArrayInterfaceUnsupported,
    HwResetException,
    CuvidParserException,
    UnsupportedConversion,
)


def devices():
    """All JAX devices visible to the framework (analog of GetNumGpus)."""
    import jax

    return jax.devices()


_LAZY = {
    # io (triggers the native build on first touch)
    "FFmpegDemuxer": "io",
    "VideoDecoder": "io",
    "VideoReader": "io",
    "VideoEncoder": "io",
    "NativeDecodePool": "io",
    "StreamMuxer": "io",
    "Transcoder": "io",
    "transcode": "io",
    "transcode_many": "io",
    # ops
    "SurfaceConverter": "ops",
    "SurfaceResizer": "ops",
    "SurfaceRemaper": "ops",
    "FusedPipeline": "ops",
    "decode_postproc": "ops",
    "normalize": "ops",
    # parallel
    "MultiStreamPipeline": "parallel",
    "make_mesh": "parallel",
    # data
    "VideoCorpus": "data",
    "ClipSampler": "data",
    "VideoClipLoader": "data",
    "BucketedClipLoader": "data",
    "MjpegClipLoader": "data",
    "AugmentSpec": "data",
    # serving
    "InferenceServer": "serving",
    "ServingQueueFull": "serving",
}


def __getattr__(name):
    """Lazy top-level convenience exports (keeps `import
    videoprocessingframework_tpu` free of the native build and jax ops
    until actually used)."""
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(f".{_LAZY[name]}", __name__)
        return getattr(mod, name)
    raise AttributeError(name)
