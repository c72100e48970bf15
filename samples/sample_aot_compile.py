#!/usr/bin/env python
"""Ahead-of-time compiled inference — the TensorRT-engine analog.

The reference's SampleTensorRTResnet.py (samples/SampleTensorRTResnet.py:
1085-1120) builds a serialized TensorRT engine from ONNX ahead of time and
runs decoded frames through it. The XLA equivalent:

1. ``jax.jit(fn).lower(shapes).compile()`` — explicit AOT compilation for
   a FIXED input shape (the analog of building the engine for a fixed
   binding shape; no tracing happens at serve time).
2. ``compiled.as_text()`` / cost analysis — the engine-inspection analog.
3. ``jax.export`` — the serialized-engine analog: the compiled function is
   serialized to bytes, written to disk, reloaded, and served from the
   reloaded copy (survives process restarts; ahead-of-time error checking
   on shape/dtype mismatch, like TensorRT binding validation).

The decode side feeds the compiled function from the native decode pool.
"""

import pathlib as _pathlib
import sys as _sys

_ROOT = _pathlib.Path(__file__).resolve().parent.parent
_sys.path[:0] = [str(_ROOT), str(_ROOT / "samples")]

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import PyNvCodec as nvc
from videoprocessingframework_tpu.core.enums import PixelFormat
from videoprocessingframework_tpu.io import NativeDecodePool
from videoprocessingframework_tpu.models import init_params, resnet50
from videoprocessingframework_tpu.ops.fused import FusedPipeline

from utils import default_input, get_logger  # noqa: E402

log = get_logger("sample_aot_compile")


def build_engine(variables, batch: int, engine_path: _pathlib.Path):
    """AOT-compile preprocessing+model for one fixed batch shape and
    serialize it (the build-engine step)."""
    model = resnet50()

    def serve(variables, frames):
        # frames: normalized NHWC f32 from the fused preprocessing
        logits = model.apply(variables, frames, train=False)
        return jnp.argmax(logits, axis=-1), jax.nn.softmax(logits).max(-1)

    shapes = (
        jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables
        ),
        jax.ShapeDtypeStruct((batch, 224, 224, 3), jnp.float32),
    )
    lowered = jax.jit(serve).lower(*shapes)
    compiled = lowered.compile()
    flops = compiled.cost_analysis()
    log.info(
        "engine compiled: %.2f GFLOP/batch",
        (flops or {}).get("flops", 0) / 1e9,
    )

    # serialized-engine analog: jax.export round trip
    try:
        from jax import export as jax_export

        exported = jax_export.export(jax.jit(serve))(*shapes)
        engine_path.write_bytes(exported.serialize())
        log.info("engine serialized: %s (%d bytes)", engine_path,
                 engine_path.stat().st_size)
        reloaded = jax_export.deserialize(engine_path.read_bytes())
        return lambda v, x: reloaded.call(v, x)
    except Exception as e:  # older jax without export: serve the compiled
        log.info("jax.export unavailable (%s); serving in-process AOT", e)
        return compiled


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=default_input())
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--engine", default="/tmp/vpf_tpu_resnet50.xla")
    args = ap.parse_args()

    probe = nvc.PyFFmpegDemuxer(args.input)
    w, h = probe.Width(), probe.Height()

    variables = init_params(resnet50(), (1, 224, 224, 3))
    engine = build_engine(variables, args.batch, _pathlib.Path(args.engine))

    pre = FusedPipeline(
        PixelFormat.YUV420, probe.ColorSpace(), probe.ColorRange(),
        out_size=(224, 224), output="normalized",
    )
    pool = NativeDecodePool(
        [args.input], batch_size=args.batch,
        out_format=PixelFormat.YUV420,
    )
    t0 = time.perf_counter()
    n = 0
    top = None
    for frames in pool.batches(pre):
        if frames.shape[0] != args.batch:
            break  # AOT engines are fixed-shape; drop the ragged tail
        cls, conf = engine(variables, frames)
        top = (np.asarray(cls)[0], float(np.asarray(conf)[0]))
        n += frames.shape[0]
    dt = time.perf_counter() - t0
    pool.close()
    log.info("served %d frames in %.2fs (%.1f fps); last top-1: class %s "
             "conf %.3f", n, dt, n / dt if dt else 0, *top)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
