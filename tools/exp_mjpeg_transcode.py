"""Measure: split MJPEG→MJPEG transcode (host entropy + device pixel
path) vs the libav full transcode, same 1080p clip.

Run on the real TPU (plain `python tools/exp_mjpeg_transcode.py`) or
CPU-forced (`VPF_TPU_FORCE_CPU=1`). Reports fps over max_frames after a
warm-up pass, best of `--runs`.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import samples.utils  # noqa: E402,F401  (honors VPF_TPU_FORCE_CPU=1)

import numpy as np  # noqa: E402


def make_clip(path, w, h, n, quality=90):
    from videoprocessingframework_tpu.io import MjpegWriter

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        (yy * 255 / h)[..., None] * np.array([1.0, 0.6, 0.3])
        + (xx * 255 / w)[..., None] * np.array([0.0, 0.4, 0.7])
    ) / 2
    with MjpegWriter(path, w, h, quality=quality) as wr:
        left = n
        while left > 0:
            k = min(4, left)
            f = np.clip(
                base[None] + rng.normal(0, 6, (k, h, w, 3)), 0, 255
            ).astype(np.uint8)
            wr.write_rgb(f)
            left -= k
    return path


def run_split(src, n, batch, quality):
    from videoprocessingframework_tpu.io import MjpegTranscoder

    t = MjpegTranscoder(src, None, quality=quality, batch=batch,
                        max_frames=n)
    st = t.run()
    run_split.kb_frame = st.out_bytes / st.frames / 1024
    return st.frames / st.wall_s, st.frames


def run_libav(src, n, qscale):
    from videoprocessingframework_tpu.io.transcode import Transcoder

    t = Transcoder(
        src,
        {"codec": "mjpeg", "rc": "constqp", "initqp": str(qscale),
         "bf": "0"},
        max_frames=n,
    )
    st = t.run()
    run_libav.kb_frame = st.out_bytes / st.frames / 1024
    return st.frames / st.wall_s, st.frames


def run_host_halves(src, n, quality, runs):
    """The per-core ceiling decomposition: the split path's host cost is
    entropy decode + entropy encode ONLY (the pixel path is device work
    that is ~100x faster than any host half); libav pays full decode +
    full encode per frame on the same core."""
    from videoprocessingframework_tpu.io import FFmpegDemuxer
    from videoprocessingframework_tpu.io.jpeg import (
        JpegCoefDecoder, JpegCoefEncoder,
    )
    from videoprocessingframework_tpu.ops.jpeg import std_quant_tables

    dm = FFmpegDemuxer(src)
    pkts = []
    while len(pkts) < n:
        r = dm.demux()
        if r is None:
            break
        pkts.append(r.packet.copy())
    dm.close()

    dec = JpegCoefDecoder()
    dec.decode(pkts[0])  # prime buffers
    info = dec.info
    w, h = int(info.width), int(info.height)

    best_dec = 1e9
    for _ in range(runs):
        t0 = time.perf_counter()
        for p in pkts:
            dec.decode(p)
        best_dec = min(best_dec, (time.perf_counter() - t0) / len(pkts))

    # representative output coefficients: requantize on host once
    # (qt_src/qt_dst scaling — same sparsity the device path emits)
    frames = [tuple(np.copy(c) for c in dec.decode(p)) for p in pkts]
    qts_src = [np.array(info.qt[c][:64], np.int32) for c in range(3)]
    ql, qc = std_quant_tables(quality)
    qts_dst = [ql.astype(np.int32), qc.astype(np.int32), qc.astype(np.int32)]
    out_frames = [
        tuple(
            np.clip(
                np.rint(c.astype(np.float64) * qs / qd), -2047, 2047
            ).astype(np.int16)
            for c, qs, qd in zip(f, qts_src, qts_dst)
        )
        for f in frames
    ]
    enc = JpegCoefEncoder(w, h, quant_tables=(ql, qc))
    best_enc = 1e9
    for _ in range(runs):
        t0 = time.perf_counter()
        for f in out_frames:
            enc.encode(*f)
        best_enc = min(best_enc, (time.perf_counter() - t0) / len(pkts))

    tot = best_dec + best_enc
    print(f"  host halves ({w}x{h}, {len(pkts)} frames):")
    print(f"    entropy decode : {best_dec*1e3:6.2f} ms/frame "
          f"({1/best_dec:6.1f} fps)")
    print(f"    entropy encode : {best_enc*1e3:6.2f} ms/frame "
          f"({1/best_enc:6.1f} fps)")
    print(f"    split host sum : {tot*1e3:6.2f} ms/frame "
          f"({1/tot:6.1f} fps ceiling/core)", flush=True)


def device_slope(src, batch, quality, lo=50, hi=350):
    """Device-side transcode throughput by scan-chain slope (the only
    timing that survives the relay tunnel — see CLAUDE.md). Chains the
    coefficients→coefficients program with the output fed back as the
    next input, so XLA cannot hoist the body."""
    import time as _t

    import jax
    import jax.numpy as jnp

    from videoprocessingframework_tpu.io import FFmpegDemuxer
    from videoprocessingframework_tpu.io.jpeg import JpegCoefDecoder
    from videoprocessingframework_tpu.ops.jpeg import (
        JpegDeviceTranscoder, _jpeg_transcode,
    )

    dm = FFmpegDemuxer(src)
    pkts = []
    while len(pkts) < batch:
        r = dm.demux()
        if r is None:
            break
        pkts.append(r.packet.copy())
    dm.close()
    dec = JpegCoefDecoder()
    frames = [tuple(np.copy(c) for c in dec.decode(p)) for p in pkts]
    t = JpegDeviceTranscoder(dec.info, quality=quality)
    cy, cu, cv = (
        np.stack([f[c] for f in frames]).astype(np.int16) for c in range(3)
    )

    def chain(n):
        @jax.jit
        def run(cy, cu, cv):
            def body(carry, i):
                y, u, v = carry
                y = y + i.astype(jnp.int16)  # vary input per iteration
                out = _jpeg_transcode(
                    y, u, v, *t._inv, *t._fwd,
                    src_geometry=t.src_geometry,
                    dst_geometry=t.dst_geometry,
                    method=t.method, compute=t.compute,
                )
                return out, out[0][0, 0, 0]
            (_, _, _), last = jax.lax.scan(
                body, (cy, cu, cv), jnp.arange(n)
            )
            return last[-1].astype(jnp.int32)
        return run

    # pay the process's first device->host fetch (reverse-relay channel
    # init, up to minutes under bad weather — CLAUDE.md) OUTSIDE timing
    warm = chain(2)
    int(warm(cy, cu, cv))

    runs = {}
    for n in (lo, hi):
        fn = chain(n)
        fn(cy, cu, cv).block_until_ready()  # compile
        t0 = _t.perf_counter()
        int(fn(cy, cu, cv))  # materialize the dependent scalar
        runs[n] = _t.perf_counter() - t0
    frames_delta = (hi - lo) * cy.shape[0]
    fps = frames_delta / (runs[hi] - runs[lo])
    print(f"  device transcode slope: {fps:8.0f} fps "
          f"({1e6/fps:.1f} us/frame, batch {cy.shape[0]}, "
          f"chains {lo}/{hi})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="1920x1080")
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--quality", type=int, default=85)
    ap.add_argument("--qscale", type=int, default=3,
                    help="libav mjpeg qscale (3 ≈ IJG q85 output size)")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--host-only", action="store_true",
                    help="skip the (tunnel-bound) E2E runs")
    ap.add_argument("--device-slope", action="store_true",
                    help="slope-time the device half (skips E2E)")
    args = ap.parse_args()
    w, h = (int(x) for x in args.res.split("x"))

    src = f"/tmp/mjpeg_bench_{w}x{h}_n{args.frames}_q90.mjpeg"
    if not os.path.exists(src):
        print(f"making {args.frames}-frame {w}x{h} clip...", flush=True)
        make_clip(src, w, h, args.frames)

    if args.device_slope:
        device_slope(src, args.batch, args.quality)
        return
    run_host_halves(src, args.frames, args.quality, args.runs)
    if args.host_only:
        return

    for name, fn in (
        ("split", lambda: run_split(src, args.frames, args.batch,
                                    args.quality)),
        ("libav", lambda: run_libav(src, args.frames, args.qscale)),
    ):
        fn()  # warm-up (compile + clip cache)
        best = 0.0
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fps, frames = fn()
            wall = time.perf_counter() - t0
            best = max(best, fps)
            print(f"  {name}: {fps:7.1f} fps  ({frames} frames, "
                  f"{wall:.2f}s wall)", flush=True)
        kb = getattr(run_split if name == "split" else run_libav,
                     "kb_frame", 0.0)
        print(f"{name} best: {best:.1f} fps ({kb:.0f} KB/frame out)",
              flush=True)


if __name__ == "__main__":
    main()
