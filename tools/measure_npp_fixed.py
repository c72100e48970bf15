#!/usr/bin/env python
"""Measure the NPP fixed-point emulation's deviation from the float64
golden across every supported (space, range) combo × precision q ×
rounding mode, over an exhaustive-edge input sweep (every luma code ×
a chroma grid with extremes/pivot) — the numbers recorded in
docs/fidelity.md ("Measured deviation of the emulation").

Pure numpy (exact integer mirror of ops.convert._apply_to_rgb_fixed —
bit-equality of the jitted path against this mirror is pinned by
tests/test_npp_fixed.py::test_jax_path_matches_numpy_mirror).

Usage: python tools/measure_npp_fixed.py [--json]
"""

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from videoprocessingframework_tpu.core.enums import ColorRange, ColorSpace  # noqa: E402
from videoprocessingframework_tpu.ops import colorspace as cs  # noqa: E402
from videoprocessingframework_tpu.ops.convert import (  # noqa: E402
    quantize_csc_matrix,
)

COMBOS = [
    (ColorSpace.BT_709, ColorRange.JPEG, "709×JPEG (_709HDTV)"),
    (ColorSpace.BT_709, ColorRange.MPEG, "709×MPEG (_709CSC)"),
    (ColorSpace.BT_601, ColorRange.JPEG, "601×JPEG (NV12ToRGB)"),
    (ColorSpace.BT_601, ColorRange.MPEG, "601×MPEG (ours only)"),
]


def grid():
    y = np.arange(256)
    c = np.unique(np.r_[np.arange(0, 256, 3), 127, 128, 129, 255])
    yy, cb, cr = np.meshgrid(y, c, c, indexing="ij")
    return (yy.ravel().astype(np.int64), cb.ravel().astype(np.int64),
            cr.ravel().astype(np.int64))


def fixed_rgb(y, cb, cr, space, rng, q, rounding):
    mq, offi = quantize_csc_matrix(space, rng, q)
    ycc = np.stack([y, cb, cr], -1).astype(np.int64) - offi
    acc = ycc @ mq.astype(np.int64).T
    if rounding == "half_up":
        out = (acc + (1 << (q - 1))) >> q
    elif rounding == "half_even":
        out = (acc + (1 << (q - 1)) - 1 + ((acc >> q) & 1)) >> q
    else:
        out = acc >> q
    return np.clip(out, 0, 255)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    y, cb, cr = grid()
    rows = []
    for space, rng, name in COMBOS:
        m, off = cs.rgb_from_ycbcr_matrix(space, rng)
        ycc_f = np.stack([y, cb, cr], -1).astype(np.float64) - np.asarray(off)
        golden = np.clip(np.rint(ycc_f @ np.asarray(m).T), 0, 255)
        row = {"combo": name}
        for q in (8, 10, 16):
            mq, offi = quantize_csc_matrix(space, rng, q)
            dm = mq.astype(np.float64) / (1 << q) - np.asarray(m)
            dev = float(np.abs(ycc_f @ dm.T).max())     # pre-rounding
            fx = fixed_rgb(y, cb, cr, space, rng, q, "half_up")
            int_dev = int(np.abs(fx - golden).max())    # output steps
            frac = float((fx != golden).mean())         # disagreement rate
            row[f"q{q}"] = {
                "pre_round_dev": round(dev, 5),
                "max_output_dev": int_dev,
                "disagree_frac": round(frac, 6),
            }
        rows.append(row)
    if args.json:
        print(json.dumps(rows, indent=1))
        return 0
    print(f"sweep: {len(y):,} (y, cb, cr) triples, rounding=half_up")
    print(f"{'combo':24} " + " ".join(f"{'q=%d' % q:>26}" for q in (8, 10, 16)))
    for r in rows:
        cells = []
        for q in (8, 10, 16):
            c = r[f"q{q}"]
            cells.append(f"dev {c['pre_round_dev']:.4f} "
                         f"max {c['max_output_dev']} "
                         f"≠{100 * c['disagree_frac']:.2f}%")
        print(f"{r['combo']:24} " + " | ".join(cells))
    return 0


if __name__ == "__main__":
    sys.exit(main())
