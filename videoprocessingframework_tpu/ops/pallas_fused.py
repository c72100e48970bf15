"""Pallas fused YUV → resized planar RGB: banded hand-tiled kernels.

Reference semantics anchor: NPP CSC matrix table TasksColorCvt.cpp:142-169
+ Lanczos resize Tasks.cpp:1134-1503; fidelity bar ≤1 u8 ULP vs the
float64 golden (tests/test_interop_metrics_pallas.py).

Two entry points:

* ``fused_yuv420_resize_rgb_pallas`` — planar YUV420 (the decode-pool hot
  layout). ONE kernel per frame when the whole-frame layout fits VMEM:
  banded row-resize of y/u/v whole-frame VMEM blocks into VMEM scratch,
  then banded column-resize (chroma on its half-resolution grid) + CSC,
  planar out; no f32 intermediates ever touch HBM. 4K-class frames
  auto-route through a striped TWO-PASS variant (per-plane banded
  row-resize stripes with f32 intermediates via HBM, then one
  column+CSC kernel) — 1.47x over XLA at 2160p→224².
* ``fused_nv12_resize_rgb_pallas`` — NV12 (interleaved chroma). Two
  kernels: K1 (grid B × W/LANES) banded row-resize of column stripes
  (interleaved chroma rides along, vertical 2× upsample pre-collapsed
  into the matrix); K2 (grid B) column-resize + CSC, chroma dotted
  directly against even/odd-masked collapsed matrices (no lane
  expansion).

The band structure (Lanczos: 6 nonzeros of ~1088 per matrix row) is what
the hand tiling exploits: each 8-output-row tile dots one 32-aligned
128-row (64 half-res) VMEM window — ~8-20× fewer MACs than the dense
dot, bit-identical weights. The same transform LOSES at the XLA/HLO
level (relayout-bound, tools/exp_banded.py). MXU passes use the
split-bf16 trick throughout (u8 exact in bf16; f32 intermediates hi/lo
split, lo×lo dropped).

Alignment: H zero-padded to a multiple of 64 (zero rows pair with zero
matrix columns — exact); NV12 W must be a multiple of a 128-lane stripe;
OUT_W computed 128-lane padded and sliced outside. Measured v5e,
1080p→224², batch 8: ~17 µs/frame planar (59k fps; the pool feeds free
plane views, so this IS the product path) / ~18 µs NV12 vs ~35 µs XLA
split-bf16; 4K two-pass 17k fps vs 8.8k XLA (docs/performance.md).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.enums import ColorRange, ColorSpace
from . import colorspace as cs
from .resize import resize_matrix

LANES_MAX = 512  # K1 column-stripe width cap


def _lanes_for(w: int) -> int:
    """Largest multiple of 128 ≤ LANES_MAX that divides w (0 if none)."""
    for lanes in range(min(LANES_MAX, w), 0, -128):
        if lanes % 128 == 0 and w % lanes == 0:
            return lanes
    return 0


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _f32(x):
    return x.astype(jnp.int32).astype(jnp.float32)


# ---- split-precision MXU strategy -----------------------------------------
# A full-f32 ("highest") MXU dot costs ~6 bf16 passes. But the pixel
# operands here are uint8 — EXACT in bf16's 8-bit mantissa. Splitting only
# the resize matrix into hi+lo bf16 halves (m ≈ hi + lo, |lo| ≤ 2^-8|m|,
# residual ≤ 2^-16|m|) makes  dot(hi, x) + dot(lo, x)  accurate to ~2e-3
# of an 8-bit code at 2 passes instead of 6. K2's inputs are f32
# intermediates, so there BOTH operands are split and the lo×lo term
# dropped (3 passes). Net ~2.5x less MXU work than f32-highest at the same
# ≤1-ULP-vs-float64-golden budget (tests/test_interop_metrics_pallas.py).


def _split_bf16_host(m: np.ndarray):
    import ml_dtypes

    hi = m.astype(ml_dtypes.bfloat16)
    lo = (m - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


def _bf16(x):
    return x.astype(jnp.int32).astype(jnp.bfloat16)  # exact for u8


def _k1_factory():
    def kernel(y_ref, uv_ref, rmh_ref, rml_ref, rch_ref, rcl_ref, yo_ref,
               uvo_ref):
        y = _bf16(y_ref[0])  # (Hp, LANES), exact
        uv = _bf16(uv_ref[0])  # (Hp/2, LANES), exact
        yo_ref[0] = jnp.dot(
            rmh_ref[...], y, preferred_element_type=jnp.float32
        ) + jnp.dot(rml_ref[...], y, preferred_element_type=jnp.float32)
        uvo_ref[0] = jnp.dot(
            rch_ref[...], uv, preferred_element_type=jnp.float32
        ) + jnp.dot(rcl_ref[...], uv, preferred_element_type=jnp.float32)

    return kernel


# ---- banded K1 -------------------------------------------------------------
# The row matrices are K-tap banded (Lanczos: 6 of ~1088 entries per row
# nonzero), so a dense (OUT_H, Hp) dot wastes ~100x MACs. When the frame
# is tall enough, each 8-output-row tile's support fits in a 128-row
# (64 for half-res chroma) input window whose start is aligned to the u8
# sublane tile (32): the row stage becomes T clean (8, WIN)@(WIN, LANES)
# MXU passes — ~8-20x less MXU work, bit-identical weights (extracted
# from the same dense matrix; the alignment slack columns are exact
# zeros). XLA cannot do this transform: expressed as strided slices at
# the HLO level it loses to relayouts (tools/exp_banded.py) — only a
# hand-tiled kernel keeps the windows in VMEM.

_BAND_TILE = 8


def _band_starts(mask: np.ndarray, win: int, align: int, tile: int):
    """Aligned per-tile window starts covering each ``tile``-row group's
    support of a banded matrix, or None when any group doesn't fit."""
    n_out, n_in = mask.shape
    if n_out % tile or n_in < win:
        return None
    t_cnt = n_out // tile
    starts = np.zeros(t_cnt, np.int64)
    for t in range(t_cnt):
        rows = mask[t * tile: (t + 1) * tile]
        cols = np.flatnonzero(rows.any(axis=0))
        lo = 0 if cols.size == 0 else int(cols[0])
        hi = win if cols.size == 0 else int(cols[-1]) + 1
        s = min((lo // align) * align, n_in - win)
        if s % align or hi - s > win:
            return None
        starts[t] = s
    return starts


def _extract_bands(mat: np.ndarray, starts, win: int, tile: int):
    bands = np.zeros((len(starts), tile, win), mat.dtype)
    for t, s in enumerate(starts):
        bands[t] = mat[t * tile: (t + 1) * tile, s: s + win]
    return bands


def _band_plan(mat: np.ndarray, win: int, align: int = 32,
               tile: int = _BAND_TILE):
    """Split (n_out, n_in) banded ``mat`` into per-``tile``-row windows.

    Returns (starts, bands) with starts[t] aligned to ``align`` and
    bands[t] = mat[tile·t : tile·(t+1), starts[t]:starts[t]+win], or None
    when any tile's support does not fit in ``win`` rows."""
    starts = _band_starts(mat != 0, win, align, tile)
    if starts is None:
        return None
    return starts, _extract_bands(mat, starts, win, tile)


def _row_windows(mat: np.ndarray, n_in: int, max_win: int | None = None,
                 align: int = 32, tile: int = _BAND_TILE):
    """Smallest 64-multiple row window whose aligned per-``tile``-row band
    plan fits ``mat`` (wider scale factors — e.g. 2160→224 — need wider
    windows than 1080p's 128). Returns (win, (starts, bands)) or None."""
    cap = n_in if max_win is None else min(max_win, n_in)
    for win in range(64, cap + 1, 64):
        plan = _band_plan(mat, win, align, tile)
        if plan is not None:
            return win, plan
    return None


# Row-tile candidates for the planar kernels, tried in order of estimated
# MXU pass latency. The systolic array streams one pass per tile whose
# cost is ~(N + K) cycles REGARDLESS of the tile's output-row count (M ≤
# 128), so an (8, win) tile wastes 15/16 of each pass: 16-row tiles at
# 16-row alignment (the native bf16 sublane tile, so the window slices
# stay tile-aligned) halve the pass count at identical MACs and
# bit-identical weights. (tile, align) pairs; 8/32 is the conservative
# fallback every shape admits a plan for.
_ROW_TILES = ((16, 16), (8, 32))


def _passes(t_cnt, win):
    return t_cnt * -(-win // 128)  # ceil(win/128) MXU passes per tile


def _banded_rows(x_bf16, bh_ref, bl_ref, starts, win, t_cnt, o_ref,
                 o_idx=None, tile=_BAND_TILE):
    """T unrolled (tile, win)@(win, LANES) MXU passes writing ``tile``
    rows each. ``o_idx`` indexes a leading batch-block dim; None writes a
    2-D ref (VMEM scratch)."""
    for t in range(t_cnt):
        wx = x_bf16[starts[t]: starts[t] + win, :]
        rows = jnp.dot(
            bh_ref[t], wx, preferred_element_type=jnp.float32
        ) + jnp.dot(bl_ref[t], wx, preferred_element_type=jnp.float32)
        sl = slice(t * tile, (t + 1) * tile)
        if o_idx is None:
            o_ref[sl, :] = rows
        else:
            o_ref[o_idx, sl, :] = rows


def _k1_banded_factory(starts_y, starts_c, win_y, win_c, t_cnt,
                       tile=_BAND_TILE):
    sy = [int(s) for s in starts_y]
    sc = [int(s) for s in starts_c]

    def kernel(y_ref, uv_ref, byh_ref, byl_ref, bch_ref, bcl_ref, yo_ref,
               uvo_ref):
        y = _bf16(y_ref[0])  # (Hp, LANES), exact
        uv = _bf16(uv_ref[0])  # (Hp/2, LANES), exact
        _banded_rows(y, byh_ref, byl_ref, sy, win_y, t_cnt, yo_ref, 0,
                     tile=tile)
        _banded_rows(uv, bch_ref, bcl_ref, sc, win_c, t_cnt, uvo_ref, 0,
                     tile=tile)

    return kernel


def _banded_rows_split(x_bf16, bh_ref, bl_ref, starts, win, t_cnt,
                       oh_ref, ol_ref, tile=_BAND_TILE):
    """Like :func:`_banded_rows` but stores the row tile PRE-SPLIT as
    hi/lo bf16 scratch (same f32 tile, split in-register): the column
    stage then skips its per-window f32→hi/lo split — identical values,
    bit-identical output, ~same VMEM (2×bf16 == f32 bytes)."""
    for t in range(t_cnt):
        wx = x_bf16[starts[t]: starts[t] + win, :]
        rows = jnp.dot(
            bh_ref[t], wx, preferred_element_type=jnp.float32
        ) + jnp.dot(bl_ref[t], wx, preferred_element_type=jnp.float32)
        rh = rows.astype(jnp.bfloat16)
        rl = (rows - rh.astype(jnp.float32)).astype(jnp.bfloat16)
        sl = slice(t * tile, (t + 1) * tile)
        oh_ref[sl, :] = rh
        ol_ref[sl, :] = rl


def _split_dot_pre(xh, xl, cmh, cml):
    """The 3-pass split dot over PRE-SPLIT hi/lo activations (same terms
    as :func:`_split_dot`, minus the in-stage split work)."""
    return (
        jnp.dot(xh, cmh, preferred_element_type=jnp.float32)
        + jnp.dot(xh, cml, preferred_element_type=jnp.float32)
        + jnp.dot(xl, cmh, preferred_element_type=jnp.float32)
    )


def _csc_consts(space, rng, swap, mean, std):
    m, off = cs.rgb_from_ycbcr_matrix(space, rng)
    m = np.asarray(m, np.float32)
    off = np.asarray(off, np.float32)
    chans = [0, 1, 2] if not swap else [2, 1, 0]
    return m, off, chans, [float(x) for x in mean], \
        [1.0 / float(x) for x in std]


def _col_csc_emit(yw_of, uw_of, vw_of, cyh_ref, cyl_ref, cch_ref, ccl_ref,
                  n_tiles, m, off, chans, output, mean, inv_std, out_ref):
    """Column-resize + CSC (+ optional normalize) stage, shared by the
    whole-frame kernel (windows sliced from VMEM scratch) and the striped
    two-pass K2 (windows sliced from kernel inputs). ``*_of(p)`` yields
    the (OUT_H, win) f32 source window of output-column tile ``p``."""
    for p in range(n_tiles):
        yr = _split_dot(yw_of(p), cyh_ref[p], cyl_ref[p]) - off[0]
        ur = _split_dot(uw_of(p), cch_ref[p], ccl_ref[p]) - off[1]
        vr = _split_dot(vw_of(p), cch_ref[p], ccl_ref[p]) - off[2]
        for i, c in enumerate(chans):
            val = m[c, 0] * yr + m[c, 1] * ur + m[c, 2] * vr
            sl = (0, i, slice(None), slice(p * 128, (p + 1) * 128))
            _store_channel(out_ref, sl, val, output, mean[i], inv_std[i])


def _store_channel(out_ref, sl, val, output, mean_i, inv_std_i):
    """Store one RGB channel tile in the requested output mode."""
    if output == "rgb_u8":
        val = jnp.clip(jnp.rint(val), 0.0, 255.0)
        out_ref[sl] = val.astype(jnp.int32).astype(jnp.uint8)
    else:
        x = jnp.clip(val * (1.0 / 255.0), 0.0, 1.0)
        if output != "rgb_f32":  # normalized[_nchw]
            x = (x - mean_i) * inv_std_i
        out_ref[sl] = x


def _fused_planar_factory(space: ColorSpace, rng: ColorRange, swap: bool,
                          rstarts_y, rstarts_c, rwin_y, rwin_c, t_cnt,
                          cstarts_y, cwin_y, cstarts_c, cwin_c, n_tiles,
                          output="rgb_u8", mean=(0.0,) * 3, std=(1.0,) * 3,
                          tile=_BAND_TILE):
    """Whole pipeline in ONE kernel per frame: banded row-resize into VMEM
    scratch, banded column-resize (half-grid chroma) + CSC (+ optional
    normalize) out of it. The two-kernel split round-trips ~7 MB/frame of
    f32 intermediates through HBM at 1080p→224² — keeping them in VMEM
    removes that entirely."""
    m, off, chans, mean, inv_std = _csc_consts(space, rng, swap, mean, std)
    rsy = [int(s) for s in rstarts_y]
    rsc = [int(s) for s in rstarts_c]
    csy = [int(s) for s in cstarts_y]
    csc = [int(s) for s in cstarts_c]

    def kernel(y_ref, u_ref, v_ref, byh_ref, byl_ref, bch_ref, bcl_ref,
               cyh_ref, cyl_ref, cch_ref, ccl_ref, out_ref,
               y1_ref, u1_ref, v1_ref):
        _banded_rows(_bf16(y_ref[0]), byh_ref, byl_ref, rsy, rwin_y, t_cnt,
                     y1_ref, tile=tile)
        _banded_rows(_bf16(u_ref[0]), bch_ref, bcl_ref, rsc, rwin_c, t_cnt,
                     u1_ref, tile=tile)
        _banded_rows(_bf16(v_ref[0]), bch_ref, bcl_ref, rsc, rwin_c, t_cnt,
                     v1_ref, tile=tile)
        _col_csc_emit(
            lambda p: y1_ref[:, csy[p]: csy[p] + cwin_y],
            lambda p: u1_ref[:, csc[p]: csc[p] + cwin_c],
            lambda p: v1_ref[:, csc[p]: csc[p] + cwin_c],
            cyh_ref, cyl_ref, cch_ref, ccl_ref, n_tiles,
            m, off, chans, output, mean, inv_std, out_ref,
        )

    return kernel


def _col_csc_emit_pre(yw_of, uw_of, vw_of, cyh_ref, cyl_ref, cch_ref,
                      ccl_ref, n_tiles, m, off, chans, output, mean,
                      inv_std, out_ref):
    """:func:`_col_csc_emit` over pre-split (hi, lo) window pairs."""
    for p in range(n_tiles):
        yr = _split_dot_pre(*yw_of(p), cyh_ref[p], cyl_ref[p]) - off[0]
        ur = _split_dot_pre(*uw_of(p), cch_ref[p], ccl_ref[p]) - off[1]
        vr = _split_dot_pre(*vw_of(p), cch_ref[p], ccl_ref[p]) - off[2]
        for i, c in enumerate(chans):
            val = m[c, 0] * yr + m[c, 1] * ur + m[c, 2] * vr
            sl = (0, i, slice(None), slice(p * 128, (p + 1) * 128))
            _store_channel(out_ref, sl, val, output, mean[i], inv_std[i])


def _fused_planar_presplit_factory(space, rng, swap,
                                   rstarts_y, rstarts_c, rwin_y, rwin_c,
                                   t_cnt, cstarts_y, cwin_y, cstarts_c,
                                   cwin_c, n_tiles, output="rgb_u8",
                                   mean=(0.0,) * 3, std=(1.0,) * 3,
                                   tile=_BAND_TILE):
    """Whole-frame planar kernel with PRE-SPLIT bf16 row scratch: the
    row stage stores hi/lo bf16 pairs (split once, in-register) and the
    column stage consumes them directly — removing the per-window
    f32→hi/lo split VPU work of the f32-scratch variant at identical
    bytes of VMEM and bit-identical output."""
    m, off, chans, mean, inv_std = _csc_consts(space, rng, swap, mean, std)
    rsy = [int(x) for x in rstarts_y]
    rsc = [int(x) for x in rstarts_c]
    csy = [int(x) for x in cstarts_y]
    csc = [int(x) for x in cstarts_c]

    def kernel(y_ref, u_ref, v_ref, byh_ref, byl_ref, bch_ref, bcl_ref,
               cyh_ref, cyl_ref, cch_ref, ccl_ref, out_ref,
               yh_ref, yl_ref, uh_ref, ul_ref, vh_ref, vl_ref):
        _banded_rows_split(_bf16(y_ref[0]), byh_ref, byl_ref, rsy, rwin_y,
                           t_cnt, yh_ref, yl_ref, tile=tile)
        _banded_rows_split(_bf16(u_ref[0]), bch_ref, bcl_ref, rsc, rwin_c,
                           t_cnt, uh_ref, ul_ref, tile=tile)
        _banded_rows_split(_bf16(v_ref[0]), bch_ref, bcl_ref, rsc, rwin_c,
                           t_cnt, vh_ref, vl_ref, tile=tile)
        _col_csc_emit_pre(
            lambda p: (yh_ref[:, csy[p]: csy[p] + cwin_y],
                       yl_ref[:, csy[p]: csy[p] + cwin_y]),
            lambda p: (uh_ref[:, csc[p]: csc[p] + cwin_c],
                       ul_ref[:, csc[p]: csc[p] + cwin_c]),
            lambda p: (vh_ref[:, csc[p]: csc[p] + cwin_c],
                       vl_ref[:, csc[p]: csc[p] + cwin_c]),
            cyh_ref, cyl_ref, cch_ref, ccl_ref, n_tiles,
            m, off, chans, output, mean, inv_std, out_ref,
        )

    return kernel


def _k1p_striped_factory(starts, win, t_cnt, tile=_BAND_TILE):
    """Banded row-resize of ONE planar u8 plane in column stripes:
    (1, Hp, LANES) u8 block → (1, OUT_Hp, LANES) f32 block."""
    s = [int(x) for x in starts]

    def kernel(x_ref, bh_ref, bl_ref, o_ref):
        _banded_rows(_bf16(x_ref[0]), bh_ref, bl_ref, s, win, t_cnt,
                     o_ref, 0, tile=tile)

    return kernel


def _k2p_factory(space: ColorSpace, rng: ColorRange, swap: bool,
                 cstarts_y, cwin_y, cstarts_c, cwin_c, n_tiles,
                 output="rgb_u8", mean=(0.0,) * 3, std=(1.0,) * 3):
    """Two-pass K2: column-resize + CSC from row-resized f32 planes in
    HBM (whole-frame blocks; used when the single-kernel layout exceeds
    VMEM — e.g. 4K sources)."""
    m, off, chans, mean, inv_std = _csc_consts(space, rng, swap, mean, std)
    csy = [int(s) for s in cstarts_y]
    csc = [int(s) for s in cstarts_c]

    def kernel(y1_ref, u1_ref, v1_ref, cyh_ref, cyl_ref, cch_ref, ccl_ref,
               out_ref):
        _col_csc_emit(
            lambda p: y1_ref[0, :, csy[p]: csy[p] + cwin_y],
            lambda p: u1_ref[0, :, csc[p]: csc[p] + cwin_c],
            lambda p: v1_ref[0, :, csc[p]: csc[p] + cwin_c],
            cyh_ref, cyl_ref, cch_ref, ccl_ref, n_tiles,
            m, off, chans, output, mean, inv_std, out_ref,
        )

    return kernel


def _split_dot(x, cmh, cml):
    # x f32 → hi+lo bf16; drop the lo×lo term (≤2^-16 relative). The
    # activation split here is safe from XLA's excess-precision elision
    # because Mosaic compiles the kernel body, not XLA.
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    return (
        jnp.dot(xh, cmh, preferred_element_type=jnp.float32)
        + jnp.dot(xh, cml, preferred_element_type=jnp.float32)
        + jnp.dot(xl, cmh, preferred_element_type=jnp.float32)
    )


def _col_windows(mask: np.ndarray, n_in: int):
    """Smallest 128-step column window admitting aligned per-tile starts.
    Always succeeds: win == n_in degenerates to the dense dot."""
    for win in list(range(128, n_in, 128)) + [n_in]:
        starts = _band_starts(mask, win, 128, 128)
        if starts is not None:
            return starts, win
    raise AssertionError("unreachable: win == n_in always fits")


def _k2_factory(space: ColorSpace, rng: ColorRange, out_w: int, swap: bool,
                cstarts, win_w, n_tiles, output="rgb_u8",
                mean=(0.0,) * 3, std=(1.0,) * 3):
    """Column-resize + CSC. Chroma stays lane-interleaved: dotting the raw
    UV row with even/odd-masked column matrices (pair-summed collapsed
    weights at even / odd source lanes, zeros elsewhere) IS the exact
    half-grid chroma resize — no roll/where expansion needed. Output
    columns are produced in ``n_tiles`` tiles of 128; each tile contracts
    only its ``win_w``-wide source window (the column matrices are banded
    too)."""
    m, off, chans, mean, inv_std = _csc_consts(space, rng, swap, mean, std)
    starts = [int(s) for s in cstarts]

    def kernel(y_ref, uv_ref, cyh_ref, cyl_ref, ceh_ref, cel_ref, coh_ref,
               col_ref, out_ref):
        y = y_ref[0]  # (OUT_H, W) f32
        uv = uv_ref[0]
        for p in range(n_tiles):
            ws = starts[p]
            yw = y[:, ws: ws + win_w]
            uvw = uv[:, ws: ws + win_w]
            yr = _split_dot(yw, cyh_ref[p], cyl_ref[p]) - off[0]
            ur = _split_dot(uvw, ceh_ref[p], cel_ref[p]) - off[1]
            vr = _split_dot(uvw, coh_ref[p], col_ref[p]) - off[2]
            for i, c in enumerate(chans):
                val = m[c, 0] * yr + m[c, 1] * ur + m[c, 2] * vr
                sl = (0, i, slice(None), slice(p * 128, (p + 1) * 128))
                _store_channel(out_ref, sl, val, output, mean[i], inv_std[i])

    return kernel


@partial(
    jax.jit,
    static_argnames=("out_h", "out_w", "space", "rng", "method", "swap",
                     "interpret", "output", "mean", "std"),
)
def fused_nv12_resize_rgb_pallas(
    y: jnp.ndarray,
    uv: jnp.ndarray,
    *,
    out_h: int,
    out_w: int,
    space: ColorSpace = ColorSpace.BT_709,
    rng: ColorRange = ColorRange.MPEG,
    method: str = "lanczos",
    swap: bool = False,
    interpret: bool = False,
    output: str = "rgb_u8",
    mean=(0.0, 0.0, 0.0),
    std=(1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """y (B,H,W) u8 + uv (B,H/2,W) u8 → (B, 3, out_h, out_w) planar RGB.

    output: 'rgb_u8' (u8) | 'rgb_f32' ([0,1] f32) | 'normalized'
    ((x−mean)/std f32). Requires W % LANES == 0 and out_h % 8 == 0; use
    :func:`fused_pallas_supported` to gate.
    """
    if output not in ("rgb_u8", "rgb_f32", "normalized"):
        raise ValueError(f"unsupported output {output!r}")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = y.shape
    lanes = _lanes_for(w)
    if not lanes or out_h % 8:
        raise ValueError(
            f"needs a 128-multiple stripe dividing W and out_h%8==0, "
            f"got {w}/{out_h}"
        )

    hp = _round_up(h, 64)
    hp2 = hp // 2
    if hp != h:
        y = jnp.pad(y, ((0, 0), (0, hp - h), (0, 0)))
        uv = jnp.pad(uv, ((0, 0), (0, hp2 - h // 2), (0, 0)))

    # row matrices: zero columns for the padded rows keep the math exact
    rm_np = np.zeros((out_h, hp), np.float32)
    rm_np[:, :h] = resize_matrix(h, out_h, method)
    rc_np = np.zeros((out_h, hp2), np.float32)
    rc_np[:, : h // 2] = (
        resize_matrix(h, out_h, method).reshape(out_h, h // 2, 2).sum(-1)
    )
    # banded row plans: adaptive window widths and tile height (see
    # _ROW_TILES — identical MACs, fewer systolic passes at tile 16)
    tile, win_y, plan_y, win_c, plan_c = _BAND_TILE, None, None, None, None
    best = None
    for cand_tile, align in _ROW_TILES:
        if out_h % cand_tile:
            continue
        ry = _row_windows(rm_np, hp, 512, align, cand_tile)
        rc = _row_windows(rc_np, hp2, 512, align, cand_tile)
        if ry is None or rc is None:
            continue
        t = out_h // cand_tile
        cost = _passes(t, ry[0]) + _passes(t, rc[0])
        if best is None or cost < best[0]:
            best = (cost, cand_tile, ry[0], ry[1], rc[0], rc[1])
    if best is not None:
        _, tile, win_y, plan_y, win_c, plan_c = best
    stripe_specs = [
        pl.BlockSpec((1, hp, lanes), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hp2, lanes), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, out_h, lanes), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, out_h, lanes), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, out_h, w), jnp.float32),
        jax.ShapeDtypeStruct((b, out_h, w), jnp.float32),
    ]
    if plan_y is not None and plan_c is not None:
        t_cnt = out_h // tile
        byh, byl = map(jnp.asarray, _split_bf16_host(plan_y[1]))
        bch, bcl = map(jnp.asarray, _split_bf16_host(plan_c[1]))
        band_spec = lambda t, n, wn: pl.BlockSpec(  # noqa: E731
            (t, n, wn), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM
        )
        k1 = pl.pallas_call(
            _k1_banded_factory(plan_y[0], plan_c[0], win_y, win_c, t_cnt,
                               tile=tile),
            grid=(b, w // lanes),
            in_specs=stripe_specs + [
                band_spec(t_cnt, tile, win_y),
                band_spec(t_cnt, tile, win_y),
                band_spec(t_cnt, tile, win_c),
                band_spec(t_cnt, tile, win_c),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )
        y1, uv1 = k1(y, uv, byh, byl, bch, bcl)
    else:
        rmh, rml = map(jnp.asarray, _split_bf16_host(rm_np))
        rch, rcl = map(jnp.asarray, _split_bf16_host(rc_np))
        k1 = pl.pallas_call(
            _k1_factory(),
            grid=(b, w // lanes),
            in_specs=stripe_specs + [
                pl.BlockSpec((out_h, hp), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((out_h, hp), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((out_h, hp2), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((out_h, hp2), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )
        y1, uv1 = k1(y, uv, rmh, rml, rch, rcl)

    out_wp = _round_up(out_w, 128)
    cmat = resize_matrix(w, out_w, method)               # (out_w, w)
    coll = cmat.reshape(out_w, w // 2, 2).sum(-1)        # half-grid chroma
    cy_t = np.zeros((out_wp, w), np.float32)
    cy_t[:out_w] = cmat
    ce_t = np.zeros((out_wp, w), np.float32)
    ce_t[:out_w, 0::2] = coll                            # u at even lanes
    co_t = np.zeros((out_wp, w), np.float32)
    co_t[:out_w, 1::2] = coll                            # v at odd lanes
    mask = (cy_t != 0) | (ce_t != 0) | (co_t != 0)
    cstarts, win_w = _col_windows(mask, w)
    n_tiles = out_wp // 128
    cbands = []
    for mt in (cy_t, ce_t, co_t):
        bd = np.ascontiguousarray(
            np.swapaxes(_extract_bands(mt, cstarts, win_w, 128), 1, 2)
        )  # (T, win_w, 128): ready for dot(x_window, band)
        cbands.extend(jnp.asarray(a) for a in _split_bf16_host(bd))

    cband_spec = pl.BlockSpec((n_tiles, win_w, 128), lambda i: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    k2 = pl.pallas_call(
        _k2_factory(ColorSpace(space), ColorRange(rng), out_w, swap,
                    cstarts, win_w, n_tiles, output=output,
                    mean=mean, std=std),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, out_h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [cband_spec] * 6,
        out_specs=pl.BlockSpec((1, 3, out_h, out_wp), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, 3, out_h, out_wp),
            jnp.uint8 if output == "rgb_u8" else jnp.float32,
        ),
        interpret=interpret,
    )
    out = k2(y1, uv1, *cbands)
    return out[..., :out_w]


def fused_pallas_supported(w: int, out_h: int) -> bool:
    return _lanes_for(w) > 0 and out_h % 8 == 0


@lru_cache(maxsize=256)
def _nv12_layout_ok(h, w, out_h, out_w, method, out_elem_bytes):
    """VMEM-residency feasibility of the NV12 two-kernel pair, mirroring
    the exact allocations of :func:`fused_nv12_resize_rgb_pallas` (K1
    stripe blocks + row bands, K2 whole-frame f32 inputs + column bands +
    output block). Without this, large out sizes or 4-byte outputs fail
    at Mosaic compile time instead of falling back to XLA."""
    lanes = _lanes_for(w)
    if not lanes or out_h % 8 or h % 2:
        return False
    if method not in ("lanczos", "bilinear"):
        return False  # matches FusedPipeline._pallas_planes' method set
    hp = _round_up(h, 64)
    hp2 = hp // 2
    rm_np = np.zeros((out_h, hp), np.float32)
    rm_np[:, :h] = resize_matrix(h, out_h, method)
    rc_np = np.zeros((out_h, hp2), np.float32)
    rc_np[:, : h // 2] = (
        resize_matrix(h, out_h, method).reshape(out_h, h // 2, 2).sum(-1)
    )
    # mirror the KERNEL's tile choice (min MXU-pass cost, not min bytes —
    # a min-bytes gate could approve a shape whose cost-preferred tile
    # has ~2x wider windows and then fails at Mosaic compile time)
    best = None
    for cand_tile, align in _ROW_TILES:
        if out_h % cand_tile:
            continue
        ry = _row_windows(rm_np, hp, 512, align, cand_tile)
        rc = _row_windows(rc_np, hp2, 512, align, cand_tile)
        if ry is None or rc is None:
            continue
        t_cnt = out_h // cand_tile
        cost = _passes(t_cnt, ry[0]) + _passes(t_cnt, rc[0])
        cand = t_cnt * cand_tile * (ry[0] + rc[0]) * 2 * 2  # hi+lo bf16
        if best is None or cost < best[0]:
            best = (cost, cand)
    if best is not None:
        band_bytes = best[1]
    else:  # dense-matrix K1 fallback
        band_bytes = (out_h * hp + out_h * hp2) * 2 * 2
    k1_vmem = hp * lanes + hp2 * lanes + band_bytes + 2 * out_h * lanes * 4

    out_wp = _round_up(out_w, 128)
    cmat = resize_matrix(w, out_w, method)
    coll = cmat.reshape(out_w, w // 2, 2).sum(-1)
    cy_t = np.zeros((out_wp, w), np.float32)
    cy_t[:out_w] = cmat
    ce_t = np.zeros((out_wp, w), np.float32)
    ce_t[:out_w, 0::2] = coll
    co_t = np.zeros((out_wp, w), np.float32)
    co_t[:out_w, 1::2] = coll
    _, win_w = _col_windows((cy_t != 0) | (ce_t != 0) | (co_t != 0), w)
    n_tiles = out_wp // 128
    k2_vmem = (
        2 * out_h * w * 4
        + 6 * n_tiles * win_w * 128 * 2
        + 3 * out_h * out_wp * out_elem_bytes
    )
    return max(k1_vmem, k2_vmem) <= _VMEM_BUDGET


def fused_pallas_nv12_supported(h: int, w: int, out_h: int, out_w: int,
                                method: str = "lanczos",
                                out_elem_bytes: int = 1) -> bool:
    """Full gate for :func:`fused_nv12_resize_rgb_pallas`: lane/alignment
    rules AND the VMEM footprint of both kernels (the planar path's
    :func:`fused_pallas_planar_supported` analog)."""
    return _nv12_layout_ok(h, w, out_h, out_w, method, out_elem_bytes)


# ---- planar YUV420 front-end -----------------------------------------------
# The decode-pool hot path packs planar YUV420 (host pack = pure row
# memcpys). Interleaving u/v into NV12 layout for the kernel costs an XLA
# lane-relayout (~20 µs/frame at 1080p — measured, it erased the banded-K1
# win), so the planar pair keeps chroma planar end to end: K1 row-resizes
# y/u/v as whole-frame VMEM blocks (grid = batch), K2 column-resizes
# chroma on its half-resolution grid (half the chroma MACs of the
# interleaved variant) and applies the CSC.


def _k1p_plans(h, hp, hp2, out_h, method):
    """Row band plans on an out_h→out_hp zero-row-padded output grid (pad
    rows have empty support, so the padded tiles degenerate to zero
    bands — exact; the caller slices the pad rows off). Window widths are
    adaptive (smallest 64-multiple that fits — wide scale factors like
    2160→224 need >128), and the row-tile height is chosen from
    ``_ROW_TILES`` by estimated MXU pass count. Returns
    (tile, out_hp, rwin_y, plan_y, rwin_c, plan_c) or None."""
    rm_full = resize_matrix(h, out_h, method)
    rc_full = rm_full.reshape(out_h, h // 2, 2).sum(-1)
    best = None
    for tile, align in _ROW_TILES:
        out_hp = _round_up(out_h, tile)
        rm_np = np.zeros((out_hp, hp), np.float32)
        rm_np[:out_h, :h] = rm_full
        rc_np = np.zeros((out_hp, hp2), np.float32)
        rc_np[:out_h, : h // 2] = rc_full
        ry = _row_windows(rm_np, hp, 512, align, tile)
        rc = _row_windows(rc_np, hp2, 512, align, tile)
        if ry is None or rc is None:
            continue
        t_cnt = out_hp // tile
        cost = _passes(t_cnt, ry[0]) + 2 * _passes(t_cnt, rc[0])
        if best is None or cost < best[0]:
            best = (cost, tile, out_hp, ry[0], ry[1], rc[0], rc[1])
    return None if best is None else best[1:]


_VMEM_BUDGET = 14 * 1024 * 1024


@lru_cache(maxsize=256)
def _planar_layout(h, w, out_h, out_w, method, out_elem_bytes):
    """Full static layout for the planar pipeline, or None when the shape
    doesn't qualify. Picks ``mode="whole"`` (the single whole-frame
    kernel — row scratch never leaves VMEM) when every resident buffer of
    that kernel fits on-chip, else ``mode="two_pass"`` (striped banded
    row-resize kernels per plane with f32 intermediates in HBM, then one
    column+CSC kernel — how 4K-class frames run). The footprint check
    sums EVERY resident buffer at its real element size. Cached: pure
    function of shapes, consulted on every eager pipeline call."""
    if w % 128 or h % 2 or w < 256:
        return None
    if method not in ("lanczos", "bilinear", "nearest"):
        return None
    w2 = w // 2
    hp = _round_up(h, 64)
    hp2 = hp // 2
    out_wp = _round_up(out_w, 128)
    plans = _k1p_plans(h, hp, hp2, out_h, method)
    if plans is None:
        return None
    tile, out_hp, rwin_y, plan_y, rwin_c, plan_c = plans
    t_cnt = out_hp // tile
    n_tiles = out_wp // 128

    cmat = resize_matrix(w, out_w, method)               # (out_w, w)
    coll = cmat.reshape(out_w, w2, 2).sum(-1)            # (out_w, w/2)
    cy_t = np.zeros((out_wp, w), np.float32)
    cy_t[:out_w] = cmat
    cc_t = np.zeros((out_wp, w2), np.float32)
    cc_t[:out_w] = coll
    ystarts, ywin = _col_windows(cy_t != 0, w)
    cstarts, cwin = _col_windows(cc_t != 0, w2)

    base = dict(
        hp=hp, hp2=hp2, out_hp=out_hp, out_wp=out_wp, t_cnt=t_cnt,
        tile=tile, n_tiles=n_tiles, plan_y=plan_y, plan_c=plan_c,
        rwin_y=rwin_y, rwin_c=rwin_c,
        cy_t=cy_t, cc_t=cc_t, ystarts=ystarts, ywin=ywin,
        cstarts=cstarts, cwin=cwin,
    )
    row_bands = t_cnt * tile * (rwin_y + rwin_c) * 2 * 2
    col_bands = n_tiles * (ywin + cwin) * 128 * 2 * 2
    out_block = out_hp * out_wp * 3 * out_elem_bytes
    vmem_whole = (
        hp * w + 2 * hp2 * w2                     # u8 input blocks
        + 4 * out_hp * (w + 2 * w2)               # f32 row scratch
        + out_block + row_bands + col_bands       # (hi+lo bf16 bands)
    )
    if vmem_whole <= _VMEM_BUDGET:
        return dict(base, mode="whole")

    # two-pass: striped row kernels (u8 stripe in, f32 stripe out) + one
    # column+CSC kernel over whole-frame f32 row-resized planes
    lanes_y = _lanes_for(w)
    lanes_c = _lanes_for(w2)
    if not lanes_y or not lanes_c:
        return None
    k1_vmem = max(
        hp * lanes_y + 4 * out_hp * lanes_y
        + t_cnt * tile * rwin_y * 2 * 2,
        hp2 * lanes_c + 4 * out_hp * lanes_c
        + t_cnt * tile * rwin_c * 2 * 2,
    )
    k2_vmem = 4 * out_hp * (w + 2 * w2) + out_block + col_bands
    if max(k1_vmem, k2_vmem) > _VMEM_BUDGET:
        return None
    return dict(base, mode="two_pass", lanes_y=lanes_y, lanes_c=lanes_c)


def fused_pallas_planar_supported(h: int, w: int, out_h: int, out_w: int,
                                  method: str = "lanczos",
                                  out_elem_bytes: int = 1) -> bool:
    """Gate for :func:`fused_yuv420_resize_rgb_pallas`: banded row plans
    must fit and ALL resident VMEM buffers of the chosen variant (whole-
    frame single kernel, or the striped two-pass used for 4K-class
    frames) must fit on-chip. Any out_h/out_w (computed padded and
    sliced). Pass ``out_elem_bytes=4`` for rgb_f32/normalized outputs."""
    return _planar_layout(h, w, out_h, out_w, method, out_elem_bytes) \
        is not None


@partial(
    jax.jit,
    static_argnames=("out_h", "out_w", "space", "rng", "method", "swap",
                     "interpret", "output", "mean", "std"),
)
def fused_yuv420_resize_rgb_pallas(
    y: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    *,
    out_h: int,
    out_w: int,
    space: ColorSpace = ColorSpace.BT_709,
    rng: ColorRange = ColorRange.MPEG,
    method: str = "lanczos",
    swap: bool = False,
    interpret: bool = False,
    output: str = "rgb_u8",
    mean=(0.0, 0.0, 0.0),
    std=(1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """y (B,H,W) + u,v (B,H/2,W/2) u8 → (B, 3, out_h, out_w) planar.

    output: 'rgb_u8' (u8) | 'rgb_f32' ([0,1] f32) | 'normalized'
    ((x−mean)/std f32, positional per output channel — matches
    decode_postproc's post-swap convention).
    Gate with :func:`fused_pallas_planar_supported`.
    """
    if output not in ("rgb_u8", "rgb_f32", "normalized"):
        raise ValueError(f"unsupported output {output!r}")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = y.shape
    w2 = w // 2
    lay = _planar_layout(
        h, w, out_h, out_w, method, 1 if output == "rgb_u8" else 4
    )
    if lay is None:
        raise ValueError("shape doesn't fit the planar kernel (band "
                         "plans/VMEM); gate with "
                         "fused_pallas_planar_supported")
    hp, hp2 = lay["hp"], lay["hp2"]
    out_hp, out_wp = lay["out_hp"], lay["out_wp"]
    t_cnt, n_tiles = lay["t_cnt"], lay["n_tiles"]
    plan_y, plan_c = lay["plan_y"], lay["plan_c"]
    ystarts, ywin = lay["ystarts"], lay["ywin"]
    cstarts, cwin = lay["cstarts"], lay["cwin"]
    if hp != h:
        y = jnp.pad(y, ((0, 0), (0, hp - h), (0, 0)))
        u = jnp.pad(u, ((0, 0), (0, hp2 - h // 2), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, hp2 - h // 2), (0, 0)))

    byh, byl = map(jnp.asarray, _split_bf16_host(plan_y[1]))
    bch, bcl = map(jnp.asarray, _split_bf16_host(plan_c[1]))

    def tbands(mt, starts, win):
        bd = np.ascontiguousarray(
            np.swapaxes(_extract_bands(mt, starts, win, 128), 1, 2)
        )
        return [jnp.asarray(a) for a in _split_bf16_host(bd)]

    cyh, cyl = tbands(lay["cy_t"], ystarts, ywin)
    cch, ccl = tbands(lay["cc_t"], cstarts, cwin)

    def full(shape):
        n = len(shape)
        return pl.BlockSpec((1,) + shape,
                            lambda i, _n=n: (i,) + (0,) * _n,
                            memory_space=pltpu.VMEM)

    def const(shape):
        n = len(shape)
        return pl.BlockSpec(shape, lambda i, _n=n: (0,) * _n,
                            memory_space=pltpu.VMEM)

    out_dtype = jnp.uint8 if output == "rgb_u8" else jnp.float32
    rwin_y, rwin_c = lay["rwin_y"], lay["rwin_c"]

    if lay["mode"] == "whole":
        import os as _os

        # Measured-reject (r3): pre-splitting the row scratch to hi/lo
        # bf16 (skipping the column stage's per-window f32 split) timed
        # WITHIN NOISE of the f32-scratch kernel on v5e (57-61k fps both,
        # repeated slope runs) — the split VPU work is already hidden
        # behind the MXU passes by Mosaic pipelining. Kept selectable for
        # re-measurement on other TPU generations; bit-exact either way
        # (tests pin it).
        presplit = _os.environ.get("VPF_PALLAS_PRESPLIT", "0") != "0"
        if presplit:
            factory = _fused_planar_presplit_factory
            scratch = [
                pltpu.VMEM((out_hp, w), jnp.bfloat16),
                pltpu.VMEM((out_hp, w), jnp.bfloat16),
                pltpu.VMEM((out_hp, w2), jnp.bfloat16),
                pltpu.VMEM((out_hp, w2), jnp.bfloat16),
                pltpu.VMEM((out_hp, w2), jnp.bfloat16),
                pltpu.VMEM((out_hp, w2), jnp.bfloat16),
            ]
        else:
            factory = _fused_planar_factory
            scratch = [
                pltpu.VMEM((out_hp, w), jnp.float32),
                pltpu.VMEM((out_hp, w2), jnp.float32),
                pltpu.VMEM((out_hp, w2), jnp.float32),
            ]
        fused = pl.pallas_call(
            factory(
                ColorSpace(space), ColorRange(rng), swap,
                plan_y[0], plan_c[0], rwin_y, rwin_c, t_cnt,
                ystarts, ywin, cstarts, cwin, n_tiles,
                output=output, mean=mean, std=std, tile=lay["tile"],
            ),
            grid=(b,),
            in_specs=[
                full((hp, w)), full((hp2, w2)), full((hp2, w2)),
                const((t_cnt, lay["tile"], rwin_y)),
                const((t_cnt, lay["tile"], rwin_y)),
                const((t_cnt, lay["tile"], rwin_c)),
                const((t_cnt, lay["tile"], rwin_c)),
                const((n_tiles, ywin, 128)), const((n_tiles, ywin, 128)),
                const((n_tiles, cwin, 128)), const((n_tiles, cwin, 128)),
            ],
            out_specs=full((3, out_hp, out_wp)),
            out_shape=jax.ShapeDtypeStruct((b, 3, out_hp, out_wp), out_dtype),
            scratch_shapes=scratch,
            interpret=interpret,
        )
        out = fused(y, u, v, byh, byl, bch, bcl, cyh, cyl, cch, ccl)
        return out[..., :out_h, :out_w]

    # two-pass (4K-class): striped banded row-resize per plane (f32
    # intermediates via HBM — ~8 MB/frame at 2160p→224, small next to the
    # 12 MB u8 input), then one column+CSC kernel per frame
    lanes_y, lanes_c = lay["lanes_y"], lay["lanes_c"]

    def striped(plane, hin, lanes, plan, rwin, bh, bl):
        const2 = lambda shape: pl.BlockSpec(  # noqa: E731 (2-D grid)
            shape, lambda i, j, _n=len(shape): (0,) * _n,
            memory_space=pltpu.VMEM,
        )
        k1 = pl.pallas_call(
            _k1p_striped_factory(plan[0], rwin, t_cnt, tile=lay["tile"]),
            grid=(b, plane.shape[-1] // lanes),
            in_specs=[
                pl.BlockSpec((1, hin, lanes), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM),
                const2((t_cnt, lay["tile"], rwin)),
                const2((t_cnt, lay["tile"], rwin)),
            ],
            out_specs=pl.BlockSpec((1, out_hp, lanes),
                                   lambda i, j: (i, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (b, out_hp, plane.shape[-1]), jnp.float32
            ),
            interpret=interpret,
        )
        return k1(plane, bh, bl)

    y1 = striped(y, hp, lanes_y, plan_y, rwin_y, byh, byl)
    u1 = striped(u, hp2, lanes_c, plan_c, rwin_c, bch, bcl)
    v1 = striped(v, hp2, lanes_c, plan_c, rwin_c, bch, bcl)
    k2 = pl.pallas_call(
        _k2p_factory(
            ColorSpace(space), ColorRange(rng), swap,
            ystarts, ywin, cstarts, cwin, n_tiles,
            output=output, mean=mean, std=std,
        ),
        grid=(b,),
        in_specs=[
            full((out_hp, w)), full((out_hp, w2)), full((out_hp, w2)),
            const((n_tiles, ywin, 128)), const((n_tiles, ywin, 128)),
            const((n_tiles, cwin, 128)), const((n_tiles, cwin, 128)),
        ],
        out_specs=full((3, out_hp, out_wp)),
        out_shape=jax.ShapeDtypeStruct((b, 3, out_hp, out_wp), out_dtype),
        interpret=interpret,
    )
    out = k2(y1, u1, v1, cyh, cyl, cch, ccl)
    return out[..., :out_h, :out_w]
