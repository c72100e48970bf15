#!/usr/bin/env python
"""Experiment: banded/polyphase resize vs the dense-matmul resize.

The Lanczos resize matrices are 6-tap banded (99.4% zeros at 1080->224),
so the dense MXU matmuls in decode_postproc waste ~100x MACs. When the
scale factor is rational with a small denominator d (1080/224 -> d=28),
the banded matrix is polyphase: output rows o and o+d use identical
weights on inputs shifted by a constant stride. That turns the resize
into d unrolled (strided-slice x 6 weighted adds) VPU chains - no
gathers, no big intermediates.

Run on the TPU: python tools/exp_banded.py
"""
from __future__ import annotations

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from videoprocessingframework_tpu.core.enums import (
    ColorRange, ColorSpace, PixelFormat,
)
from videoprocessingframework_tpu.ops import fused as fz
from videoprocessingframework_tpu.ops.resize import resize_matrix
from videoprocessingframework_tpu.ops.fused import (
    _csc_to_rgb_f32, _round_u8, _chroma_collapse,
)
from bench import device_slope_fps


# ---------------------------------------------------------------- plan --

def _lanczos64(x, a=3):
    x = np.abs(x)
    return np.where(x < a, np.sinc(x) * np.sinc(x / a), 0.0)


def polyphase_plan(n_in, n_out, method="lanczos", half=False):
    """Polyphase decomposition of resize_matrix(n_in, n_out[, collapsed]).

    Returns None when no small-period decomposition exists.
    Weights are computed unclipped in float64 (identical to the dense
    matrix away from edges); edge behaviour is reproduced exactly by
    edge-replicate padding of the input.
    """
    if method == "nearest":
        a, K = 0, 1
    elif method == "bilinear":
        a, K = 1, 2
    elif method == "lanczos":
        a, K = 3, 6
    else:
        return None
    scale = n_in / n_out
    o = np.arange(n_out)
    src = (o + 0.5) * scale - 0.5
    if method == "nearest":
        starts = np.floor(src + 0.5).astype(np.int64)
        w = np.ones((n_out, 1))
    else:
        base = np.floor(src).astype(np.int64)
        starts = base - a + 1
        taps = starts[:, None] + np.arange(K)[None, :]
        rel = src[:, None] - taps
        w = _lanczos64(rel, a) if method == "lanczos" else np.maximum(
            0.0, 1.0 - np.abs(rel))
        w = w / w.sum(1, keepdims=True)
    grid_n = n_in
    if half:
        # fold the 2x replicate-upsample into the weights: full tap i maps
        # to half cell floor(i/2) (edge padding keeps negatives consistent)
        grid_n = n_in // 2
        Kh = K // 2 + 1
        sh = np.floor_divide(starts, 2)
        wh = np.zeros((n_out, Kh))
        for k in range(K):
            j = np.floor_divide(starts + k, 2) - sh
            np.add.at(wh, (o, j), w[:, k])
        starts, w, K = sh, wh, Kh

    # find the smallest period d dividing n_out with consistent stride
    for d in [x for x in range(1, n_out + 1) if n_out % x == 0]:
        reps = n_out // d
        st = starts.reshape(reps, d)
        ww = w.reshape(reps, d, K)
        if reps == 1:
            stride = 0
        else:
            diffs = st[1:] - st[:-1]
            if not (diffs == diffs[0, 0]).all():
                continue
            if not np.allclose(ww, ww[0], rtol=0, atol=1e-12):
                continue
            stride = int(diffs[0, 0])
        if d * K > 512:   # unrolled-slice budget
            return None
        pad_top = max(0, -int(starts.min()))
        pad_bot = max(0, int(starts.max()) + K - grid_n)
        return dict(
            d=d, K=K, reps=reps, stride=max(stride, 1),
            starts=st[0].astype(int), w=ww[0],
            pad_top=pad_top, pad_bot=pad_bot, grid_n=grid_n,
        )
    return None


def resize_axis_polyphase(x, plan, axis, dtype=jnp.float32):
    ax = axis if axis >= 0 else x.ndim + axis
    pads = [(0, 0)] * x.ndim
    pads[ax] = (plan["pad_top"], plan["pad_bot"])
    xp = x
    if plan["pad_top"] or plan["pad_bot"]:
        xp = jnp.pad(x, pads, mode="edge")
    xp = xp.astype(dtype)
    d, K, reps, stride = plan["d"], plan["K"], plan["reps"], plan["stride"]
    outs = []
    for p in range(d):
        acc = None
        s0 = int(plan["starts"][p]) + plan["pad_top"]
        for k in range(K):
            wpk = float(plan["w"][p, k])
            if wpk == 0.0:
                continue
            limit = s0 + k + stride * (reps - 1) + 1
            sl = jax.lax.slice_in_dim(xp, s0 + k, limit, stride=stride,
                                      axis=ax)
            term = wpk * sl
            acc = term if acc is None else acc + term
        outs.append(acc)
    out = jnp.stack(outs, axis=ax + 1)            # (..., reps, d, ...)
    shp = list(out.shape)
    return out.reshape(shp[:ax] + [reps * d] + shp[ax + 2:])


# ------------------------------------------------------------ variants --

H, W, OH, OW = 1080, 1920, 224, 224
SPACE, RNG = ColorSpace.BT_709, ColorRange.MPEG


def split_packed(packed):
    h = packed.shape[-2] * 2 // 3
    w = packed.shape[-1]
    lead = packed.shape[:-2]
    c = packed[..., h:, :]
    y = packed[..., :h, :]
    u = c[..., : h // 4, :].reshape(*lead, h // 2, w // 2)
    v = c[..., h // 4:, :].reshape(*lead, h // 2, w // 2)
    return y, u, v


def make_variant(row_mode, col_mode):
    rp_y = polyphase_plan(H, OH)
    cp_y = polyphase_plan(W, OW)
    rp_c = polyphase_plan(H, OH, half=True)
    cp_c = polyphase_plan(W, OW, half=True)
    rmat = jnp.asarray(resize_matrix(H, OH))
    cmat = jnp.asarray(resize_matrix(W, OW))
    rmat_c, cmat_c = _chroma_collapse(rmat), _chroma_collapse(cmat)

    def resize2d(x, rp, cp, rm, cm):
        if row_mode == "poly":
            t = resize_axis_polyphase(x, rp, axis=-2)
        else:
            t = jnp.einsum("oh,nhw->now", rm, x.astype(jnp.float32),
                           precision="highest")
        if col_mode == "poly":
            return resize_axis_polyphase(t, cp, axis=-1)
        return jnp.einsum("pw,nhw->nhp", cm, t, precision="highest")

    @jax.jit
    def fn(packed):
        y, u, v = split_packed(packed)
        y = resize2d(y, rp_y, cp_y, rmat, cmat)
        u = resize2d(u, rp_c, cp_c, rmat_c, cmat_c)
        v = resize2d(v, rp_c, cp_c, rmat_c, cmat_c)
        rgb = _csc_to_rgb_f32(y, u, v, SPACE, RNG)
        return _round_u8(rgb)

    return fn


def main():
    print("backend:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    packed = rng.integers(0, 256, (batch, H * 3 // 2, W), dtype=np.uint8)

    dense = make_variant("dense", "dense")
    ref = np.asarray(jax.block_until_ready(dense(packed)))

    variants = {
        "dense_dense": dense,
        "poly_dense": make_variant("poly", "dense"),
        "poly_poly": make_variant("poly", "poly"),
        "dense_poly": make_variant("dense", "poly"),
    }
    for name, fn in variants.items():
        out = np.asarray(jax.block_until_ready(fn(packed)))
        diff = np.abs(out.astype(int) - ref.astype(int)).max()
        fps, gbs = device_slope_fps(fn, packed)
        print(f"{name:12s} maxdiff_u8={diff:2d}  {fps:9.1f} fps  "
              f"{1e6 * batch / fps:7.2f} us/frame  in={gbs:.2f} GB/s")


if __name__ == "__main__":
    main()


# ---------------------------------------------------- split-bf16 dense --

def _split_bf16(m):
    hi = m.astype(jnp.bfloat16)
    lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def make_splitbf16(col_mode="split"):
    rmat = jnp.asarray(resize_matrix(H, OH))
    cmat = jnp.asarray(resize_matrix(W, OW))
    rmat_c, cmat_c = _chroma_collapse(rmat), _chroma_collapse(cmat)

    def rows_split(x_u8, rm):
        # u8 is exact in bf16: only the matrix needs hi+lo
        hi, lo = _split_bf16(rm)
        xb = x_u8.astype(jnp.bfloat16)
        t = jnp.einsum("oh,nhw->now", hi, xb,
                       preferred_element_type=jnp.float32)
        t += jnp.einsum("oh,nhw->now", lo, xb,
                        preferred_element_type=jnp.float32)
        return t

    def cols_split(t_f32, cm):
        # t is f32: split both operands, drop lo*lo (3 passes)
        mhi, mlo = _split_bf16(cm)
        thi = t_f32.astype(jnp.bfloat16)
        tlo = (t_f32 - thi.astype(jnp.float32)).astype(jnp.bfloat16)
        y = jnp.einsum("pw,nhw->nhp", mhi, thi,
                       preferred_element_type=jnp.float32)
        y += jnp.einsum("pw,nhw->nhp", mhi, tlo,
                        preferred_element_type=jnp.float32)
        y += jnp.einsum("pw,nhw->nhp", mlo, thi,
                        preferred_element_type=jnp.float32)
        return y

    def resize2d(x, rm, cm):
        t = rows_split(x, rm)
        if col_mode == "split":
            return cols_split(t, cm)
        return jnp.einsum("pw,nhw->nhp", cm, t, precision="highest")

    @jax.jit
    def fn(packed):
        y, u, v = split_packed(packed)
        y = resize2d(y, rmat, cmat)
        u = resize2d(u, rmat_c, cmat_c)
        v = resize2d(v, rmat_c, cmat_c)
        rgb = _csc_to_rgb_f32(y, u, v, SPACE, RNG)
        return _round_u8(rgb)

    return fn


def main2():
    print("backend:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    packed = rng.integers(0, 256, (batch, H * 3 // 2, W), dtype=np.uint8)
    dense = make_variant("dense", "dense")
    ref = np.asarray(jax.block_until_ready(dense(packed)))
    variants = {
        "dense_hi": dense,
        "split_split": make_splitbf16("split"),
        "split_hi": make_splitbf16("highest"),
    }
    for name, fn in variants.items():
        out = np.asarray(jax.block_until_ready(fn(packed)))
        diff = np.abs(out.astype(int) - ref.astype(int)).max()
        fps, gbs = device_slope_fps(fn, packed)
        print(f"{name:12s} maxdiff_u8={diff:2d}  {fps:9.1f} fps  "
              f"{1e6 * batch / fps:7.2f} us/batch  in={gbs:.2f} GB/s")
