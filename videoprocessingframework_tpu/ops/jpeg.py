"""JPEG decode as MXU matmuls: dequant + IDCT + reassembly on device.

The device half of the TPU-offloaded MJPEG decoder (host entropy decode:
io/native/jpeg.cpp; reference decodes MJPEG on the GPU's dedicated engine,
src/TC/inc/FFmpegDemuxer.h:261 → cudaVideoCodec_JPEG). The key
observation: for a coefficient block ``c`` (64 int16, zigzag order),
dequantization and the 2-D inverse DCT are together ONE linear map, so

    pixels[block] = c @ B,   B[k, p] = Q[k] · f(p_y, v_k) · f(p_x, u_k)

where ``B`` folds the quant table, the zigzag permutation, and the
separable IDCT cosine basis into a single constant 64×64 matrix. A whole
batch of frames decodes as one [N·blocks, 64] × [64, 64] matmul on the
MXU, followed by a free reshape/transpose reassembly into planes. The
fused resize+CSC pipeline (ops/fused.py:decode_postproc) then runs in the
same XLA program — coefficients in, model-ready RGB out, one dispatch.

Quant tables ride as ordinary (64, 64) f32 *inputs*, so per-frame table
changes (legal in MJPEG) never recompile.

Fidelity: ≤1 u8 ULP vs the float64 golden (`golden_decode`); vs libav's
full software decode the luma differs by ≤1 (its integer IDCT vs the
spec's real-valued IDCT), chroma is typically exact.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.enums import ColorRange, ColorSpace, PixelFormat
from .fused import decode_postproc

__all__ = [
    "ZIGZAG",
    "dequant_idct_basis",
    "fdct_quant_basis",
    "std_quant_tables",
    "JpegDevicePipeline",
    "JpegDeviceEncoder",
    "JpegDeviceTranscoder",
    "golden_decode",
    "golden_encode",
]

# zigzag scan order: ZIGZAG[k] = row-major frequency index (v*8+u) of the
# k-th coefficient in the bitstream (ITU T.81 Figure A.6)
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)


def _idct_1d_basis() -> np.ndarray:
    """f[x, u] = c(u)/2 · cos((2x+1)uπ/16) — the 8-point IDCT basis."""
    x = np.arange(8, dtype=np.float64)[:, None]
    u = np.arange(8, dtype=np.float64)[None, :]
    f = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16.0)
    f[:, 0] *= 1.0 / np.sqrt(2.0)
    return f


def dequant_idct_basis(qt: np.ndarray, dtype=np.float64) -> np.ndarray:
    """(64, 64) matrix mapping a zigzag coefficient block to its 64
    row-major pixels, with the quant table (zigzag order) folded in:
    ``pixels = coeffs @ B + 128``."""
    qt = np.asarray(qt, np.float64).reshape(64)
    f = _idct_1d_basis()
    v, u = ZIGZAG // 8, ZIGZAG % 8
    # B[k, py*8+px] = Q[k] * f[py, v_k] * f[px, u_k]
    b = f[:, v][:, None, :] * f[:, u][None, :, :]  # (py, px, k)
    return np.ascontiguousarray(
        (b.reshape(64, 64).T * qt[:, None]).astype(dtype)
    )


def fdct_quant_basis(qt: np.ndarray, dtype=np.float64) -> np.ndarray:
    """(64, 64) forward matrix: ``coeffs_zigzag = rint((pix - 128) @ A)``
    for a row-major 64-pixel block, with quantization by ``qt`` (zigzag
    order) folded in. Exact inverse pairing with
    :func:`dequant_idct_basis`: at qt == 1 the two are orthogonal
    transposes (A @ B == I)."""
    qt = np.asarray(qt, np.float64).reshape(64)
    f = _idct_1d_basis()
    v, u = ZIGZAG // 8, ZIGZAG % 8
    b = f[:, v][:, None, :] * f[:, u][None, :, :]  # (py, px, k)
    return np.ascontiguousarray(
        (b.reshape(64, 64) / qt[None, :]).astype(dtype)
    )


# ITU T.81 Annex K "typical" quantization tables (K.1/K.2), natural
# row-major order.
_STD_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_STD_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)


def std_quant_tables(quality: int = 90) -> tuple[np.ndarray, np.ndarray]:
    """(luma, chroma) quant tables in ZIGZAG order for an IJG-style
    quality factor 1..100 (Annex K tables, libjpeg scaling)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_STD_QT_LUMA, _STD_QT_CHROMA):
        t = np.clip((base * scale + 50) // 100, 1, 255)
        out.append(t[ZIGZAG].astype(np.uint16))
    return out[0], out[1]


def _norm_sampling(s) -> str:
    """Accept the legacy bool (True=4:2:0, False=4:4:4) or an explicit
    '420' / '422' / '444' / 'gray' string."""
    if s is True:
        return "420"
    if s is False:
        return "444"
    s = str(s)
    if s not in ("420", "422", "444", "gray"):
        raise ValueError(f"unsupported chroma sampling {s!r}")
    return s


def _chroma_dims(h: int, w: int, sampling: str) -> tuple[int, int]:
    if sampling == "420":
        return (h + 1) // 2, (w + 1) // 2
    if sampling == "422":
        return h, (w + 1) // 2
    return h, w


def _src_format(sampling: str) -> PixelFormat:
    return {
        "420": PixelFormat.YUV420,
        "422": PixelFormat.YUV422,
        "444": PixelFormat.YUV444,
        "gray": PixelFormat.Y,
    }[sampling]


def _assemble(pix, bh: int, bw: int, h: int, w: int):
    """[..., bh*bw, 64] block pixels → [..., h, w] plane (crop the MCU
    padding)."""
    lead = pix.shape[:-2]
    p = pix.reshape(*lead, bh, bw, 8, 8)
    p = jnp.swapaxes(p, -3, -2)  # (..., bh, 8, bw, 8)
    return p.reshape(*lead, bh * 8, bw * 8)[..., :h, :w]


@partial(
    jax.jit,
    static_argnames=(
        "geometry", "out_h", "out_w", "method", "output", "compute",
    ),
)
def jpeg_decode_fused(
    cy, cu, cv, by, bu, bv, *,
    geometry,
    out_h: int,
    out_w: int,
    method: str = "lanczos",
    output: str = "rgb_u8",
    compute: str = "auto",
):
    """Coefficients → model-ready output in ONE program.

    cy/cu/cv: int16 [N, nblocks, 64] zigzag coefficient batches.
    by/bu/bv: (64, 64) f32 dequant+IDCT bases (per-component quant).
    geometry: ((bh_y, bw_y), (bh_c, bw_c), (H, W), sampling) — static;
    sampling is '420' / '422' / '444' (legacy bool accepted at the
    class layer). JPEG is full-range BT.601 by convention (the
    reference converts yuvj* the same way: TasksColorCvt.cpp JPEG-range
    paths).
    """
    (bhy, bwy), (bhc, bwc), (h, w), sampling = geometry
    # _plane_from_coeffs rounds to the u8 the pixel-domain decoder would
    # emit — keeps the downstream resize+CSC semantics identical to the
    # libav path (and lets its split-bf16 integer fast path apply)
    ch, cw = _chroma_dims(h, w, sampling)
    src = _src_format(sampling)
    y = _plane_from_coeffs(cy, by, bhy, bwy, h, w)
    u = _plane_from_coeffs(cu, bu, bhc, bwc, ch, cw)
    v = _plane_from_coeffs(cv, bv, bhc, bwc, ch, cw)
    return decode_postproc(
        y, u, v,
        src_format=src,
        space=ColorSpace.BT_601,
        rng=ColorRange.JPEG,
        out_h=out_h,
        out_w=out_w,
        method=method,
        output=output,
        compute=compute,
    )


@partial(
    jax.jit,
    static_argnames=(
        "geometry", "out_h", "out_w", "method", "output", "spec",
        "clip_len",
    ),
)
def jpeg_decode_augment(
    cy, cu, cv, by, bu, bv, ctr, *,
    geometry, out_h, out_w, method, output, spec, clip_len,
):
    """Coefficients → AUGMENTED model-ready output in ONE program:
    dequant+IDCT matmuls feeding the device-fused crop/flip/jitter
    postproc (ops/augment.py) — the split-MJPEG training path with
    augmentation never leaves the program."""
    from .augment import augment_postproc

    (bhy, bwy), (bhc, bwc), (h, w), sampling = geometry
    ch, cw = _chroma_dims(h, w, sampling)
    y = _plane_from_coeffs(cy, by, bhy, bwy, h, w)
    u = _plane_from_coeffs(cu, bu, bhc, bwc, ch, cw)
    v = _plane_from_coeffs(cv, bv, bhc, bwc, ch, cw)
    return augment_postproc(
        y, u, v, ctr,
        src_format=_src_format(sampling),
        space=ColorSpace.BT_601,
        rng=ColorRange.JPEG,
        out_h=out_h, out_w=out_w, method=method, output=output,
        spec=spec, clip_len=clip_len,
    )


@partial(
    jax.jit,
    static_argnames=(
        "geometry", "out_h", "out_w", "method", "output", "spec",
        "clip_len",
    ),
)
def _jpeg_decode_augment_gray(
    cy, by, ctr, *, geometry, out_h, out_w, method, output, spec, clip_len,
):
    from .augment import augment_postproc

    (bhy, bwy), _, (h, w), _ = geometry
    y = _plane_from_coeffs(cy, by, bhy, bwy, h, w)
    return augment_postproc(
        y, ctr,
        src_format=PixelFormat.Y,
        space=ColorSpace.BT_601,
        rng=ColorRange.JPEG,
        out_h=out_h, out_w=out_w, method=method, output=output,
        spec=spec, clip_len=clip_len,
    )


class JpegDevicePipeline:
    """Configured coefficients→RGB pipeline for one stream geometry.

    Built from a probe (`io.jpeg.JpegCoefDecoder.info` or the ctypes
    VpfJpegInfo): captures block grids and quant tables; call with int16
    coefficient batches [N, nblocks, 64] (zigzag) per component.

    output='planes' returns the decoded u8 (y, u, v) planes — the exact
    analog of the libav decoder's YUV420 output — while the rgb_*/
    normalized modes run the fused resize+CSC in the same program.

    ``augment``: an :class:`~videoprocessingframework_tpu.ops.augment.
    AugmentSpec` fuses crop/flip/jitter into the same program (fused
    output modes only); pass ``clip_len``/``seed`` and call with
    ``epoch=``/``batch_index=`` for deterministic per-clip params.
    """

    def __init__(
        self,
        info,
        out_size=None,
        method: str = "lanczos",
        output: str = "rgb_u8",
        compute: str = "auto",
        augment=None,
        clip_len: int = 1,
        seed: int = 0,
    ):
        if augment is not None:
            # same clear TypeError as VideoClipLoader (loader.py): a
            # wrong type (e.g. a dict) would otherwise fail opaquely as
            # an unhashable jit-static argument inside jpeg_decode_augment
            from .augment import AugmentSpec

            if not isinstance(augment, AugmentSpec):
                raise TypeError(
                    f"augment must be an AugmentSpec, got {type(augment)!r}"
                )
        if augment is not None and output == "planes":
            raise ValueError(
                "augment= needs a fused output mode, not 'planes'"
            )
        if augment is not None and compute == "split_bf16":
            # the augmented path's per-clip matrices run at
            # precision-highest; don't silently ignore an explicit
            # split-bf16 request
            raise ValueError(
                "compute='split_bf16' is not available with augment="
            )
        self.augment = augment
        self.clip_len = int(clip_len)
        self.seed = int(seed) & 0xFFFFFFFF
        if info.ncomp not in (1, 3):
            raise ValueError(
                f"device JPEG path needs 1 or 3 components, got {info.ncomp}"
            )
        if info.ncomp == 1:
            if (info.hs[0], info.vs[0]) != (1, 1):
                raise ValueError("grayscale JPEG with sampling != 1x1")
            sampling = "gray"
        else:
            hs = [info.hs[c] for c in range(3)]
            vs = [info.vs[c] for c in range(3)]
            if (hs[1], vs[1]) != (1, 1) or (hs[2], vs[2]) != (1, 1):
                raise ValueError(f"unsupported chroma sampling {hs}x{vs}")
            if (hs[0], vs[0]) == (2, 2):
                sampling = "420"
            elif (hs[0], vs[0]) == (2, 1):
                sampling = "422"
            elif (hs[0], vs[0]) == (1, 1):
                sampling = "444"
            else:
                raise ValueError(
                    f"unsupported luma sampling {hs[0]}x{vs[0]}"
                )
        self.height, self.width = int(info.height), int(info.width)
        if sampling == "420" and (self.height % 2 or self.width % 2):
            raise ValueError(
                "odd-dimension 4:2:0 JPEG unsupported on the device path"
            )
        if sampling == "422" and self.width % 2:
            raise ValueError(
                "odd-width 4:2:2 JPEG unsupported on the device path"
            )
        self.sampling = sampling
        self.ncomp = 1 if sampling == "gray" else 3
        chroma_grid = (0, 0) if sampling == "gray" else (
            int(info.bh[1]), int(info.bw[1])
        )
        self.geometry = (
            (int(info.bh[0]), int(info.bw[0])),
            chroma_grid,
            (self.height, self.width),
            sampling,
        )
        self.out_h, self.out_w = out_size or (self.height, self.width)
        self.method, self.output, self.compute = method, output, compute
        self.set_quant_tables(info)

    def set_quant_tables(self, info) -> None:
        """(Re)build the dequant+IDCT bases — cheap, no recompile.
        Accepts the ctypes probe struct or any info-like with indexable
        per-component ``qt`` (e.g. a snapshot)."""
        self._bases = tuple(
            jnp.asarray(
                dequant_idct_basis(
                    np.asarray(info.qt[c][:64], np.uint16), np.float32
                )
            )
            for c in range(self.ncomp)
        )
        self._qt = tuple(
            np.array(info.qt[c][:64], np.uint16) for c in range(self.ncomp)
        )

    def quant_changed(self, info) -> bool:
        return any(
            not np.array_equal(np.array(info.qt[c][:64], np.uint16),
                               self._qt[c])
            for c in range(self.ncomp)
        )

    def __call__(self, *coeffs, epoch: int = 0, batch_index: int = 0):
        if len(coeffs) != self.ncomp:
            raise ValueError(
                f"expected {self.ncomp} coefficient batches, "
                f"got {len(coeffs)}"
            )
        if self.augment is not None:
            ctr = np.asarray(
                [self.seed, epoch & 0xFFFFFFFF, batch_index & 0xFFFFFFFF],
                np.uint32,
            )
            kw = dict(
                geometry=self.geometry, out_h=self.out_h,
                out_w=self.out_w, method=self.method, output=self.output,
                spec=self.augment, clip_len=self.clip_len,
            )
            if self.sampling == "gray":
                return _jpeg_decode_augment_gray(
                    coeffs[0], self._bases[0], ctr, **kw
                )
            return jpeg_decode_augment(*coeffs, *self._bases, ctr, **kw)
        if self.sampling == "gray":
            if self.output == "planes":
                return _jpeg_planes_gray(
                    coeffs[0], self._bases[0], geometry=self.geometry
                )
            return _jpeg_decode_fused_gray(
                coeffs[0], self._bases[0],
                geometry=self.geometry,
                out_h=self.out_h,
                out_w=self.out_w,
                method=self.method,
                output=self.output,
                compute=self.compute,
            )
        if self.output == "planes":
            return _jpeg_planes(
                *coeffs, *self._bases, geometry=self.geometry
            )
        return jpeg_decode_fused(
            *coeffs, *self._bases,
            geometry=self.geometry,
            out_h=self.out_h,
            out_w=self.out_w,
            method=self.method,
            output=self.output,
            compute=self.compute,
        )


def _plane_from_coeffs(c, b, bh, bw, ph, pw):
    """Shared inverse half: coeffs → clipped/rounded u8 plane."""
    pix = jnp.einsum(
        "nbk,kp->nbp", c.astype(jnp.float32), b, precision="highest"
    ) + 128.0
    return jnp.rint(jnp.clip(_assemble(pix, bh, bw, ph, pw), 0, 255)
                    ).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("geometry",))
def _jpeg_planes_gray(cy, by, *, geometry):
    (bhy, bwy), _, (h, w), _ = geometry
    return (_plane_from_coeffs(cy, by, bhy, bwy, h, w),)


@partial(
    jax.jit,
    static_argnames=(
        "geometry", "out_h", "out_w", "method", "output", "compute",
    ),
)
def _jpeg_decode_fused_gray(
    cy, by, *, geometry, out_h, out_w, method, output, compute,
):
    (bhy, bwy), _, (h, w), _ = geometry
    y = _plane_from_coeffs(cy, by, bhy, bwy, h, w)
    return decode_postproc(
        y,
        src_format=PixelFormat.Y,
        space=ColorSpace.BT_601,
        rng=ColorRange.JPEG,
        out_h=out_h,
        out_w=out_w,
        method=method,
        output=output,
        compute=compute,
    )


@partial(jax.jit, static_argnames=("geometry",))
def _jpeg_planes(cy, cu, cv, by, bu, bv, *, geometry):
    (bhy, bwy), (bhc, bwc), (h, w), sampling = geometry
    ch, cw = _chroma_dims(h, w, sampling)
    return (
        _plane_from_coeffs(cy, by, bhy, bwy, h, w),
        _plane_from_coeffs(cu, bu, bhc, bwc, ch, cw),
        _plane_from_coeffs(cv, bv, bhc, bwc, ch, cw),
    )


def _blockify(p, bh: int, bw: int):
    """[..., ph, pw] plane → [..., bh*bw, 64] row-major pixel blocks,
    edge-replicating into the MCU padding (the standard encoder-side
    fill; keeps padded-block coefficients small)."""
    lead = p.shape[:-2]
    ph, pw = p.shape[-2], p.shape[-1]
    pad = [(0, 0)] * len(lead) + [(0, bh * 8 - ph), (0, bw * 8 - pw)]
    p = jnp.pad(p, pad, mode="edge")
    p = p.reshape(*lead, bh, 8, bw, 8)
    p = jnp.swapaxes(p, -3, -2)  # (..., bh, bw, 8, 8)
    return p.reshape(*lead, bh * bw, 64)


def _coeffs_from_plane(p, a, bh, bw):
    """Shared forward half: u8 plane → int16 zigzag coefficients (level
    shift + fDCT + quant as one MXU matmul)."""
    blk = _blockify(p, bh, bw).astype(jnp.float32) - 128.0
    c = jnp.einsum("nbp,pk->nbk", blk, a, precision="highest")
    return jnp.clip(jnp.rint(c), -2047, 2047).astype(jnp.int16)


@partial(jax.jit, static_argnames=("geometry",))
def _jpeg_coeffs(y, u, v, ay, au, av, *, geometry):
    """u8 (y, u, v) planes → int16 zigzag coefficient batches.

    The device half of the split MJPEG encoder: level shift + forward
    DCT + quantization as one [N·blocks, 64] × [64, 64] MXU matmul per
    component (basis from :func:`fdct_quant_basis`)."""
    (bhy, bwy), (bhc, bwc), (_h, _w), _sub = geometry
    return (
        _coeffs_from_plane(y, ay, bhy, bwy),
        _coeffs_from_plane(u, au, bhc, bwc),
        _coeffs_from_plane(v, av, bhc, bwc),
    )


@partial(jax.jit, static_argnames=("geometry",))
def _jpeg_coeffs_gray(y, ay, *, geometry):
    (bhy, bwy), _, (_h, _w), _sub = geometry
    return (_coeffs_from_plane(y, ay, bhy, bwy),)


def encode_geometry(h: int, w: int, sampling):
    """Block-grid geometry for the forward path — identical MCU padding
    rules to the entropy coder (io/native/jpeg.cpp finish_geometry).
    ``sampling``: '420' / '422' / '444' (or the legacy bool)."""
    sampling = _norm_sampling(sampling)
    sx = 2 if sampling in ("420", "422") else 1
    sy = 2 if sampling == "420" else 1
    mcux = (w + 8 * sx - 1) // (8 * sx)
    mcuy = (h + 8 * sy - 1) // (8 * sy)
    chroma = (0, 0) if sampling == "gray" else (mcuy, mcux)
    return ((mcuy * sy, mcux * sx), chroma, (h, w), sampling)


class JpegDeviceEncoder:
    """Batched frames → quantized DCT coefficients on device.

    The mirror of :class:`JpegDevicePipeline`: everything up to the
    coefficients (optional resize, RGB→YCbCr full-range BT.601, 2×2
    chroma fold, level shift, forward DCT, quantization) runs as MXU
    matmuls in one XLA program; the serial entropy (Huffman) coding —
    the only part that cannot vectorize — runs on the host
    (`io.jpeg.JpegCoefEncoder` over io/native/jpeg.cpp
    vpf_jpeg_encode). Reference analog: the NVENC bitstream engine fed
    from device memory (src/TC/src/NvEncoder.cpp:360-425).

    ``encode_rgb`` takes (N, H, W, 3) u8 RGB (any source size — the
    fused `encode_feed` resize runs in the same program); ``encode_planes``
    takes ready (y, u, v) u8 planes at the target geometry.
    """

    def __init__(
        self,
        height: int,
        width: int,
        quality: int = 90,
        subsampled=True,
        quant_tables=None,
        method: str = "lanczos",
    ):
        sampling = _norm_sampling(subsampled)
        if sampling == "420" and (height % 2 or width % 2):
            raise ValueError("4:2:0 JPEG target size must be even")
        if sampling == "422" and width % 2:
            raise ValueError("4:2:2 JPEG target width must be even")
        self.height, self.width = int(height), int(width)
        self.sampling = sampling
        self.subsampled = sampling == "420"  # legacy flag
        self.ncomp = 1 if sampling == "gray" else 3
        self.method = method
        self.geometry = encode_geometry(self.height, self.width, sampling)
        if quant_tables is None:
            quant_tables = std_quant_tables(quality)
        ql, qc = (np.asarray(t, np.uint16).reshape(64) for t in quant_tables)
        self.quant_tables = (ql, qc)
        self._bases = tuple(
            jnp.asarray(fdct_quant_basis(t, np.float32))
            for t in ((ql,) if self.ncomp == 1 else (ql, qc, qc))
        )

    def encode_planes(self, *planes):
        """u8 planes [N, h, w] (+ [N, ch, cw] chroma unless grayscale) →
        int16 zigzag coefficient batches [N, blocks, 64] per component."""
        if len(planes) != self.ncomp:
            raise ValueError(
                f"expected {self.ncomp} planes, got {len(planes)}"
            )
        if self.ncomp == 1:
            return _jpeg_coeffs_gray(
                planes[0], self._bases[0], geometry=self.geometry
            )
        return _jpeg_coeffs(*planes, *self._bases, geometry=self.geometry)

    def encode_rgb(self, rgb):
        """(N, H, W, 3) u8 RGB (or f32 in [0,1]) → coefficient batches,
        resizing to the target size in the same program. JPEG convention:
        full-range BT.601 (the inverse of the decode path). Grayscale
        targets keep only the luma of the same fused program."""
        if self.sampling not in ("420", "gray"):
            raise ValueError(
                "encode_rgb emits 4:2:0 (encode_feed); use encode_planes "
                f"for 4:{'4:4' if self.sampling == '444' else '2:2'} input"
            )
        if self.sampling == "gray":
            from .fused import encode_feed_gray

            y = encode_feed_gray(
                rgb,
                out_h=self.height,
                out_w=self.width,
                space=ColorSpace.BT_601,
                rng=ColorRange.JPEG,
                method=self.method,
            )
            return self.encode_planes(y)
        from .fused import encode_feed

        y, u, v = encode_feed(
            rgb,
            out_h=self.height,
            out_w=self.width,
            space=ColorSpace.BT_601,
            rng=ColorRange.JPEG,
            method=self.method,
        )
        return self.encode_planes(y, u, v)

    __call__ = encode_rgb


@partial(
    jax.jit,
    static_argnames=("src_geometry", "dst_geometry", "method", "compute"),
)
def _jpeg_transcode(
    cy, cu, cv, by, bu, bv, ay, au, av, *,
    src_geometry, dst_geometry, method="lanczos", compute="auto",
):
    """int16 zigzag coefficients in → int16 zigzag coefficients out, ONE
    XLA program: dequant+IDCT (matmul) → u8 planes → optional per-plane
    resize (stays in YUV — a pixel-domain transcode never needs CSC) →
    level shift + forward DCT + requant (matmul).

    b* are the dequant+IDCT bases of the SOURCE quant tables, a* the
    fdct+quant bases of the DESTINATION tables. The u8 rint/clip between
    the halves pins semantics to decode-then-reencode (so the two 64×64
    matrices cannot fold — by design: folding would skip the [0,255]
    pixel clamp a real transcoder applies)."""
    from .fused import _resize_plane2d

    (sbhy, sbwy), (sbhc, sbwc), (sh, sw), sampling = src_geometry
    (dbhy, dbwy), (dbhc, dbwc), (dh, dw), _ = dst_geometry
    sch, scw = _chroma_dims(sh, sw, sampling)
    dch, dcw = _chroma_dims(dh, dw, sampling)
    mode = "split_bf16" if compute in ("auto", "split_bf16") else "highest"
    plane = _plane_from_coeffs

    def resized(p, ih, iw, oh, ow):
        if (ih, iw) == (oh, ow):
            return p
        from .resize import resize_matrix

        rmat = jnp.asarray(resize_matrix(ih, oh, method).astype(np.float32))
        cmat = jnp.asarray(resize_matrix(iw, ow, method).astype(np.float32))
        r = _resize_plane2d(p, rmat, cmat, jnp.float32, mode)
        return jnp.rint(jnp.clip(r, 0, 255)).astype(jnp.uint8)

    fwd = _coeffs_from_plane

    y = resized(plane(cy, by, sbhy, sbwy, sh, sw), sh, sw, dh, dw)
    u = resized(plane(cu, bu, sbhc, sbwc, sch, scw), sch, scw, dch, dcw)
    v = resized(plane(cv, bv, sbhc, sbwc, sch, scw), sch, scw, dch, dcw)
    return fwd(y, ay, dbhy, dbwy), fwd(u, au, dbhc, dbwc), fwd(v, av, dbhc, dbwc)


@partial(
    jax.jit,
    static_argnames=("src_geometry", "dst_geometry", "method", "compute"),
)
def _jpeg_transcode_gray(
    cy, by, ay, *, src_geometry, dst_geometry, method="lanczos",
    compute="auto",
):
    """Single-component (grayscale) variant of :func:`_jpeg_transcode`."""
    from .fused import _resize_plane2d

    (sbhy, sbwy), _, (sh, sw), _ = src_geometry
    (dbhy, dbwy), _, (dh, dw), _ = dst_geometry
    mode = "split_bf16" if compute in ("auto", "split_bf16") else "highest"
    y = _plane_from_coeffs(cy, by, sbhy, sbwy, sh, sw)
    if (sh, sw) != (dh, dw):
        from .resize import resize_matrix

        rmat = jnp.asarray(resize_matrix(sh, dh, method).astype(np.float32))
        cmat = jnp.asarray(resize_matrix(sw, dw, method).astype(np.float32))
        y = _resize_plane2d(y, rmat, cmat, jnp.float32, mode)
        y = jnp.rint(jnp.clip(y, 0, 255)).astype(jnp.uint8)
    return (_coeffs_from_plane(y, ay, dbhy, dbwy),)


class JpegDeviceTranscoder:
    """The device half of the split MJPEG→MJPEG transcoder.

    Composes :class:`JpegDevicePipeline`'s inverse half and
    :class:`JpegDeviceEncoder`'s forward half into ONE jitted program per
    batch — coefficients in, coefficients out; the only host work in the
    whole transcode is the entropy coding on either side
    (io/native/jpeg.cpp). The reference's closest path is
    decode→convert→encode through three engines with a device round trip
    between each (samples/SampleMeasureVideoQuality.py); here the entire
    pixel path is a single XLA dispatch.

    Source geometry/tables come from a probe (`io.jpeg.JpegCoefDecoder.info`);
    destination tables from ``quality`` (Annex K scaling) or explicit
    ``quant_tables``; ``out_size=(h, w)`` resizes in-program (4:2:0 sizes
    must be even).
    """

    def __init__(
        self,
        info,
        quality: int = 90,
        out_size=None,
        quant_tables=None,
        method: str = "lanczos",
        compute: str = "auto",
    ):
        # reuse the decode pipeline's probe validation + geometry rules
        probe = JpegDevicePipeline(info, output="planes")
        self.src_geometry = probe.geometry
        self.sampling = probe.sampling  # output keeps the source sampling
        self.subsampled = self.sampling == "420"  # legacy flag
        self.ncomp = probe.ncomp
        self.height, self.width = probe.height, probe.width
        self.out_h, self.out_w = out_size or (self.height, self.width)
        if self.sampling == "420" and (self.out_h % 2 or self.out_w % 2):
            raise ValueError("4:2:0 JPEG target size must be even")
        if self.sampling == "422" and self.out_w % 2:
            raise ValueError("4:2:2 JPEG target width must be even")
        self.dst_geometry = encode_geometry(
            self.out_h, self.out_w, self.sampling
        )
        self.method, self.compute = method, compute
        if quant_tables is None:
            quant_tables = std_quant_tables(quality)
        ql, qc = (np.asarray(t, np.uint16).reshape(64) for t in quant_tables)
        self.quant_tables = (ql, qc)
        self._fwd = tuple(
            jnp.asarray(fdct_quant_basis(t, np.float32))
            for t in ((ql,) if self.ncomp == 1 else (ql, qc, qc))
        )
        self.set_src_quant_tables(info)

    def set_src_quant_tables(self, info) -> None:
        """(Re)build the inverse bases on a mid-stream DQT change —
        cheap, no recompile (tables are program inputs). Accepts a probe
        info (``.qt``) or a per-component sequence of 64-entry zigzag
        tables."""
        qts = info if isinstance(info, (tuple, list)) else [
            info.qt[c][:64] for c in range(self.ncomp)
        ]
        self._inv = tuple(
            jnp.asarray(dequant_idct_basis(np.array(q[:64]), np.float32))
            for q in qts
        )

    def __call__(self, *coeffs):
        """[N, blocks, 64] int16 zigzag batches per component → same, at
        the output geometry/tables."""
        if len(coeffs) != self.ncomp:
            raise ValueError(
                f"expected {self.ncomp} coefficient batches, "
                f"got {len(coeffs)}"
            )
        if self.ncomp == 1:
            return _jpeg_transcode_gray(
                coeffs[0], self._inv[0], self._fwd[0],
                src_geometry=self.src_geometry,
                dst_geometry=self.dst_geometry,
                method=self.method,
                compute=self.compute,
            )
        return _jpeg_transcode(
            *coeffs, *self._inv, *self._fwd,
            src_geometry=self.src_geometry,
            dst_geometry=self.dst_geometry,
            method=self.method,
            compute=self.compute,
        )


def golden_encode(planes, qts, geometry):
    """float64 reference for the forward path: u8 (y, u, v) planes →
    int16 zigzag coefficient batches (rint rounding) — the fidelity
    anchor for :class:`JpegDeviceEncoder`."""
    (bhy, bwy), (bhc, bwc), (_h, _w), _sub = geometry
    grids = ((bhy, bwy), (bhc, bwc), (bhc, bwc))
    out = []
    for p, qt, (bh, bw) in zip(planes, qts, grids):
        a = fdct_quant_basis(qt, np.float64)
        lead = p.shape[:-2]
        ph, pw = p.shape[-2], p.shape[-1]
        pad = [(0, 0)] * len(lead) + [(0, bh * 8 - ph), (0, bw * 8 - pw)]
        blk = np.pad(p, pad, mode="edge").astype(np.float64)
        blk = blk.reshape(*lead, bh, 8, bw, 8).swapaxes(-3, -2)
        blk = blk.reshape(*lead, bh * bw, 64) - 128.0
        c = blk @ a
        out.append(
            np.clip(np.rint(c), -2047, 2047).astype(np.int16)
        )
    return tuple(out)


def golden_decode(coeffs, qts, geometry):
    """float64 reference: the decoded u8 (y, u, v) planes from zigzag
    coefficient batches — the fidelity anchor for the device pipeline
    (rint rounding, matching ops/golden.py)."""
    (bhy, bwy), (bhc, bwc), (h, w), sampling = geometry
    grids = ((bhy, bwy), (bhc, bwc), (bhc, bwc))
    dims = ((h, w),) + (_chroma_dims(h, w, _norm_sampling(sampling)),) * 2
    out = []
    for c, qt, (bh, bw), (ph, pw) in zip(coeffs, qts, grids, dims):
        b = dequant_idct_basis(qt, np.float64)
        pix = c.astype(np.float64) @ b + 128.0
        lead = pix.shape[:-2]
        p = pix.reshape(*lead, bh, bw, 8, 8).swapaxes(-3, -2)
        p = p.reshape(*lead, bh * 8, bw * 8)[..., :ph, :pw]
        out.append(np.clip(np.rint(p), 0, 255).astype(np.uint8))
    return tuple(out)
