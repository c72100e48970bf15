"""Split MJPEG→MJPEG transcode: host entropy decode → ONE XLA program
(dequant/IDCT → optional YUV resize → fDCT/requant) → host entropy
encode (ops/jpeg.py JpegDeviceTranscoder + io/jpeg.py MjpegTranscoder).

Fidelity chain: the device coefficient-to-coefficient transform matches
the float64 golden (decode → resize → encode) within ±1 per coefficient;
the emitted stream decodes with sane PSNR against the source; quality
and resize knobs behave. Reference analog: the serial decode→encode loop
in samples/SampleMeasureVideoQuality.py, collapsed to one dispatch."""

import numpy as np
import pytest

from videoprocessingframework_tpu.io import MjpegReader, MjpegTranscoder, MjpegWriter
from videoprocessingframework_tpu.io.jpeg import JpegCoefDecoder, JpegStreamError
from videoprocessingframework_tpu.ops import jpeg as J
from videoprocessingframework_tpu.ops.resize import resize_matrix

W, H = 160, 128
N = 4


def _gradient_rgb(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        (yy * 255 / h)[..., None] * np.array([1.0, 0.6, 0.3])
        + (xx * 255 / w)[..., None] * np.array([0.0, 0.4, 0.7])
    ) / 2
    out = base[None] + rng.normal(0, 4, (n, h, w, 3))
    return np.clip(out, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    p = tmp_path_factory.mktemp("mjpeg") / "src.mjpeg"
    frames = _gradient_rgb(N, H, W)
    with MjpegWriter(str(p), W, H, quality=90) as wr:
        wr.write_rgb(frames)
    return str(p), frames


def _psnr(a, b):
    err = a.astype(np.float64) - b.astype(np.float64)
    return 10 * np.log10(255.0**2 / (err**2).mean())


def _golden_transcode(coeffs, src_qts, src_geom, dst_qts, dst_geom,
                      method="lanczos"):
    """float64 reference: golden_decode → per-plane f64 resize →
    golden_encode."""
    y, u, v = J.golden_decode(coeffs, src_qts, src_geom)
    (_, _), (_, _), (dh, dw), sub = dst_geom
    dims = ((dh, dw), ((dh + 1) // 2, (dw + 1) // 2),
            ((dh + 1) // 2, (dw + 1) // 2)) if sub else ((dh, dw),) * 3
    planes = []
    for p, (oh, ow) in zip((y, u, v), dims):
        ih, iw = p.shape[-2:]
        if (ih, iw) != (oh, ow):
            r = resize_matrix(ih, oh, method)
            c = resize_matrix(iw, ow, method)
            p = np.clip(np.rint(r @ p.astype(np.float64) @ c.T), 0, 255
                        ).astype(np.uint8)
        planes.append(p)
    return J.golden_encode(tuple(planes), dst_qts, dst_geom)


@pytest.mark.parametrize("out_size", [None, (64, 80)])
def test_device_transcode_matches_golden(clip, out_size):
    path, _ = clip
    dec = JpegCoefDecoder()
    with open(path, "rb") as f:
        data = f.read()
    # first image only (SOI..EOI)
    end = data.index(b"\xff\xd9") + 2
    cy, cu, cv = dec.decode(data[:end])
    info = dec.info
    src_qts = tuple(np.array(info.qt[c][:64], np.uint16) for c in range(3))

    t = J.JpegDeviceTranscoder(info, quality=70, out_size=out_size)
    got = tuple(np.asarray(c) for c in t(cy[None], cu[None], cv[None]))
    ql, qc = t.quant_tables
    want = _golden_transcode(
        (cy, cu, cv), src_qts, t.src_geometry, (ql, qc, qc), t.dst_geometry
    )
    for g, w_ in zip(got, want):
        assert g.shape[1:] == w_.shape
        assert np.abs(g[0].astype(np.int32) - w_.astype(np.int32)).max() <= 1


def test_transcoder_end_to_end(clip, tmp_path):
    path, frames = clip
    out = tmp_path / "out.mjpeg"
    with MjpegTranscoder(path, str(out), quality=92, batch=2) as t:
        st = t.run()
    assert st.frames == N and st.out_bytes == out.stat().st_size > 0
    rd = MjpegReader(str(out), output="rgb_u8")
    got = np.concatenate([np.asarray(b) for b in rd.batches()], axis=0)
    assert got.shape == frames.shape
    assert _psnr(got, frames) > 33.0  # two lossy generations


def test_transcoder_resize_and_quality(clip, tmp_path):
    path, frames = clip
    outs = {}
    for q in (30, 92):
        p = tmp_path / f"q{q}.mjpeg"
        with MjpegTranscoder(
            path, str(p), quality=q, out_size=(64, 80), batch=3
        ) as t:
            st = t.run()
        assert st.frames == N
        outs[q] = p
    assert outs[30].stat().st_size < outs[92].stat().st_size
    rd = MjpegReader(str(outs[92]), output="rgb_u8")
    assert (rd.height, rd.width) == (64, 80)
    got = np.concatenate([np.asarray(b) for b in rd.batches()], axis=0)
    assert got.shape == (N, 64, 80, 3)


def test_transcoder_container_and_callback(clip, tmp_path):
    path, _ = clip
    out = tmp_path / "out.avi"
    seen = []
    with MjpegTranscoder(path, str(out), container="avi") as t:
        st = t.run(on_packet=lambda pkt, i: seen.append((i, len(pkt))))
    assert st.frames == N == len(seen)
    assert all(pkt_len > 0 for _, pkt_len in seen)
    rd = MjpegReader(str(out), output="rgb_u8")
    got = np.concatenate([np.asarray(b) for b in rd.batches()], axis=0)
    assert got.shape[0] == N


def test_transcoder_max_frames_and_sinkless(clip):
    path, _ = clip
    with MjpegTranscoder(path, None, max_frames=2) as t:
        st = t.run()
    assert st.frames == 2


def test_transcoder_rejects_non_mjpeg():
    with pytest.raises(JpegStreamError, match="not MJPEG"):
        MjpegTranscoder("tests/assets/test.mp4", None)


def test_transcoder_midstream_geometry_change(clip, tmp_path):
    """Concatenated raw MJPEG with a resolution change: the raw sink
    rebuilds and keeps going; a container sink without a fixed out_size
    raises; a fixed out_size normalizes both segments."""
    path, _ = clip
    small = tmp_path / "small.mjpeg"
    with MjpegWriter(str(small), 96, 64, quality=90) as wr:
        wr.write_rgb(_gradient_rgb(2, 64, 96, seed=9))
    mixed = tmp_path / "mixed.mjpeg"
    mixed.write_bytes(
        open(path, "rb").read() + small.read_bytes()
    )

    out = tmp_path / "out.mjpeg"
    with MjpegTranscoder(str(mixed), str(out)) as t:
        st = t.run()
    assert st.frames == N + 2

    with pytest.raises(JpegStreamError, match="geometry"):
        with MjpegTranscoder(
            str(mixed), str(tmp_path / "o.avi"), container="avi"
        ) as t:
            t.run()

    norm = tmp_path / "norm.avi"
    with MjpegTranscoder(
        str(mixed), str(norm), container="avi", out_size=(64, 96)
    ) as t:
        st = t.run()
    assert st.frames == N + 2
    rd = MjpegReader(str(norm), output="rgb_u8")
    got = np.concatenate([np.asarray(b) for b in rd.batches()], axis=0)
    assert got.shape == (N + 2, 64, 96, 3)


def test_transcoder_workers_bit_identical(clip, tmp_path):
    """The thread-parallel host halves (workers>1) produce byte-identical
    output to the serial path — per-frame fan-out, order preserved."""
    path, _ = clip
    outs = {}
    for w in (1, 3):
        p = tmp_path / f"w{w}.mjpeg"
        with MjpegTranscoder(
            path, str(p), quality=88, batch=3, workers=w
        ) as t:
            st = t.run()
        assert st.frames == N
        outs[w] = p.read_bytes()
    assert outs[1] == outs[3]


def test_transcoder_workers_geometry_change(clip, tmp_path):
    """Parallel decode handles a mid-stream resolution change (each
    packet is standalone; grouping happens after the ordered join)."""
    path, _ = clip
    small = tmp_path / "s.mjpeg"
    with MjpegWriter(str(small), 96, 64, quality=90) as wr:
        wr.write_rgb(_gradient_rgb(2, 64, 96, seed=11))
    mixed = tmp_path / "m.mjpeg"
    mixed.write_bytes(open(path, "rb").read() + small.read_bytes())
    out = tmp_path / "o.mjpeg"
    with MjpegTranscoder(str(mixed), str(out), workers=3) as t:
        st = t.run()
    assert st.frames == N + 2


def test_transcoder_odd_resize_rejected(clip):
    path, _ = clip
    with pytest.raises(ValueError, match="even"):
        MjpegTranscoder(path, None, out_size=(63, 80))
