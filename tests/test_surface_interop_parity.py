"""Surface interop parity — mirrors the reference's tests/test_PySurface.py:
surface↔tensor equality against downloaded frames, clone retention
(decoder-pool aliasing regression), repr contracts."""

import numpy as np
import pytest

import PyNvCodec as nvc
from videoprocessingframework_tpu.interop import surface_to_torch


def test_surface_vs_download_equality(test_mp4):
    """Tensor view of a decoded surface equals the downloaded frame
    (reference test_PySurface.py:88-161)."""
    torch = pytest.importorskip("torch")
    dec = nvc.PyNvDecoder(test_mp4, 0)
    w, h = dec.Width(), dec.Height()
    down = nvc.PySurfaceDownloader(w, h, nvc.PixelFormat.NV12, 0)
    surf = dec.DecodeSingleSurface()
    assert not surf.Empty()
    frame = np.ndarray(shape=(0,), dtype=np.uint8)
    assert down.DownloadSingleSurface(surf, frame)
    t_y = surface_to_torch(surf.core, 0)
    t_uv = surface_to_torch(surf.core, 1)
    np.testing.assert_array_equal(
        t_y.numpy().reshape(-1), frame[: w * h]
    )
    np.testing.assert_array_equal(
        t_uv.numpy().reshape(-1), frame[w * h :]
    )


def test_clone_retention_no_aliasing(test_mp4):
    """Decoded surfaces must not alias decoder internals: retaining many
    clones and continuing to decode must not corrupt earlier surfaces
    (reference decoder-pool aliasing regression, test_PySurface.py:163-195)."""
    dec = nvc.PyNvDecoder(test_mp4, 0)
    down = nvc.PySurfaceDownloader(
        dec.Width(), dec.Height(), nvc.PixelFormat.NV12, 0
    )
    retained = []
    snapshots = []
    frame = np.ndarray(shape=(0,), dtype=np.uint8)
    for _ in range(12):
        surf = dec.DecodeSingleSurface()
        assert not surf.Empty()
        retained.append(surf)
        assert down.DownloadSingleSurface(surf, frame)
        snapshots.append(frame.copy())
    # decode further — earlier surfaces must be unchanged
    for _ in range(12):
        dec.DecodeSingleSurface()
    for surf, snap in zip(retained, snapshots):
        assert down.DownloadSingleSurface(surf, frame)
        np.testing.assert_array_equal(frame, snap)


def test_surface_repr():
    s = nvc.Surface.Make(nvc.PixelFormat.NV12, 64, 32, 0)
    r = repr(s)
    assert "NV12" in r and "64" in r and "32" in r
    assert "SurfacePlane" in repr(s.PlanePtr(0))


def test_surface_plane_dlpack_protocol(test_mp4):
    """torch.from_dlpack over a decoded plane (NVCV-output analog)."""
    torch = pytest.importorskip("torch")
    dec = nvc.PyNvDecoder(test_mp4, 0)
    surf = dec.DecodeSingleSurface()
    t = torch.from_dlpack(surf.PlanePtr(0))
    assert t.shape == (dec.Height(), dec.Width())
    assert t.dtype == torch.uint8
