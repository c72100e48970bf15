"""Compat-layer tests: exercises the drop-in ``PyNvCodec`` namespace the
way the reference's own test suite does (tests/test_PyNvDecoder.py,
test_PyNvEncoder.py, test_PyFfmpegDemuxer.py, test_reported_bugs.py)."""

import numpy as np
import pytest

import PyNvCodec as nvc


GT_W, GT_H, GT_FRAMES, GT_FPS = 848, 464, 96, 30


# ---- decoder basics (reference TestDecoderBasic) ---------------------------


def test_decoder_metadata(test_mp4):
    dec = nvc.PyNvDecoder(test_mp4, 0)
    assert dec.Width() == GT_W
    assert dec.Height() == GT_H
    assert dec.ColorSpace() == nvc.ColorSpace.BT_709
    assert dec.ColorRange() == nvc.ColorRange.MPEG
    assert dec.Format() == nvc.PixelFormat.NV12
    assert dec.Framerate() == GT_FPS
    assert dec.AvgFramerate() == GT_FPS
    assert not dec.IsVFR()
    assert dec.Numframes() == GT_FRAMES
    assert dec.Framesize() == GT_W * GT_H * 3 // 2


def test_decode_all_surfaces(test_mp4):
    dec = nvc.PyNvDecoder(test_mp4, 0)
    n = 0
    while True:
        surf = dec.DecodeSingleSurface()
        if surf.Empty():
            break
        assert surf.Width() == GT_W and surf.Height() == GT_H
        n += 1
    assert n == GT_FRAMES


def test_decode_all_frames_with_pkt_data(test_mp4):
    dec = nvc.PyNvDecoder(test_mp4, 0)
    frame = np.ndarray(shape=(0,), dtype=np.uint8)
    pdata = nvc.PacketData()
    last_pts = None
    n = 0
    while dec.DecodeSingleFrame(frame, pdata):
        assert frame.size == GT_W * GT_H * 3 // 2
        if last_pts is not None:
            assert pdata.pts > last_pts
        last_pts = pdata.pts
        n += 1
    assert n == GT_FRAMES


def test_decode_with_sei(test_mp4):
    dec = nvc.PyNvDecoder(test_mp4, 0)
    frame = np.ndarray(shape=(0,), dtype=np.uint8)
    sei = np.ndarray(shape=(0,), dtype=np.uint8)
    assert dec.DecodeSingleFrame(frame, sei)
    assert sei.size > 0


def test_seek_then_matches_continuous(test_mp4):
    target = 31
    cont = nvc.PyNvDecoder(test_mp4, 0)
    frame_gt = np.ndarray(shape=(0,), dtype=np.uint8)
    for _ in range(target + 1):
        assert cont.DecodeSingleFrame(frame_gt)

    seek_dec = nvc.PyNvDecoder(test_mp4, 0)
    frame = np.ndarray(shape=(0,), dtype=np.uint8)
    sc = nvc.SeekContext(seek_frame=target)
    assert seek_dec.DecodeSingleFrame(frame, sc)
    np.testing.assert_array_equal(frame, frame_gt)
    assert sc.num_frames_decoded >= 1


def test_standalone_decode_and_flush(test_mp4):
    dmx = nvc.PyFFmpegDemuxer(test_mp4)
    dec = nvc.PyNvDecoder(
        dmx.Width(), dmx.Height(), dmx.Format(), dmx.Codec(), 0
    )
    packet = np.ndarray(shape=(0,), dtype=np.uint8)
    frames = 0
    while dmx.DemuxSinglePacket(packet):
        surf = dec.DecodeSurfaceFromPacket(packet)
        if not surf.Empty():
            frames += 1
    while True:
        surf = dec.FlushSingleSurface()
        if surf.Empty():
            break
        frames += 1
    assert frames == GT_FRAMES


def test_issue_455_contract():
    """Reference tests/test_reported_bugs.py:test_issue_455."""
    nvEnc = nvc.PyNvEncoder(
        {"bitrate": "30K", "fps": "10", "codec": "hevc", "s": "256x256"}, 0
    )
    nvDec = nvc.PyNvDecoder(
        256, 256, nvc.PixelFormat.NV12, nvc.CudaVideoCodec.HEVC, 0
    )
    rawFrame = np.random.randint(0, 255, size=(256 * 256 * 3 // 2,), dtype=np.uint8)
    encodedFrame = np.ndarray(shape=(0,), dtype=np.uint8)
    count, success = 0, False
    while success is not True and count < 10:
        success = nvEnc.EncodeSingleFrame(rawFrame, encodedFrame, sync=False)
        count += 1
    assert success

    with pytest.raises(Exception) as ei:
        nvDec.DecodeSingleFrame(encodedFrame)
    assert (
        "Tried to call DecodeSurface/DecodeFrame on a Decoder that has been "
        "initialized without a built-in demuxer. Please use "
        "DecodeSurfaceFromPacket/DecodeFrameFromPacket instead or intialize "
        "the decoder with a demuxer when decoding from a file"
    ) == str(ei.value)

    decodedFrame = np.ndarray(shape=(0,), dtype=np.uint8)
    nvDec.DecodeFrameFromPacket(decodedFrame, encodedFrame)


# ---- demuxer (reference test_PyFfmpegDemuxer.py) ---------------------------


def test_demuxer_props_and_packets(test_mp4):
    dmx = nvc.PyFFmpegDemuxer(test_mp4)
    assert dmx.Width() == GT_W and dmx.Height() == GT_H
    assert dmx.Codec() == nvc.CudaVideoCodec.H264
    packet = np.ndarray(shape=(0,), dtype=np.uint8)
    pdata = nvc.PacketData()
    n = 0
    last_dts = None
    while dmx.DemuxSinglePacket(packet):
        dmx.LastPacketData(pdata)
        if last_dts is not None:
            assert pdata.dts > last_dts
        last_dts = pdata.dts
        n += 1
    assert n == GT_FRAMES


def test_demuxer_seek(test_mp4):
    dmx = nvc.PyFFmpegDemuxer(test_mp4)
    packet = np.ndarray(shape=(0,), dtype=np.uint8)
    sc = nvc.SeekContext(seek_frame=32, mode=nvc.SeekMode.EXACT_FRAME)
    assert dmx.Seek(sc, packet)
    assert packet.size > 0


# ---- encoder (reference test_PyNvEncoder.py) --------------------------------


def test_encoder_all_packets_received():
    W, H = 320, 240
    enc = nvc.PyNvEncoder(
        {"codec": "h264", "preset": "P1", "s": f"{W}x{H}", "bitrate": "1M"}, 0
    )
    assert enc.Width() == W and enc.Height() == H
    assert enc.GetFrameSizeInBytes() == W * H * 3 // 2
    frame = np.random.randint(0, 255, (W * H * 3 // 2,), dtype=np.uint8)
    packet = np.ndarray(shape=(0,), dtype=np.uint8)
    sent, received = 0, 0
    for _ in range(20):
        if enc.EncodeSingleFrame(frame, packet):
            received += 1
        sent += 1
    while enc.FlushSinglePacket(packet):
        received += 1
    assert received == sent


def test_encoder_reconfigure_and_redecode(tmp_path):
    W, H = 320, 240
    enc = nvc.PyNvEncoder(
        {"codec": "h264", "preset": "P1", "s": f"{W}x{H}", "bitrate": "1M"}, 0
    )
    stream = np.ndarray(shape=(0,), dtype=np.uint8)
    frame = np.full((W * H * 3 // 2,), 128, np.uint8)
    for _ in range(5):
        enc.EncodeSingleFrame(frame, stream, sync=True, append=True)
    assert enc.Reconfigure({"s": f"{W // 2}x{H // 2}"}, force_idr=True,
                           reset_encoder=True)
    frame2 = np.full((W * H * 3 // 8,), 128, np.uint8)
    for _ in range(5):
        enc.EncodeSingleFrame(frame2, stream, sync=True, append=True)

    path = tmp_path / "recfg.h264"
    path.write_bytes(stream.tobytes())
    dec = nvc.PyNvDecoder(str(path), 0)
    sizes = []
    out = np.ndarray(shape=(0,), dtype=np.uint8)
    while dec.DecodeSingleFrame(out):
        sizes.append(out.size)
    assert len(sizes) == 10
    assert sizes[0] == W * H * 3 // 2
    assert sizes[-1] == W * H * 3 // 8


def test_encoder_invalid_option():
    with pytest.raises(RuntimeError, match='Invalid parameter name"codecc"'):
        nvc.PyNvEncoder({"codecc": "h264", "s": "320x240"}, 0)


# ---- surfaces / converters / upload-download (test_PySurface.py) ------------


def test_surface_make_clone_crop():
    s = nvc.Surface.Make(nvc.PixelFormat.NV12, 64, 48, 0)
    assert not s.Empty()
    assert s.NumPlanes() == 2
    assert s.Width() == 64 and s.Height() == 48
    assert s.HostSize() == 64 * 48 * 3 // 2
    c = s.Clone()
    assert not c.Empty()
    cr = s.Crop(8, 8, 32, 16, 0)
    assert cr.Width() == 32 and cr.Height() == 16
    assert s.PlanePtr(0).ElemSize() == 1
    assert s.PlanePtr(0).Pitch() == 64


def test_upload_download_roundtrip():
    W, H = 64, 48
    up = nvc.PyFrameUploader(W, H, nvc.PixelFormat.NV12, 0)
    down = nvc.PySurfaceDownloader(W, H, nvc.PixelFormat.NV12, 0)
    frame = np.random.randint(0, 255, (W * H * 3 // 2,), dtype=np.uint8)
    surf = up.UploadSingleFrame(frame)
    assert not surf.Empty()
    out = np.ndarray(shape=(0,), dtype=np.uint8)
    assert down.DownloadSingleSurface(surf, out)
    np.testing.assert_array_equal(out, frame)


def test_converter_chain(test_mp4):
    """The SampleTorchResnet conversion chain via compat classes."""
    dec = nvc.PyNvDecoder(test_mp4, 0)
    surf = dec.DecodeSingleSurface()
    cc = nvc.ColorspaceConversionContext(
        nvc.ColorSpace.BT_709, nvc.ColorRange.MPEG
    )
    to_rgb = nvc.PySurfaceConverter(
        GT_W, GT_H, nvc.PixelFormat.NV12, nvc.PixelFormat.RGB, 0
    )
    rgb = to_rgb.Execute(surf, cc)
    assert not rgb.Empty()
    rs = nvc.PySurfaceResizer(224, 224, nvc.PixelFormat.RGB, 0)
    small = rs.Execute(rgb)
    assert small.Width() == 224 and small.Height() == 224
    to_pln = nvc.PySurfaceConverter(
        224, 224, nvc.PixelFormat.RGB, nvc.PixelFormat.RGB_PLANAR, 0
    )
    pln = to_pln.Execute(small, cc)
    assert not pln.Empty()
    assert pln.PlanePtr(0).Height() == 3 * 224


def test_converter_unsupported_returns_empty(test_mp4):
    dec = nvc.PyNvDecoder(test_mp4, 0)
    surf = dec.DecodeSingleSurface()
    conv = nvc.PySurfaceConverter(
        GT_W, GT_H, nvc.PixelFormat.NV12, nvc.PixelFormat.RGB, 0
    )
    # default ctx (601/MPEG) unsupported for NV12→RGB → empty surface
    out = conv.Execute(surf, None)
    assert out.Empty()


def test_buffer_upload_download():
    up = nvc.PyBufferUploader(4, 16, 0)
    data = np.random.randint(0, 255, (64,), dtype=np.uint8)
    buf = up.UploadSingleBuffer(data)
    assert buf.GetRawMemSize() == 64
    assert buf.GetElemSize() == 4 and buf.GetNumElems() == 16
    clone = buf.Clone()
    down = nvc.PyCudaBufferDownloader(4, 16, 0)
    out = np.ndarray(shape=(0,), dtype=np.uint8)
    assert down.DownloadSingleCudaBuffer(clone, out)
    np.testing.assert_array_equal(out, data)


def test_ffmpeg_decoder_and_motion_vectors(test_mp4):
    dec = nvc.PyFfmpegDecoder(test_mp4, {})
    frame = np.ndarray(shape=(0,), dtype=np.uint8)
    n = 0
    got_mvs = False
    while dec.DecodeSingleFrame(frame):
        n += 1
        if dec.GetMotionVectors().size > 0:
            got_mvs = True
        if n >= 10 and got_mvs:
            break
    assert n > 0
    assert got_mvs


def test_get_num_gpus_and_params():
    assert nvc.GetNumGpus() >= 1
    params = nvc.GetNvencParams()
    assert "codec" in params and len(params) == 29


def test_surface_plane_import_export():
    W, H = 32, 16
    up = nvc.PyFrameUploader(W, H, nvc.PixelFormat.Y, 0)
    frame = np.arange(W * H, dtype=np.uint8)
    surf = up.UploadSingleFrame(frame)
    plane = surf.PlanePtr(0)
    # Export to raw host memory with a wider pitch, then Import back
    pitch = W + 16
    raw = np.zeros((H, pitch), np.uint8)
    plane.Export(raw.ctypes.data, pitch)
    np.testing.assert_array_equal(raw[:, :W].reshape(-1), frame)
    surf2 = nvc.Surface.Make(nvc.PixelFormat.Y, W, H, 0)
    surf2.PlanePtr(0).Import(raw.ctypes.data, pitch)
    out = np.ndarray(shape=(0,), dtype=np.uint8)
    assert nvc.PySurfaceDownloader(W, H, nvc.PixelFormat.Y, 0).DownloadSingleSurface(surf2, out)
    np.testing.assert_array_equal(out, frame)


def test_motion_vector_dtype_exported():
    assert nvc.MotionVector.names[:2] == ("source", "w")


def test_yuv422_encode_round_trip(tmp_path):
    W, H = 64, 48
    enc = nvc.PyNvEncoder(
        {"codec": "h264", "preset": "P1", "s": f"{W}x{H}", "fmt": "YUV422",
         "constqp": "1"}, 0,
    )
    frame = np.random.randint(0, 256, (W * H * 2,), dtype=np.uint8)
    stream = np.ndarray(shape=(0,), dtype=np.uint8)
    for _ in range(3):
        enc.EncodeSingleFrame(frame, stream, sync=True, append=True)
    path = tmp_path / "y422.h264"
    path.write_bytes(stream.tobytes())
    dec = nvc.PyNvDecoder(str(path), 0)
    out = np.ndarray(shape=(0,), dtype=np.uint8)
    n = 0
    while dec.DecodeSingleFrame(out):
        n += 1
    assert n == 3
    assert dec.Format() == nvc.PixelFormat.YUV422
    assert out.size == W * H * 2


def test_decoder_context_stream_ctor(test_mp4):
    """pycuda-style raw (context, stream) handle ctor variants are
    accepted (handles unused on TPU — XLA orders transfers/compute)."""
    dec = nvc.PyNvDecoder(test_mp4, 12345, 67890)
    assert dec.Width() == GT_W
    frame = np.ndarray(shape=(0,), dtype=np.uint8)
    assert dec.DecodeSingleFrame(frame)


def test_surface_clone_gpu_id_variants():
    s = nvc.Surface.Make(nvc.PixelFormat.Y, 16, 16, 0)
    assert not s.Clone().Empty()
    assert not s.Clone(0).Empty()
    assert not s.Clone(12345, 67890).Empty()  # (context, stream) flavor
    other = nvc.Surface.Make(nvc.PixelFormat.Y, 16, 16, 0)
    other.CopyFrom(s, 0)
    assert other.HostSize() == s.HostSize()
