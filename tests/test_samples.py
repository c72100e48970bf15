"""Samples double as integration tests, like the reference's CI
(Makefile run_samples_without_docker). Each sample runs in-process on the
CPU backend with small frame budgets."""

import os
import pathlib
import subprocess
import sys

import pytest

SAMPLES = pathlib.Path(__file__).parent.parent / "samples"


def _run(script: str, *args: str) -> str:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["VPF_TPU_FORCE_CPU"] = "1"
    proc = subprocess.run(
        [sys.executable, str(SAMPLES / script), *args],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=str(SAMPLES.parent),
    )
    assert proc.returncode == 0, f"{script} failed:\n{proc.stdout}\n{proc.stderr}"
    return proc.stdout + proc.stderr


def test_sample_decode_builtin(test_mp4, tmp_path):
    out = _run("sample_decode.py", test_mp4, str(tmp_path / "o.nv12"))
    assert "decoded 96 frames" in out


def test_sample_decode_standalone(test_mp4, tmp_path):
    out = _run("sample_decode.py", test_mp4, str(tmp_path / "o.nv12"),
               "--mode", "standalone")
    assert "decoded 96 frames" in out


def test_sample_decode_seek(test_mp4, tmp_path):
    out = _run("sample_decode.py", test_mp4, str(tmp_path / "o.nv12"),
               "--mode", "seek", "--seek-frame", "50")
    assert "decoded" in out


def test_sample_decode_sw(test_mp4, tmp_path):
    out = _run("sample_decode_sw.py", test_mp4, str(tmp_path / "o.yuv"))
    assert "decoded 96 frames" in out


def test_sample_demux_decode(test_mp4):
    out = _run("sample_demux_decode.py", test_mp4)
    assert "decoded 96 surfaces" in out


@pytest.mark.slow
def test_sample_decode_multi_thread(test_mp4):
    out = _run("sample_decode_multi_thread.py", test_mp4, "--streams", "2")
    assert "aggregate fps" in out


@pytest.mark.slow
def test_sample_encode_roundtrip(test_mp4, tmp_path):
    raw = tmp_path / "frames.nv12"
    _run("sample_decode.py", test_mp4, str(raw))
    out = _run("sample_encode.py", str(raw), str(tmp_path / "enc.h264"),
               "848", "464", "--preset", "P1")
    assert "sent 96 frames, wrote 96 packets" in out


def test_sample_encode_multi_thread():
    out = _run("sample_encode_multi_thread.py", "--threads", "2",
               "--frames", "10")
    assert "aggregate" in out


def test_sample_transcode(test_mp4, tmp_path):
    out = _run("sample_transcode.py", test_mp4, str(tmp_path / "t.h264"),
               "--scale", "424x232")
    assert "transcoded 96 frames -> 96 packets" in out


@pytest.mark.slow
def test_sample_measure_video_quality(test_mp4):
    out = _run("sample_measure_video_quality.py", test_mp4, "--frames", "16")
    assert "PSNR avg" in out and "SSIM avg" in out
    assert "MS-SSIM (luma) avg" in out


def test_sample_remap(test_mp4):
    out = _run("sample_remap.py", test_mp4, "--frames", "2")
    assert "remapped 2 frames" in out


def test_sample_dlpack(test_mp4):
    out = _run("sample_dlpack.py", test_mp4)
    assert "as torch tensor" in out


@pytest.mark.slow
def test_sample_torch(test_mp4):
    pytest.importorskip("torch")
    out = _run("sample_torch.py", test_mp4, "--frames", "3")
    assert "round-tripped 3 frames" in out


@pytest.mark.slow
def test_sample_display_headless(test_mp4):
    out = _run("sample_display.py", test_mp4, "--frames", "3")
    assert "processed 3 frames" in out


@pytest.mark.slow
def test_sample_jax_resnet(test_mp4):
    out = _run("sample_jax_resnet.py", test_mp4, "--frames", "4",
               "--batch", "2")
    assert "classified 4 frames" in out


@pytest.mark.slow
def test_sample_segmentation(test_mp4):
    out = _run("sample_segmentation.py", test_mp4, "--frames", "2")
    assert "segmented 2 frames" in out


@pytest.mark.slow
def test_sample_batch_inference(test_mp4):
    out = _run("sample_batch_inference.py", test_mp4, "--streams", "1",
               "--batch", "4")
    assert "classified" in out


@pytest.mark.slow
def test_sample_aot_compile(test_mp4, tmp_path):
    out = _run("sample_aot_compile.py", test_mp4, "--batch", "4",
               "--engine", str(tmp_path / "engine.xla"))
    assert "engine compiled" in out
    assert "served" in out


def test_sample_device_transcode(test_mp4, tmp_path):
    out = _run("sample_device_transcode.py", test_mp4,
               str(tmp_path / "d.h264"), "--size", "424x232",
               "--frames", "24")
    assert "device-transcoded 24 frames" in out


def test_sample_mjpeg_transcode(tmp_path):
    out = _run("sample_mjpeg_transcode.py", "synth",
               str(tmp_path / "t.mjpeg"), "--size", "160x120")
    assert "transcoded 8 frames" in out
    assert "PSNR" in out


@pytest.mark.slow
def test_sample_dataloader(test_mp4):
    out = _run("sample_dataloader.py", test_mp4, "--clip-len", "4",
               "--batch", "2", "--size", "64", "--workers", "1")
    assert "clips/epoch" in out
    assert "epoch 0:" in out


def test_sample_scenecut(test_mp4):
    out = _run("sample_scenecut.py", test_mp4, "--frames", "32",
               "--batch", "16")
    assert "1 shot(s)" in out
    assert "frames [0, 32)" in out


@pytest.mark.slow
def test_sample_stabilize(test_mp4):
    out = _run("sample_stabilize.py", test_mp4, "--frames", "8",
               "--jitter", "2")
    assert "after stabilization" in out


@pytest.mark.slow
def test_sample_flow_interp(test_mp4):
    out = _run("sample_flow_interp.py", test_mp4, "--triplets", "1", "--mv")
    assert "midpoint PSNR" in out
    assert "codec MVs:" in out
    assert "mean gain over frame-repeat" in out


@pytest.mark.slow
def test_sample_train_video(test_mp4):
    out = _run("sample_train_video.py", test_mp4, "--clip-len", "2",
               "--batch", "2", "--size", "32", "--steps", "2")
    assert "trained 2 steps" in out
    assert "final loss" in out


@pytest.mark.slow
def test_sample_dataloader_mjpeg():
    out = _run("sample_dataloader.py", "--mjpeg", "--clip-len", "2",
               "--batch", "2", "--size", "48", "--workers", "1")
    assert "synthesized MJPEG corpus" in out
    assert "epoch 0:" in out


@pytest.mark.slow
def test_sample_serving(test_mp4):
    out = _run("sample_serving.py", test_mp4, "--clients", "2",
               "--frames", "8", "--max-batch", "4")
    assert "served 8 requests" in out
    assert "p50" in out


@pytest.mark.slow
def test_sample_train_video_checkpoint_resume(test_mp4, tmp_path):
    ck = str(tmp_path / "ck")
    _run("sample_train_video.py", test_mp4, "--clip-len", "2",
         "--batch", "2", "--size", "32", "--steps", "2",
         "--checkpoint", ck, "--save-every", "1")
    out = _run("sample_train_video.py", test_mp4, "--clip-len", "2",
               "--batch", "2", "--size", "32", "--steps", "3",
               "--checkpoint", ck, "--save-every", "1")
    assert "resumed at step 2" in out
    assert "trained 3 steps" in out
