"""Test config: force CPU jax with 8 virtual devices so sharding tests run
anywhere (the real-TPU paths are exercised by bench.py / the driver)."""

import os

# Force CPU even when the environment pins JAX_PLATFORMS to a TPU plugin
# (the axon sitecustomize imports jax at interpreter startup, so a plain
# setdefault is too late — override both the env and the live config).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import pytest  # noqa: E402

ASSETS = pathlib.Path(__file__).parent / "assets"

# Handshake with tools/capture_when_clear.py: a pytest run on the
# 1-core bench host flattens any concurrent TPU bench capture, so mark
# the host busy for the session (the watcher waits while this exists;
# it also ignores the file once stale, so a crashed run can't wedge it).
_BUSY = pathlib.Path("/tmp/host_busy")
_CAPTURE_LOCK = pathlib.Path("/tmp/capture_in_flight")


def _capture_in_flight() -> bool:
    """A fresh watcher lock means a bench capture is mid-flight on this
    1-core host. The watcher (tools/capture_when_clear.py _run_locked)
    touches the lock every 10 s for as long as its child lives, so the
    staleness bound here is independent of any bench deadline; 120 s of
    silence means the watcher died (SIGKILL) without cleanup."""
    try:
        import time

        return time.time() - _CAPTURE_LOCK.stat().st_mtime < 120.0
    except OSError:
        return False


@pytest.fixture(scope="session", autouse=True)
def _mark_host_busy():
    # the handshake is two-way: yield to a capture already in flight
    # (pytest here would flatten its decode ceiling AND its E2E number),
    # then hold the busy marker so no new capture starts under us.
    if not os.environ.get("VPF_NO_CAPTURE_WAIT"):
        import time

        # cap covers a worst-case long first capture (1500 s) +
        # validation (580 s) back to back, with slack
        waited = 0.0
        while _capture_in_flight() and waited < 2400.0:
            if waited == 0.0:
                print("\n[conftest] bench capture in flight "
                      "(/tmp/capture_in_flight) — waiting for it to "
                      "finish (VPF_NO_CAPTURE_WAIT=1 skips)", flush=True)
            time.sleep(10.0)
            waited += 10.0
    try:
        _BUSY.touch()
    except OSError:
        pass
    yield
    try:
        _BUSY.unlink()
    except OSError:
        pass


def pytest_runtest_setup(item):
    # refresh the busy marker's mtime per test: the watcher treats a
    # 30-min-old marker as a crashed run's leftover, and slow sessions
    # (make test_all) can legitimately outlive that on this host.
    try:
        _BUSY.touch()
    except OSError:
        pass

# Ground truth for tests/assets/test.mp4 (848x464, 96 frames, H.264,
# BT.709/MPEG, 30 fps) — same anchor constants the reference pins in
# tests/test_PyNvDecoder.py:51-63.
GT = dict(
    width=848,
    height=464,
    num_frames=96,
    framerate=30,
    timebase=8.1380e-5,
    is_vfr=False,
)


@pytest.fixture(scope="session")
def test_mp4() -> str:
    p = ASSETS / "test.mp4"
    if not p.exists():
        pytest.skip("tests/assets/test.mp4 missing")
    return str(p)


@pytest.fixture(scope="session")
def test_res_change() -> str:
    p = ASSETS / "test_res_change.h264"
    if not p.exists():
        pytest.skip("tests/assets/test_res_change.h264 missing")
    return str(p)


@pytest.fixture(scope="session")
def gt() -> dict:
    return dict(GT)
