"""bench.py is the driver's headline entry point — smoke its quick mode
end to end as a subprocess and pin the JSON contract."""

import json
import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_bench_quick_json_contract():
    env = dict(os.environ, VPF_TPU_FORCE_CPU="1")
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--quick", "--frames",
         "32"],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    assert set(d) >= {"metric", "value", "unit", "vs_baseline", "extra"}
    assert d["unit"] == "fps"
    assert d["value"] > 0
    extra = d["extra"]
    assert extra["decode_only_fps"] > 0
    assert extra["kernel_ulp_ok"] is True  # CPU backend: gate always runs
    assert extra["transcode_fps"] > 0
    assert extra["transcode_psnr_db"] > 40


@pytest.mark.slow
def test_fidelity_child_end_to_end(tmp_path):
    """The killable device-metrics child (--_fidelity) emits one JSON
    line per metric as each completes. resnet50 × batch 32 is minutes-
    class on CPU, so VPF_FIDELITY_SMOKE swaps in a small stand-in —
    this is the only off-TPU coverage of the child's full path."""
    import numpy as np

    h, w, b = 96, 128, 2
    npz = tmp_path / "planes.npz"
    rng = np.random.default_rng(0)
    np.savez(
        npz,
        y=rng.integers(0, 255, (b, h, w), endpoint=True).astype(np.uint8),
        u=rng.integers(0, 255, (b, h // 2, w // 2)).astype(np.uint8),
        v=rng.integers(0, 255, (b, h // 2, w // 2)).astype(np.uint8),
        h=h, w=w, batch=b,
    )
    env = dict(os.environ, VPF_TPU_FORCE_CPU="1", VPF_FIDELITY_SMOKE="1")
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--quick",
         "--_fidelity", str(npz)],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    emits = {}
    for ln in out.stdout.strip().splitlines():
        if ln.startswith("{"):
            emits.update(json.loads(ln))
    assert emits["ok"] is True and emits["ulp"] <= 1
    assert emits["kernel_only_fps"] > 0
    assert emits["resnet_device_fps"] > 0


def _load_bench():
    """Import bench.py as a module without running it."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_under_test", REPO / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_supervisor_simulated_wedged_child():
    """Simulated dead weather: the child checkpoints a partial result
    then wedges (sleeps un-killably long). The supervisor must SIGKILL
    the group at the deadline and still emit exactly one JSON line with
    the last checkpoint — the VERDICT r3 'dead-weather-defensible'
    contract."""
    wedge = (
        "import json, os, time\n"
        "p = os.environ['VPF_BENCH_PARTIAL']\n"
        "with open(p + '.tmp', 'w') as f:\n"
        "    f.write(json.dumps({'metric': 'm', 'value': 7.5,\n"
        "        'unit': 'fps', 'vs_baseline': 0.015,\n"
        "        'extra': {'weather': 'collapsed'}}))\n"
        "os.replace(p + '.tmp', p)\n"
        "time.sleep(600)\n"
    )
    # deadline must outlast the child's interpreter startup (the env's
    # sitecustomize imports jax — ~2 s, more under suite load) so the
    # checkpoint lands before the kill
    env = dict(
        os.environ, VPF_BENCH_CHILD_CMD=wedge, VPF_BENCH_DEADLINE="12"
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, timeout=60, env=env, cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln]
    assert len(lines) == 1
    d = json.loads(lines[0])
    assert d["value"] == 7.5  # the checkpoint survived the kill
    assert d["extra"]["weather"] == "collapsed"
    assert "supervisor_note" in d["extra"]


def test_salvage_keeps_sampling_in_collapsed_weather():
    b = _load_bench()
    # inside budget: always continue
    assert b.keep_sampling(1, 10.0, 220.0, 5.0, 100.0, 400.0)
    # past budget, healthy capture: stop
    assert not b.keep_sampling(5, 230.0, 220.0, 300.0, 100.0, 400.0)
    # past budget, collapsed capture, time left: keep salvaging
    assert b.keep_sampling(5, 230.0, 220.0, 5.0, 100.0, 400.0)
    # collapsed but only the tail reserve remains: stop
    assert not b.keep_sampling(5, 230.0, 220.0, 5.0, 100.0, 110.0)
    # fewer than 3 runs never stop, even past budget
    assert b.keep_sampling(2, 230.0, 220.0, 300.0, 100.0, 400.0)


def test_weather_diagnosis_fields():
    b = _load_bench()
    state, note = b.weather_diagnosis(30.0, 460.0)
    assert state == "collapsed" and "decode_only_fps" in note
    state, note = b.weather_diagnosis(400.0, 460.0)
    assert state == "ok" and note is None
    # between 25% and 60% of the ceiling: throttled link, not collapse
    state, note = b.weather_diagnosis(150.0, 400.0)
    assert state == "degraded" and "throttled" in note
    # no ceiling measured -> never claim collapse
    assert b.weather_diagnosis(1.0, 0.0)[0] == "ok"

def test_early_stop_on_watcher_grade_run():
    b = _load_bench()
    # clear bar reached, ramp over (last run off the peak), >=5 runs: stop
    assert not b.keep_sampling(5, 100.0, 220.0, 350.0, 100.0, 400.0,
                               clear_fps=340.0, last_fps=300.0)
    # bar reached but the latest run IS the peak (still ramping): continue
    assert b.keep_sampling(5, 100.0, 220.0, 350.0, 100.0, 400.0,
                           clear_fps=340.0, last_fps=350.0)
    # bar reached before 3 runs: continue (ramp may still be climbing)
    assert b.keep_sampling(2, 100.0, 220.0, 350.0, 100.0, 400.0,
                           clear_fps=340.0, last_fps=300.0)
    # at 3 runs with the bar reached and ramp over: bank it (the link's
    # burst bucket drains ~0.8 GB per extra run)
    assert not b.keep_sampling(3, 100.0, 220.0, 350.0, 100.0, 400.0,
                               clear_fps=340.0, last_fps=300.0)
    # bar not reached: the early stop never fires
    assert b.keep_sampling(6, 100.0, 220.0, 300.0, 100.0, 400.0,
                           clear_fps=340.0, last_fps=200.0)


@pytest.mark.slow
def test_bench_multicore_headline_is_curve_max():
    """--multicore (BASELINE configs[2]) leads with the streams-curve
    max aggregate — NOT the weather-bound E2E fps (VERDICT r4 #6: the
    r4 record led with a dead-weather 21 fps while its curve peaked at
    346). E2E lands in extra.e2e_fps instead."""
    env = dict(os.environ, VPF_TPU_FORCE_CPU="1")
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--quick", "--multicore",
         "--frames", "32"],
        capture_output=True, text=True, timeout=420, env=env,
        cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    d = json.loads(out.stdout.strip().splitlines()[-1])
    assert "configs[2]" in d["metric"]
    curve = d["extra"]["streams_curve"]
    assert d["value"] == max(curve.values())
    assert d["extra"]["curve_peak_streams"] in (1, 2, 4, 8, 16)
    assert "e2e_fps" in d["extra"]
    assert d["vs_baseline"] == round(d["value"] / 4000.0, 4)
