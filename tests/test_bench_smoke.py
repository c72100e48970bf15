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
