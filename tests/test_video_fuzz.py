"""Adversarial inputs through the native video stack: truncated and
point-mutated H.264 bitstreams fed to the standalone decoder, and
garbage fed to the demuxer. Everything flows through libav (which does
the parsing), but OUR glue (packet feeding, frame packing, geometry
checks in io/native/decoder.cpp) sits on the path — the loop runs in a
subprocess so a native crash fails as a returncode, mirroring the JPEG
fuzz gate."""

import os
import subprocess
import sys

_FUZZ = r"""
import numpy as np
import sys
sys.path.insert(0, __REPO__)
from videoprocessingframework_tpu.core.enums import CodecId
from videoprocessingframework_tpu.core.exceptions import (
    BitstreamParserException, HwResetException,
)
from videoprocessingframework_tpu.io.decoder import VideoDecoder
from videoprocessingframework_tpu.io.demuxer import FFmpegDemuxer

clip = open(__CLIP__, "rb").read()
data = np.frombuffer(clip, np.uint8)
rng = np.random.default_rng(20260818)

def drive(packet_bytes):
    dec = VideoDecoder(CodecId.H264, threads=1)
    try:
        dec.decode_packet(packet_bytes)
        while dec.flush_frame() is not None:
            pass
    except (BitstreamParserException, HwResetException, RuntimeError):
        pass
    finally:
        dec.close()

# truncations of a real elementary stream
for _ in range(120):
    cut = int(rng.integers(1, data.size))
    drive(data[:cut].copy())

# point mutations (headers + slice data)
for _ in range(300):
    m = data[: 40000].copy()
    for _k in range(int(rng.integers(1, 8))):
        m[int(rng.integers(0, m.size))] = int(rng.integers(0, 256))
    drive(m)

# pure garbage packets
for n in (1, 7, 512, 65536):
    for _ in range(20):
        drive(rng.integers(0, 256, n, np.uint8).astype(np.uint8))

# demuxer over garbage "files"
import tempfile, pathlib
d = pathlib.Path(tempfile.mkdtemp())
for i in range(30):
    p = d / f"g{i}.mp4"
    p.write_bytes(bytes(rng.integers(0, 256, int(rng.integers(0, 8192)),
                                     np.uint8)))
    try:
        dm = FFmpegDemuxer(str(p))
        for _ in range(4):
            if dm.demux() is None:
                break
        dm.close()
    except (RuntimeError, ValueError):
        pass

print("video fuzz done")
"""


def test_video_stack_fuzz(test_mp4, tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # elementary H.264 stream via the demuxer (annexb)
    sys.path.insert(0, repo)
    from videoprocessingframework_tpu.io.demuxer import FFmpegDemuxer

    es = tmp_path / "es.h264"
    dm = FFmpegDemuxer(test_mp4)
    with open(es, "wb") as f:
        while True:
            r = dm.demux()
            if r is None:
                break
            f.write(r.packet.tobytes())
    dm.close()

    code = _FUZZ.replace("__REPO__", repr(repo)).replace(
        "__CLIP__", repr(str(es))
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=480,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, (
        f"video fuzz died (rc={proc.returncode} — likely a native "
        f"crash):\n{proc.stdout}\n{proc.stderr[-2000:]}"
    )
    assert "video fuzz done" in proc.stdout
