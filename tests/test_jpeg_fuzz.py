"""Bounded, seeded fuzzing of the native JPEG entropy codec: random
bytes, truncations, and point mutations of valid streams must produce
Python-level exceptions (JpegStreamError / RuntimeError), never a
crash. The loop runs in a subprocess so a segfault fails the test as a
returncode instead of killing the runner. The reference trusts its
bitstreams to the HW parser; our parser is C code consuming untrusted
input, so it gets an adversarial gate."""

import os
import subprocess
import sys

_FUZZ = r"""
# force the CPU backend the two-step way (sitecustomize re-pins the TPU
# platform; a wedged tunnel would hang the jit encode below otherwise)
import jax
jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge
xla_bridge._clear_backends(); jax.clear_caches()
import numpy as np
import sys
sys.path.insert(0, __REPO__)
from videoprocessingframework_tpu.io.jpeg import (
    JpegCoefDecoder, JpegCoefEncoder, JpegStreamError,
)
from videoprocessingframework_tpu.ops.jpeg import JpegDeviceEncoder

W, H = 48, 32
rng = np.random.default_rng(20260817)

# a valid baseline JPEG to mutate
enc = JpegDeviceEncoder(H, W, quality=80)
ce = JpegCoefEncoder(W, H, quant_tables=enc.quant_tables)
y = rng.integers(0, 256, (1, H, W), np.uint8)
u = rng.integers(0, 256, (1, H // 2, W // 2), np.uint8)
v = rng.integers(0, 256, (1, H // 2, W // 2), np.uint8)
cy, cu, cv = (np.asarray(c) for c in enc.encode_planes(y, u, v))
valid = np.frombuffer(ce.encode(cy[0], cu[0], cv[0]), np.uint8)

ok = bad = 0
def feed(data):
    global ok, bad
    dec = JpegCoefDecoder()
    try:
        dec.decode(data)
        ok += 1
    except (JpegStreamError, RuntimeError, ValueError):
        bad += 1

# 1) pure random garbage at assorted sizes
for n in (0, 1, 2, 3, 7, 64, 256, 4096):
    for _ in range(40):
        feed(rng.integers(0, 256, n, np.uint8).astype(np.uint8))

# 2) truncations of the valid stream at every kind of boundary
for _ in range(300):
    cut = int(rng.integers(0, valid.size))
    feed(valid[:cut].copy())

# 3) point mutations (markers, lengths, entropy bytes)
for _ in range(1500):
    m = valid.copy()
    for _k in range(int(rng.integers(1, 5))):
        m[int(rng.integers(0, m.size))] = int(rng.integers(0, 256))
    feed(m)

# 4) marker-segment length bombs: corrupt the 2-byte lengths directly
for _ in range(300):
    m = valid.copy()
    # find a marker and smash its length field
    idxs = np.flatnonzero(m[:-3] == 0xFF)
    if idxs.size:
        i = int(idxs[int(rng.integers(0, idxs.size))])
        m[i + 2: i + 4] = rng.integers(0, 256, 2, np.uint8)
    feed(m)

# 5) valid headers + fully random entropy payloads (drives the Huffman
# decode loop through arbitrary symbol sequences / run-length overruns)
sos = bytes(valid).find(b"\xff\xda")
hdr_end = sos + 2 + ((int(valid[sos + 2]) << 8) | int(valid[sos + 3]))
hdr = valid[:hdr_end]
for n in (0, 1, 17, 300, valid.size):
    for _ in range(60):
        body = rng.integers(0, 256, n, np.uint8).astype(np.uint8)
        feed(np.concatenate([hdr, body, np.frombuffer(b"\xff\xd9", np.uint8)]))

# 6) progressive (SOF2) stream: the same gauntlet over the multi-scan
# path (scan-chain walker, DC/AC first+refine, EOB runs)
try:
    import io as _io
    from PIL import Image
except ImportError:
    Image = None
if Image is not None:
    img = rng.integers(0, 256, (H, W, 3), np.uint8)
    bio = _io.BytesIO()
    Image.fromarray(img).save(bio, "JPEG", quality=80, progressive=True)
    pvalid = np.frombuffer(bio.getvalue(), np.uint8)
    feed(pvalid)  # must decode
    assert ok > 0
    for _ in range(200):
        feed(pvalid[: int(rng.integers(0, pvalid.size))].copy())
    for _ in range(1200):
        m = pvalid.copy()
        for _k in range(int(rng.integers(1, 5))):
            m[int(rng.integers(0, m.size))] = int(rng.integers(0, 256))
        feed(m)
    psos = bytes(pvalid).find(b"\xff\xda")
    phdr_end = psos + 2 + ((int(pvalid[psos + 2]) << 8) | int(pvalid[psos + 3]))
    phdr = pvalid[:phdr_end]
    for n in (0, 1, 17, 300):
        for _ in range(60):
            body = rng.integers(0, 256, n, np.uint8).astype(np.uint8)
            feed(np.concatenate(
                [phdr, body, np.frombuffer(b"\xff\xd9", np.uint8)]))

print(f"fuzz done: {ok} decoded, {bad} rejected cleanly")
"""


def test_jpeg_parser_fuzz():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _FUZZ.replace("__REPO__", repr(repo))],
        capture_output=True, text=True, timeout=480,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, (
        f"fuzz loop died (rc={proc.returncode} — likely a native "
        f"crash):\n{proc.stdout}\n{proc.stderr[-2000:]}"
    )
    assert "fuzz done" in proc.stdout
