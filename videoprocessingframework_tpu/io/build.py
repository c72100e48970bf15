"""Build the native host-runtime library.

``ensure_built()`` compiles ``libvpf_host.so`` on first use (a few seconds)
into ``io/_native_build/``; set ``VPF_TPU_NATIVE_LIB`` to use a pre-built
library instead. CMake builds are supported too (io/native/CMakeLists.txt);
this direct g++ path keeps import-time bootstrap dependency-free.
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import subprocess
import threading

_HERE = pathlib.Path(__file__).parent
_SRC = _HERE / "native"
_OUT_DIR = _HERE / "_native_build"
_LIB = _OUT_DIR / "libvpf_host.so"
_STAMP = _OUT_DIR / "libvpf_host.stamp"
_lock = threading.Lock()

_SOURCES = [
    "demuxer.cpp", "decoder.cpp", "encoder.cpp", "pool.cpp", "muxer.cpp",
    "jpeg.cpp",
]


def _source_digest() -> str:
    h = hashlib.sha256()
    for src in _SOURCES + ["common.hpp"]:
        h.update((_SRC / src).read_bytes())
    return h.hexdigest()


def _pkg_config(*args: str) -> list[str]:
    out = subprocess.check_output(
        ["pkg-config", *args, "libavformat", "libavcodec", "libavutil"],
        text=True,
    )
    return out.split()


def lib_path() -> pathlib.Path:
    env = os.environ.get("VPF_TPU_NATIVE_LIB")
    if env:
        return pathlib.Path(env)
    return _LIB


def needs_build() -> bool:
    # Content-hash stamp, not mtimes: on a fresh checkout all mtimes are
    # equal, and a stale (or foreign-ABI) binary must never win over the
    # reviewed sources.
    lib = lib_path()
    if not lib.exists():
        return True
    if not (_SRC / "common.hpp").exists():
        # pre-built wheel install without the C++ sources: trust the
        # shipped binary (it was stamped at wheel-build time)
        return False
    if not _STAMP.exists():
        return True
    return _STAMP.read_text().strip() != _source_digest()


def build() -> pathlib.Path:
    _OUT_DIR.mkdir(exist_ok=True)
    cflags = _pkg_config("--cflags")
    libs = _pkg_config("--libs")
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-fPIC",
        "-shared",
        "-fvisibility=hidden",
        *[str(_SRC / s) for s in _SOURCES],
        *cflags,
        *libs,
        "-o",
        str(_LIB),
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    _STAMP.write_text(_source_digest())
    return _LIB


def ensure_built() -> pathlib.Path:
    with _lock:
        if os.environ.get("VPF_TPU_NATIVE_LIB"):
            return lib_path()
        if needs_build():
            build()
        return _LIB
