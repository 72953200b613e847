"""On-demand g++ compilation of the framework's native C++ components.

Shared objects are cached in ``native/_build`` keyed by a source-content hash,
so the first import compiles once and later imports are instant.  No build
system or pip package is required -- only the baked-in g++ toolchain.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import threading
from pathlib import Path

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_BUILD_DIR = _NATIVE_DIR / "_build"
_LOCK = threading.Lock()

_CXXFLAGS = ["-O3", "-std=c++17", "-fPIC", "-shared", "-march=native",
             "-funroll-loops"]


def build_native(source_name: str) -> Path:
    """Compile native/<source_name> into a cached .so and return its path."""
    src = _NATIVE_DIR / source_name
    code = src.read_bytes()
    tag = hashlib.sha256(code + " ".join(_CXXFLAGS).encode()).hexdigest()[:16]
    out = _BUILD_DIR / f"{src.stem}-{tag}.so"
    if out.exists():
        return out
    with _LOCK:
        if out.exists():
            return out
        _BUILD_DIR.mkdir(parents=True, exist_ok=True)
        tmp = out.with_suffix(".so.tmp")
        cmd = ["g++", *_CXXFLAGS, str(src), "-o", str(tmp)]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise RuntimeError(
                f"native build failed for {source_name}:\n{proc.stderr}")
        os.replace(tmp, out)
    return out
