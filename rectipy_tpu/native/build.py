"""Lazy g++ compilation + ctypes loading of the native helpers."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_lib_cache: dict = {}


def load_native(name: str = "connectivity") -> Optional[ctypes.CDLL]:
    """Compile (once) and load ``rectipy_tpu/native/<name>.cpp``.

    Returns None when no C++ toolchain is available -- callers fall back to
    numpy.  The shared object is cached keyed on the source hash, so edits
    recompile automatically.
    """
    if name in _lib_cache:
        return _lib_cache[name]
    src = os.path.join(_DIR, f"{name}.cpp")
    if not os.path.exists(src):
        _lib_cache[name] = None
        return None
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(tempfile.gettempdir(), f"rectipy_tpu_{name}_{digest}.so")
    if not os.path.exists(so_path):
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", so_path],
                check=True, capture_output=True, timeout=120,
            )
        except (OSError, subprocess.SubprocessError):
            _lib_cache[name] = None
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        _lib_cache[name] = None
        return None
    _lib_cache[name] = lib
    return lib
