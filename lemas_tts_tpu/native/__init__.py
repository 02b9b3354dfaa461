"""Native (C++) runtime components, loaded via ctypes.

The compute path is JAX/XLA/Pallas; this package hosts the *runtime around
it* — host-side audio DSP (``audio``) and the serving micro-batcher
(``batcher``) — as C++ shared libraries built from ``native/`` at the repo
root. Libraries build on demand with ``g++`` (cached under ``native/build``);
every consumer has a pure-Python fallback, so the framework runs without a
toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
BUILD_DIR = NATIVE_DIR / "build"

_lock = threading.Lock()
_cache: dict = {}


def load_library(name: str) -> Optional[ctypes.CDLL]:
    """Load ``lib<name>.so``, building it with make on first use.
    Returns None (and remembers that) if the toolchain or sources are absent.
    """
    with _lock:
        if name in _cache:
            return _cache[name]
        lib = None
        so = BUILD_DIR / f"lib{name}.so"
        try:
            src = NATIVE_DIR / f"{name}.cpp"
            if not so.is_file() or (
                src.is_file() and src.stat().st_mtime > so.stat().st_mtime
            ):
                subprocess.run(
                    ["make", "-C", str(NATIVE_DIR), f"build/lib{name}.so"],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(str(so))
        except Exception:
            lib = None
        _cache[name] = lib
        return lib


def available(name: str) -> bool:
    return load_library(name) is not None
