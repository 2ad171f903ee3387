"""Native (C++) host-side extensions.

Analog of the reference's extension loader (``torchani/csrc/__init__.py``):
availability flags + env kill-switch.  The TPU compute path needs no native
code (Pallas/XLA cover it); the native pieces here accelerate host-side IO.
Built on demand with g++ (no pybind11 — plain C ABI via ctypes); failures
degrade gracefully to the pure-Python implementations.

Env vars:
- ``TORCHANI_TPU_DISABLE_EXTENSIONS=1``: never build/load native code.
"""

import ctypes
import os
import subprocess
import typing as tp
from pathlib import Path

__all__ = ["XYZPARSE_IS_AVAILABLE", "load_xyzparse"]

_DISABLED = os.getenv("TORCHANI_TPU_DISABLE_EXTENSIONS") == "1"
_DIR = Path(__file__).resolve().parent
_LIB: tp.Optional[ctypes.CDLL] = None
_TRIED = False


def _build(src: Path, out: Path) -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(out), str(src)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load_xyzparse() -> tp.Optional[ctypes.CDLL]:
    """Load (building if needed) the native xyz parser; None if unavailable."""
    global _LIB, _TRIED
    if _DISABLED:
        return None
    if _TRIED:
        return _LIB
    _TRIED = True
    so = _DIR / "xyzparse.so"
    src = _DIR / "xyzparse.cpp"
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        if not _build(src, so):
            return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.parse_xyz.restype = ctypes.c_long
        lib.parse_xyz.argtypes = [
            ctypes.c_char_p,
            ctypes.c_long,
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


XYZPARSE_IS_AVAILABLE = load_xyzparse() is not None
