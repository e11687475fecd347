"""ctypes loader for the native C++ runtime library (native/libfxnative.so).

The reference ships its performance-critical host services as native binaries
(XUSG.dll: DDS/BC decode, image IO; SURVEY.md section 2.2).  Our equivalents
live in native/src and are built with `make -C native`.  Python fallbacks
exist for every entry point, so the framework degrades gracefully when the
library has not been built.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _candidate_paths():
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    yield os.path.join(root, "native", "libfxnative.so")
    yield os.path.join(os.path.dirname(__file__), "libfxnative.so")


def get_native_lib() -> Optional[ctypes.CDLL]:
    """Load and memoize the native library; None if unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    for path in _candidate_paths():
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
                _configure(lib)
                _lib = lib
                break
            except OSError:
                continue
    return _lib


def _configure(lib: ctypes.CDLL) -> None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.fx_decode_bc6h.argtypes = [u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p]
    lib.fx_decode_bc6h.restype = None
    lib.fx_write_png.argtypes = [
        ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int
    ]
    lib.fx_write_png.restype = ctypes.c_int
