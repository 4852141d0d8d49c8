"""Native (C++) runtime components, loaded via ctypes.

Built on demand with g++ (no pybind11 dependency); every consumer has
a pure-Python fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libflucanative.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    src = os.path.join(_HERE, "fastio.cpp")
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        src, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH)
            < os.path.getmtime(os.path.join(_HERE, "fastio.cpp"))
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.fluca_fastio_write.restype = ctypes.c_int
        lib.fluca_fastio_write.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint64,
        ]
        lib.fluca_fastio_read.restype = ctypes.c_int
        lib.fluca_fastio_read.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_uint64,
        ]
        lib.fluca_fastio_size.restype = ctypes.c_int64
        lib.fluca_fastio_size.argtypes = [ctypes.c_char_p]
        _lib = lib
        return _lib


def write_array(path: str, arr) -> bool:
    """Write a contiguous numpy array; False -> caller should fall
    back."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return False
    arr = np.ascontiguousarray(arr)
    rc = lib.fluca_fastio_write(
        path.encode(), arr.ctypes.data_as(ctypes.c_void_p), arr.nbytes
    )
    return rc == 0


def read_array(path: str, shape, dtype):
    """Read into a new array of given shape/dtype; None -> fall back
    or error."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(shape, dtype)
    rc = lib.fluca_fastio_read(
        path.encode(), out.ctypes.data_as(ctypes.c_void_p), out.nbytes
    )
    if rc != 0:
        raise IOError(f"fastio read failed ({rc}): {path}")
    return out
