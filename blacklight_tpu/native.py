"""ctypes bindings to the native host-IO library (native/blio.cpp).

The compute path is JAX/XLA; this covers the C++ host runtime the
reference implements natively: snapshot repack loops
(simulation_reader.cpp:782-850) and the ZIP CRC32 (zip_format.cpp:289-362).
Every entry point has a NumPy fallback, so the package works without the
shared library; `ensure_built()` compiles it on demand with g++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libblio.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def ensure_built(quiet: bool = True) -> bool:
    """Build the library if missing; returns availability."""
    global _tried
    if os.path.exists(_LIB_PATH):
        return True
    if not os.path.isdir(_NATIVE_DIR):
        return False
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR],
                       capture_output=quiet, check=True)
    except (OSError, subprocess.CalledProcessError):
        return False
    return os.path.exists(_LIB_PATH)


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not ensure_built():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.blio_crc32.restype = ctypes.c_uint32
        lib.blio_crc32.argtypes = [
            ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint32]
        lib.blio_repack_table.restype = None
        lib.blio_repack_table.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        lib.blio_scale_slice.restype = None
        lib.blio_scale_slice.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_float]
        lib.blio_f64_to_f32.restype = None
        lib.blio_f64_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        _lib = lib
        return _lib


def crc32(data, seed: int = 0) -> int:
    """Running CRC-32 of a bytes-like / array buffer (native OpenMP
    slicing-by-8, zlib fallback). `seed` is the CRC of preceding bytes,
    enabling chaining across buffers."""
    buf = np.ascontiguousarray(np.frombuffer(
        data if isinstance(data, (bytes, bytearray, memoryview))
        else np.ascontiguousarray(data).tobytes(), dtype=np.uint8))
    lib = get_lib()
    if lib is not None:
        return int(lib.blio_crc32(buf.ctypes.data, buf.size,
                                  ctypes.c_uint32(seed)))
    import zlib
    return zlib.crc32(buf.tobytes(), seed) & 0xFFFFFFFF


def repack_table(table: np.ndarray, col0: int, nvar: int) -> np.ndarray:
    """(n1, n2, n3, ncol) float32 -> (nvar, n3, n2, n1) float32 selecting
    columns [col0, col0+nvar) - the iharm3d/harm3d ingest transpose."""
    table = np.ascontiguousarray(table, dtype=np.float32)
    n1, n2, n3, ncol = table.shape
    lib = get_lib()
    if lib is None:
        return np.ascontiguousarray(
            table[..., col0:col0 + nvar].transpose(3, 2, 1, 0))
    out = np.empty((nvar, n3, n2, n1), dtype=np.float32)
    lib.blio_repack_table(table.ctypes.data, out.ctypes.data,
                          n1, n2, n3, ncol, col0, nvar)
    return out


def scale_slice(prim: np.ndarray, var: int, factor: float) -> None:
    """In-place prim[var] *= factor (eint -> pgas style unit fixups on the
    freshly repacked (nvar, ...) table; simulation_reader.cpp:581-587)."""
    lib = get_lib()
    if (lib is None or prim.dtype != np.float32
            or not prim.flags["C_CONTIGUOUS"]):
        prim[var] *= prim.dtype.type(factor)
        return
    cells = int(prim.size // prim.shape[0])
    lib.blio_scale_slice(prim.ctypes.data, var, cells, ctypes.c_float(factor))


def f64_to_f32(arr: np.ndarray) -> np.ndarray:
    arr = np.ascontiguousarray(arr, dtype=np.float64)
    lib = get_lib()
    if lib is None:
        return arr.astype(np.float32)
    out = np.empty(arr.shape, dtype=np.float32)
    lib.blio_f64_to_f32(arr.ctypes.data, out.ctypes.data, arr.size)
    return out
