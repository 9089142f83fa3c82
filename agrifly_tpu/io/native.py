"""ctypes bindings for the native host runtime (native/wire_runtime.cpp).

Builds the shared library on first use (g++ -O3 -shared); falls back to
the pure-numpy codecs in io.radio / io.telemetry when no compiler is
available, so the framework stays importable everywhere. The native path
is the hot host-side IO: batch radio/telemetry byte codecs and the
buffered CSV logger used by the bridge and log writers.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "wire_runtime.cpp"
_LIB = _REPO_ROOT / "native" / "libwire_runtime.so"

_lib = None
_tried = False


def _build():
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC), "-o", str(_LIB)],
        check=True, capture_output=True,
    )


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_LIB))
    except Exception:
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u16p = ctypes.POINTER(ctypes.c_uint16)

    lib.af_radio_encode_rates.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_uint8, u8p]
    lib.af_radio_encode_position.argtypes = [f32p, f32p, f32p, ctypes.c_int, ctypes.c_uint8, u8p]
    lib.af_radio_encode_simple.argtypes = [ctypes.c_uint8, ctypes.c_int, ctypes.c_uint8, u8p]
    lib.af_radio_decode.argtypes = [u8p, ctypes.c_int, i32p, i32p, f32p]
    lib.af_telemetry_pack.argtypes = [u8p, u8p, u16p, ctypes.c_int, u8p]
    lib.af_telemetry_unpack.argtypes = [u8p, ctypes.c_int, u8p, u8p, u16p]
    lib.af_logger_open.restype = ctypes.c_void_p
    lib.af_logger_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.af_logger_write_rows.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int]
    lib.af_logger_close.argtypes = [ctypes.c_void_p]

    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def radio_encode_rates(thrust: np.ndarray, angvel: np.ndarray, flags=0) -> np.ndarray:
    """(N,), (N,3) -> (N, 23) uint8 packets."""
    lib = get_lib()
    thrust = np.ascontiguousarray(thrust, np.float32)
    angvel = np.ascontiguousarray(angvel, np.float32)
    n = thrust.shape[0]
    out = np.zeros((n, 23), np.uint8)
    lib.af_radio_encode_rates(
        _ptr(thrust, ctypes.c_float), _ptr(angvel, ctypes.c_float), n, flags,
        _ptr(out, ctypes.c_uint8),
    )
    return out


def radio_decode(raw: np.ndarray):
    """(N, 23) uint8 -> (types (N,), flags (N,), floats (N, 10))."""
    lib = get_lib()
    raw = np.ascontiguousarray(raw, np.uint8)
    n = raw.shape[0]
    types = np.zeros(n, np.int32)
    flags = np.zeros(n, np.int32)
    floats = np.zeros((n, 10), np.float32)
    lib.af_radio_decode(
        _ptr(raw, ctypes.c_uint8), n, _ptr(types, ctypes.c_int32),
        _ptr(flags, ctypes.c_int32), _ptr(floats, ctypes.c_float),
    )
    return types, flags, floats


def telemetry_pack(types: np.ndarray, numbers: np.ndarray, data: np.ndarray) -> np.ndarray:
    lib = get_lib()
    types = np.ascontiguousarray(types, np.uint8)
    numbers = np.ascontiguousarray(numbers, np.uint8)
    data = np.ascontiguousarray(data, np.uint16)
    n = types.shape[0]
    out = np.zeros((n, 30), np.uint8)
    lib.af_telemetry_pack(
        _ptr(types, ctypes.c_uint8), _ptr(numbers, ctypes.c_uint8),
        _ptr(data, ctypes.c_uint16), n, _ptr(out, ctypes.c_uint8),
    )
    return out


def telemetry_unpack(raw: np.ndarray):
    lib = get_lib()
    raw = np.ascontiguousarray(raw, np.uint8)
    n = raw.shape[0]
    types = np.zeros(n, np.uint8)
    numbers = np.zeros(n, np.uint8)
    data = np.zeros((n, 14), np.uint16)
    lib.af_telemetry_unpack(
        _ptr(raw, ctypes.c_uint8), n, _ptr(types, ctypes.c_uint8),
        _ptr(numbers, ctypes.c_uint8), _ptr(data, ctypes.c_uint16),
    )
    return types, numbers, data


class NativeCsvLogger:
    """Buffered CSV writer backed by the C++ logger (falls back to python)."""

    def __init__(self, path, header: str):
        self._lib = get_lib()
        self._handle = None
        self._file = None
        if self._lib is not None:
            self._handle = self._lib.af_logger_open(
                str(path).encode(), header.encode()
            )
        if self._handle is None:
            self._file = open(path, "w", buffering=1 << 20)
            if header:
                self._file.write(header + "\n")

    def write_rows(self, rows: np.ndarray):
        rows = np.ascontiguousarray(np.atleast_2d(rows), np.float64)
        if self._handle is not None:
            self._lib.af_logger_write_rows(
                self._handle, rows.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                rows.shape[0], rows.shape[1],
            )
        else:
            for r in rows:
                self._file.write(",".join(f"{v:.9g}" for v in r) + "\n")

    def close(self):
        if self._handle is not None:
            self._lib.af_logger_close(self._handle)
            self._handle = None
        if self._file is not None:
            self._file.close()
            self._file = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
