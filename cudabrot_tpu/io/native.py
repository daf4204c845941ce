"""ctypes bindings to the native C++ runtime core (csrc/tpubrot_native.cpp).

The reference's host runtime — byte-swapping image encode
(cudabrot.cu:563-571) and raw checkpoint IO (cudabrot.cu:215-280) — is C;
ours is a C++ shared library covering the host-side hot paths (a
20000x15000 render writes a 600 MB PGM and a 1.2 GB checkpoint) plus the
host orbit-replay engine (see csrc/tpubrot_native.cpp for why replay runs
on the host). Built lazily via `make -C csrc`; every entry point falls
back to the numpy implementation when the library is unavailable, so the
framework has no hard native dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_LOAD_FAILED = False

_PKG = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CSRC = os.path.join(os.path.dirname(_PKG), "csrc")
#: Wheel installs ship the library inside the package (setup.py builds it
#: there); repo checkouts build it lazily in csrc/.
_WHEEL_SO = os.path.join(_PKG, "libtpubrot_native.so")
_SO = _WHEEL_SO if os.path.exists(_WHEEL_SO) else os.path.join(
    _CSRC, "libtpubrot_native.so"
)


def _try_build() -> None:
    if os.path.exists(_SO) or not os.path.isdir(_CSRC):
        return
    try:
        subprocess.run(
            ["make", "-C", _CSRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except (OSError, subprocess.SubprocessError):
        pass


def _load() -> ctypes.CDLL | None:
    global _LIB, _LOAD_FAILED
    if _LIB is not None or _LOAD_FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _LOAD_FAILED:
            return _LIB
        _try_build()
        if not os.path.exists(_SO):
            _LOAD_FAILED = True
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _LOAD_FAILED = True
            return None
        lib.tpubrot_replay_scatter.restype = ctypes.c_int64
        lib.tpubrot_replay_scatter.argtypes = [
            ctypes.POINTER(ctypes.c_float),   # cr
            ctypes.POINTER(ctypes.c_float),   # ci
            ctypes.POINTER(ctypes.c_int32),   # iters
            ctypes.c_int64,                   # n
            ctypes.c_int32,                   # w
            ctypes.c_int32,                   # h
            ctypes.c_double,                  # min_real
            ctypes.c_double,                  # min_imag
            ctypes.c_double,                  # delta_real
            ctypes.c_double,                  # delta_imag
            ctypes.c_int32,                   # flags
            ctypes.c_int32,                   # num_threads
            ctypes.POINTER(ctypes.c_uint32),  # hist
            ctypes.POINTER(ctypes.c_uint64),  # points_total out
        ]
        lib.tpubrot_replay_scatter64.restype = ctypes.c_int64
        lib.tpubrot_replay_scatter64.argtypes = (
            lib.tpubrot_replay_scatter.argtypes[:-2]
            + [
                ctypes.POINTER(ctypes.c_uint64),  # hist (64-bit bins)
                ctypes.POINTER(ctypes.c_uint64),  # points_total out
            ]
        )
        # Double-precision sample entry points (extended-precision
        # deep-zoom replay). Guarded: a stale prebuilt library without
        # them must still load — engines probe via supports_f64().
        if hasattr(lib, "tpubrot_replay_scatter_f64"):
            lib.tpubrot_replay_scatter_f64.restype = ctypes.c_int64
            lib.tpubrot_replay_scatter_f64.argtypes = [
                ctypes.POINTER(ctypes.c_double),  # cr
                ctypes.POINTER(ctypes.c_double),  # ci
            ] + lib.tpubrot_replay_scatter.argtypes[2:]
            lib.tpubrot_replay_scatter_f64_64.restype = ctypes.c_int64
            lib.tpubrot_replay_scatter_f64_64.argtypes = (
                lib.tpubrot_replay_scatter_f64.argtypes[:-2]
                + [
                    ctypes.POINTER(ctypes.c_uint64),  # hist (64-bit bins)
                    ctypes.POINTER(ctypes.c_uint64),  # points_total out
                ]
            )
        lib.tpubrot_write_pgm16.restype = ctypes.c_int32
        lib.tpubrot_write_pgm16.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.tpubrot_write_file_atomic.restype = ctypes.c_int32
        lib.tpubrot_write_file_atomic.argtypes = [
            ctypes.c_char_p,
            ctypes.c_char_p,
            ctypes.c_uint64,
        ]
        lib.tpubrot_crc32.restype = ctypes.c_uint32
        lib.tpubrot_crc32.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def supports_f64() -> bool:
    """Whether the loaded library has the double-precision replay entry
    points (extended-precision deep-zoom renders need them; engines fall
    back to the df32 device replay otherwise)."""
    lib = _load()
    return lib is not None and hasattr(lib, "tpubrot_replay_scatter_f64")


def replay_scatter(
    cr: np.ndarray,
    ci: np.ndarray,
    iters: np.ndarray,
    hist: np.ndarray,
    *,
    width: int,
    height: int,
    min_real: float,
    min_imag: float,
    delta_real: float,
    delta_imag: float,
    burning_ship: bool = False,
    num_threads: int = 0,
    strict: bool = False,
) -> tuple[int, int]:
    """Replay known-escaping samples into ``hist`` ((h, w) uint32 or
    uint64, mutated in place — the dtype selects the native entry point).
    Returns (on_canvas_hits, total_points). Raises RuntimeError if the
    native library is unavailable — callers gate on available().

    ``strict`` selects the contraction-proof f32 orbit variant that
    bit-matches the Mosaic-compiled (TPU) classify kernels' stream; the
    default contracted variant bit-matches XLA's CPU emitter. Pass
    strict=True exactly when the payload was classified on TPU and the
    estimator couples kernel-side selection to replay deposits (canvas
    emit filter) — see csrc/tpubrot_native.cpp "strict" notes."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native replay library unavailable")
    flags = (1 if burning_ship else 0) | (2 if strict else 0)
    cr = np.ascontiguousarray(cr, np.float32)
    ci = np.ascontiguousarray(ci, np.float32)
    iters = np.ascontiguousarray(iters, np.int32)
    assert hist.dtype in (np.uint32, np.uint64) and hist.flags.c_contiguous
    if hist.dtype == np.uint64:
        points = ctypes.c_uint64(0)
        hits = lib.tpubrot_replay_scatter64(
            cr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ci.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            iters.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(cr),
            width,
            height,
            min_real,
            min_imag,
            delta_real,
            delta_imag,
            flags,
            num_threads,
            hist.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            ctypes.byref(points),
        )
        return int(hits), int(points.value)
    points = ctypes.c_uint64(0)
    hits = lib.tpubrot_replay_scatter(
        cr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ci.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        iters.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(cr),
        width,
        height,
        min_real,
        min_imag,
        delta_real,
        delta_imag,
        flags,
        num_threads,
        hist.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.byref(points),
    )
    return int(hits), int(points.value)


def replay_scatter_f64(
    cr: np.ndarray,
    ci: np.ndarray,
    iters: np.ndarray,
    hist: np.ndarray,
    *,
    width: int,
    height: int,
    min_real: float,
    min_imag: float,
    delta_real: float,
    delta_imag: float,
    burning_ship: bool = False,
    num_threads: int = 0,
) -> tuple[int, int]:
    """Double-precision replay_scatter for extended-precision deep-zoom
    renders: ``cr``/``ci`` are float64 sample values (reconstructed from
    the device's 24-bit sample-grid indices) and the orbit iteration and
    binning run entirely in hardware double. Same histogram/return
    contract as replay_scatter; callers gate on supports_f64()."""
    lib = _load()
    if lib is None or not hasattr(lib, "tpubrot_replay_scatter_f64"):
        raise RuntimeError("native f64 replay unavailable")
    cr = np.ascontiguousarray(cr, np.float64)
    ci = np.ascontiguousarray(ci, np.float64)
    iters = np.ascontiguousarray(iters, np.int32)
    assert hist.dtype in (np.uint32, np.uint64) and hist.flags.c_contiguous
    points = ctypes.c_uint64(0)
    fn = (
        lib.tpubrot_replay_scatter_f64_64
        if hist.dtype == np.uint64
        else lib.tpubrot_replay_scatter_f64
    )
    ptr_t = (
        ctypes.c_uint64 if hist.dtype == np.uint64 else ctypes.c_uint32
    )
    hits = fn(
        cr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ci.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        iters.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(cr),
        width,
        height,
        min_real,
        min_imag,
        delta_real,
        delta_imag,
        1 if burning_ship else 0,
        num_threads,
        hist.ctypes.data_as(ctypes.POINTER(ptr_t)),
        ctypes.byref(points),
    )
    return int(hits), int(points.value)


def write_pgm16(path: str, image: np.ndarray) -> bool:
    """Write a 16-bit PGM via the native core. Returns False to request the
    numpy fallback."""
    lib = _load()
    if lib is None:
        return False
    img = np.ascontiguousarray(image, dtype=np.uint16)
    h, w = img.shape
    rc = lib.tpubrot_write_pgm16(
        path.encode(),
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        w,
        h,
    )
    return rc == 0


def write_file_atomic(path: str, payload: bytes) -> bool:
    """Atomically (tmp + fsync + rename) write bytes via the native core."""
    lib = _load()
    if lib is None:
        return False
    rc = lib.tpubrot_write_file_atomic(path.encode(), payload, len(payload))
    return rc == 0


def crc32(payload: bytes) -> int | None:
    lib = _load()
    if lib is None:
        return None
    return int(lib.tpubrot_crc32(payload, len(payload)))
