"""ctypes bindings to the native C++ IO core (csrc/tpubrot_io.cpp).

The reference's runtime glue — byte-swapping image encode (cudabrot.cu:563-571)
and raw-buffer checkpoint IO (cudabrot.cu:215-280) — is C; ours is a small
C++ shared library for the host-side hot paths (a 20000x15000 render writes
a 600 MB PGM and a 1.2 GB checkpoint). Built lazily via `make -C csrc` or
`python setup.py build_ext`; every entry point silently falls back to the
numpy implementation when the library is unavailable, so the framework has
no hard native dependency.
"""

from __future__ import annotations

import ctypes
import os
import sysconfig
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_LOAD_FAILED = False


def _candidate_paths() -> list[str]:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    names = ["libtpubrot_io.so"]
    ext = sysconfig.get_config_var("EXT_SUFFIX")
    if ext:
        names.append(f"_tpubrot_io{ext}")
    paths = []
    for base in (os.path.join(root, "_native"), os.path.join(root, "..", "csrc")):
        for name in names:
            paths.append(os.path.join(base, name))
    return paths


def _load() -> ctypes.CDLL | None:
    global _LIB, _LOAD_FAILED
    if _LIB is not None or _LOAD_FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _LOAD_FAILED:
            return _LIB
        for path in _candidate_paths():
            if os.path.exists(path):
                try:
                    lib = ctypes.CDLL(path)
                except OSError:
                    continue
                lib.tpubrot_write_pgm16.restype = ctypes.c_int
                lib.tpubrot_write_pgm16.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_uint16),
                    ctypes.c_int,
                    ctypes.c_int,
                ]
                lib.tpubrot_write_file_atomic.restype = ctypes.c_int
                lib.tpubrot_write_file_atomic.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_char_p,
                    ctypes.c_uint64,
                ]
                lib.tpubrot_crc32.restype = ctypes.c_uint32
                lib.tpubrot_crc32.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_uint64,
                ]
                _LIB = lib
                return _LIB
        _LOAD_FAILED = True
        return None


def available() -> bool:
    return _load() is not None


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
    """Atomically (tmp + rename) write bytes via the native core."""
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
