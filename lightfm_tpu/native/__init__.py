"""Loader for the native ingest engine (see ingest.cpp).

Compiles ``ingest.cpp`` with the system C++ compiler on first use (cached as
a shared object next to the source, keyed by source mtime) and binds it via
ctypes.  Everything degrades gracefully: if no compiler is available the
package works identically through the pure-Python paths — ``AVAILABLE`` is
the feature flag callers check.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "ingest.cpp")

AVAILABLE = False
_lib = None


def _so_path() -> str:
    return os.path.join(_DIR, "_ingest.so")


def _build() -> str:
    so = _so_path()
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(_SRC):
        return so
    # Build to a temp name then rename: atomic for concurrent importers.
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)
        return so
    except Exception:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def _load():
    global _lib, AVAILABLE
    if _lib is not None:
        return _lib
    try:
        lib = ctypes.CDLL(_build())
    except Exception:
        AVAILABLE = False
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)

    lib.lf_map_ids.restype = ctypes.c_int64
    lib.lf_map_ids.argtypes = [i64p, ctypes.c_int64, i64p, ctypes.c_int64, i64p]
    lib.lf_lookup_ids.restype = ctypes.c_int64
    lib.lf_lookup_ids.argtypes = [i64p, ctypes.c_int64, i64p, ctypes.c_int64, i32p]
    lib.lf_parse_interactions.restype = ctypes.c_int64
    lib.lf_parse_interactions.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char, i64p, i64p, f32p,
    ]
    lib.lf_count_lines.restype = ctypes.c_int64
    lib.lf_count_lines.argtypes = [ctypes.c_char_p, ctypes.c_int64]

    _lib = lib
    AVAILABLE = True
    return lib


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def map_ids(existing: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """New unique ids of ``ids`` in first-seen order, given ``existing``
    already-mapped ids (also first-seen order).  int64 in, int64 out."""
    lib = _load()
    existing = np.ascontiguousarray(existing, dtype=np.int64)
    ids = np.ascontiguousarray(ids, dtype=np.int64)
    out = np.empty(len(ids), dtype=np.int64)
    n_new = lib.lf_map_ids(
        _ptr(existing, ctypes.c_int64), len(existing),
        _ptr(ids, ctypes.c_int64), len(ids),
        _ptr(out, ctypes.c_int64),
    )
    return out[:n_new]


def lookup_ids(mapping_keys: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Dense indices of ``keys`` within ``mapping_keys`` (first-seen order
    defines the index); -1 where missing."""
    lib = _load()
    mapping_keys = np.ascontiguousarray(mapping_keys, dtype=np.int64)
    keys = np.ascontiguousarray(keys, dtype=np.int64)
    out = np.empty(len(keys), dtype=np.int32)
    lib.lf_lookup_ids(
        _ptr(mapping_keys, ctypes.c_int64), len(mapping_keys),
        _ptr(keys, ctypes.c_int64), len(keys),
        _ptr(out, ctypes.c_int32),
    )
    return out


def parse_interactions(data: bytes, delim: bytes = b"\t"):
    """Parse ``uid<delim>iid[<delim>value...]`` lines to numpy arrays.

    Returns ``(uids int64, iids int64, values float32)``; malformed lines
    are skipped; a missing value field parses as 1.0.
    """
    lib = _load()
    n_max = lib.lf_count_lines(data, len(data))
    uids = np.empty(n_max, dtype=np.int64)
    iids = np.empty(n_max, dtype=np.int64)
    vals = np.empty(n_max, dtype=np.float32)
    n = lib.lf_parse_interactions(
        data, len(data), ctypes.c_char(delim),
        _ptr(uids, ctypes.c_int64), _ptr(iids, ctypes.c_int64),
        _ptr(vals, ctypes.c_float),
    )
    return uids[:n], iids[:n], vals[:n]


# Try to build/load eagerly but never fail the import.
try:  # pragma: no cover - environment dependent
    _load()
except Exception:  # noqa: BLE001
    AVAILABLE = False
