"""ctypes bindings for the C++ host-runtime library (native/src).

Auto-builds ``libslode_native.so`` with the repo Makefile on first import if
missing/stale; all consumers degrade gracefully to the pure-Python paths when
the toolchain is unavailable (``lib() is None``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libslode_native.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "src", "slode_native.cc")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on demand; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    have_src = os.path.exists(_SRC_PATH)
    stale = not os.path.exists(_SO_PATH) or (
        have_src and os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC_PATH)
    )
    if stale and (not have_src or not _build()):
        return None  # e.g. installed wheel without the native/ source tree
    try:
        L = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    L.slode_proc_parse.restype = ctypes.c_void_p
    L.slode_proc_parse.argtypes = [ctypes.c_char_p] * 4
    L.slode_proc_rows.restype = ctypes.c_int64
    L.slode_proc_rows.argtypes = [ctypes.c_void_p]
    L.slode_proc_times_len.restype = ctypes.c_int64
    L.slode_proc_times_len.argtypes = [ctypes.c_void_p]
    L.slode_proc_error.restype = ctypes.c_char_p
    L.slode_proc_error.argtypes = [ctypes.c_void_p]
    L.slode_proc_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 4
    L.slode_proc_free.argtypes = [ctypes.c_void_p]
    L.slode_pack_epoch.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_void_p,
    ]
    _lib = L
    return _lib


def parse_proc_csv_native(path: str, devices, conditions, signals):
    """Native plate-reader CSV parse. Returns (device_idx, treatments, times,
    observations) like data/proc.parse_file, or None if lib unavailable /
    no rows kept."""
    L = lib()
    if L is None:
        return None
    h = L.slode_proc_parse(
        path.encode(),
        ";".join(devices).encode(),
        ";".join(conditions).encode(),
        ";".join(signals).encode(),
    )
    if not h:
        return None
    try:
        err = L.slode_proc_error(h)
        if err:
            raise ValueError(f"native CSV parse failed for {path}: {err.decode()}")
        n = L.slode_proc_rows(h)
        T = L.slode_proc_times_len(h)
        if n == 0:
            return None
        S, C = len(signals), len(conditions)
        obs = np.empty((n, S, T), dtype=np.float32)
        treat = np.empty((n, C), dtype=np.float32)
        dev = np.empty((n,), dtype=np.int32)
        times = np.empty((T,), dtype=np.float32)
        L.slode_proc_fill(
            h,
            obs.ctypes.data_as(ctypes.c_void_p),
            treat.ctypes.data_as(ctypes.c_void_p),
            dev.ctypes.data_as(ctypes.c_void_p),
            times.ctypes.data_as(ctypes.c_void_p),
        )
        return dev.astype(int), treat, times, obs
    finally:
        L.slode_proc_free(h)


def pack_epoch_native(src: np.ndarray, perm: np.ndarray, padded_rows: int):
    """Gather rows of ``src`` by ``perm`` (negative = zero row) natively.
    Returns the packed array or None if lib unavailable."""
    L = lib()
    if L is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.float32)
    perm = np.ascontiguousarray(perm, dtype=np.int32)
    row_elems = int(np.prod(src.shape[1:])) if src.ndim > 1 else 1
    dst = np.empty((padded_rows,) + src.shape[1:], dtype=np.float32)
    L.slode_pack_epoch(
        src.ctypes.data_as(ctypes.c_void_p),
        src.shape[0],
        row_elems,
        perm.ctypes.data_as(ctypes.c_void_p),
        padded_rows,
        dst.ctypes.data_as(ctypes.c_void_p),
    )
    return dst
