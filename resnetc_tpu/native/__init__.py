"""ctypes bindings for the native runtime helpers.

Loads ``libresnetc_native.so`` (built by ``make -C resnetc_tpu/native``;
auto-built on first import when a toolchain is present).  Pure-Python
fallbacks exist for every entry point — ``native.available()`` says which
path is live — so the framework works without a compiler, just slower on
the host-side hot paths:

- JPEG decode + preprocess (batch, threaded)     <- data/preprocess, loader
- raw-f32 checkpoint file IO (parallel slurp)    <- checkpoint
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libresnetc_native.so"
_lib: ctypes.CDLL | None = None


def _try_build() -> None:
    try:
        subprocess.run(
            ["make", "-C", str(_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        pass


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    # Always invoke make (not only when the .so is missing): it is a no-op
    # when objects are newer than sources, and it rebuilds a stale .so after
    # a .cpp edit — otherwise an existing binary would silently win over
    # edited sources.  Artifacts are .gitignored (built with -march=native,
    # so a checked-in binary could SIGILL on a different host).
    if os.environ.get("RESNETC_NO_NATIVE_BUILD") != "1":
        _try_build()
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    lib.rn_preprocess_file.restype = ctypes.c_int
    lib.rn_preprocess_file.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.rn_preprocess_batch.restype = ctypes.c_int
    lib.rn_preprocess_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.rn_file_size.restype = ctypes.c_int64
    lib.rn_file_size.argtypes = [ctypes.c_char_p]
    lib.rn_read_f32.restype = ctypes.c_int64
    lib.rn_read_f32.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64
    ]
    lib.rn_write_f32.restype = ctypes.c_int
    lib.rn_write_f32.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64
    ]
    lib.rn_read_f32_many.restype = ctypes.c_int
    lib.rn_read_f32_many.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def preprocess_files(
    paths: list[str],
    *,
    resize: int,
    crop: int,
    mean: np.ndarray,
    std: np.ndarray,
    num_threads: int = 4,
) -> np.ndarray:
    """Decode+preprocess a batch of JPEGs -> (N, crop, crop, 3) float32 NHWC."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    n = len(paths)
    out = np.empty((n, crop, crop, 3), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    rc = lib.rn_preprocess_batch(
        c_paths, n, resize, crop, _fptr(mean), _fptr(std), _fptr(out), num_threads
    )
    if rc != 0:
        raise ValueError(f"native preprocess failed (code {rc}) on batch {paths[:3]}...")
    return out


def read_f32(path: str, num_elems: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    out = np.empty((num_elems,), np.float32)
    got = lib.rn_read_f32(path.encode(), _fptr(out), num_elems)
    if got < 0:
        raise ValueError(f"native read_f32 failed (code {got}): {path}")
    if got != num_elems:
        raise ValueError(f"{path}: {got} elems, expected {num_elems}")
    return out


def write_f32(path: str, data: np.ndarray) -> None:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    data = np.ascontiguousarray(data, np.float32).ravel()
    rc = lib.rn_write_f32(path.encode(), _fptr(data), data.size)
    if rc != 0:
        raise ValueError(f"native write_f32 failed (code {rc}): {path}")


def read_f32_many(
    paths: list[str], num_elems: list[int], *, num_threads: int = 8
) -> list[np.ndarray]:
    """Parallel-load many raw-f32 files; returns one array per file."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not available")
    n = len(paths)
    offsets = np.zeros(n, np.int64)
    total = 0
    for i, ne in enumerate(num_elems):
        offsets[i] = total
        total += ne
    arena = np.empty((total,), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.rn_read_f32_many(
        c_paths,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        np.asarray(num_elems, np.int64).ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        _fptr(arena),
        num_threads,
    )
    if rc != 0:
        raise ValueError(f"native read_f32_many failed (code {rc})")
    return [
        arena[offsets[i] : offsets[i] + num_elems[i]] for i in range(n)
    ]
