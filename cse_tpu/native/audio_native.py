"""ctypes bindings for the native audio runtime (libcse_audio.so).

Auto-builds the shared library with make/g++ on first use (no pybind11 in
this image, so the C ABI + ctypes is the binding layer). All entry points are
mirrored by pure-Python fallbacks in cse_tpu.data.audio_io — the native path
is an accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libcse_audio.so")
_LIB = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR, "-s"], check=True, capture_output=True, timeout=120
        )
        return os.path.exists(_LIB_PATH)
    except Exception as e:
        print(f"[cse_tpu.native] build failed: {e}", file=sys.stderr)
        return False


def _stale() -> bool:
    """True when the checked-out sources are newer than the built .so —
    without this, a stale library silently keeps an OLD C ABI (ctypes has no
    signature checking, so extra arguments would just be ignored)."""
    try:
        so = os.path.getmtime(_LIB_PATH)
        return any(
            os.path.getmtime(os.path.join(_DIR, f)) > so
            for f in ("audio_io.cc", "Makefile")
        )
    except OSError:
        return True


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if (not os.path.exists(_LIB_PATH) or _stale()) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.cse_read_wav.restype = ctypes.c_int64
    lib.cse_read_wav.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.cse_wav_info.restype = ctypes.c_int64
    lib.cse_wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32)]
    lib.cse_batch_load.restype = ctypes.c_int32
    lib.cse_batch_load.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_float, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.cse_batch_load_ptrs.restype = ctypes.c_int32
    lib.cse_batch_load_ptrs.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_float, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.cse_write_wav.restype = ctypes.c_int32
    lib.cse_write_wav.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def read_wav(path: str):
    """Decode -> (float32 mono, sr); None if the native path can't handle it."""
    lib = _load()
    if lib is None:
        return None
    sr = ctypes.c_int32(0)
    n_total = lib.cse_wav_info(path.encode(), ctypes.byref(sr))
    if n_total < 0:
        return None
    buf = np.empty(max(n_total, 1), np.float32)
    got = lib.cse_read_wav(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        buf.size, ctypes.byref(sr),
    )
    if got <= 0 and n_total > 0:
        return None
    return buf[:got], int(sr.value)


def batch_load(
    paths: list[str], buf: np.ndarray, peak_target: float = 0.9, n_threads: int = 0,
    zero_tail: bool = True,
):
    """Parallel decode into buf [N, T] (C-contig float32).

    Returns (lengths [N] int32, sample_rates [N] int32). Rows that fail decode
    get length 0 (and are fully zeroed). peak_target <= 0 disables
    normalization. ``zero_tail=False`` skips zeroing past each decoded
    length — pass it ONLY for freshly allocated (np.zeros) destinations,
    where the pages past the data are zero-mapped already and touching them
    would dirty memory for nothing; with a reused buffer keep the default.
    """
    lib = _load()
    assert lib is not None, "native library unavailable"
    assert buf.dtype == np.float32 and buf.flags.c_contiguous
    n = len(paths)
    lens = np.zeros(n, np.int32)
    srs = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.cse_batch_load(
        arr, n, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), buf.shape[1],
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        srs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_float(peak_target), n_threads, int(zero_tail),
    )
    return lens, srs


def batch_load_rows(
    paths: list[str], rows: list[np.ndarray], peak_target: float = 0.9,
    n_threads: int = 0, zero_tail: bool = True,
):
    """Scatter form of :func:`batch_load`: file i decodes into ``rows[i]``, a
    1-D C-contiguous float32 view of a common length — so one call (and one
    thread pool spanning ALL files) can fill rows of SEVERAL destination
    arrays (mix/gt/noise...) in a single batch decode. Same length/sr/
    zero_tail semantics as :func:`batch_load`."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    n = len(paths)
    assert n == len(rows)
    width = rows[0].shape[0]
    ptrs = (ctypes.POINTER(ctypes.c_float) * n)()
    for i, r in enumerate(rows):
        assert (
            r.dtype == np.float32 and r.ndim == 1 and r.shape[0] == width
            and r.flags.c_contiguous
        ), f"row {i}: need C-contiguous float32 [*{width}]"
        ptrs[i] = r.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    lens = np.zeros(n, np.int32)
    srs = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.cse_batch_load_ptrs(
        arr, n, ptrs, width,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        srs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_float(peak_target), n_threads, int(zero_tail),
    )
    return lens, srs


def write_wav(path: str, x: np.ndarray, sr: int) -> bool:
    lib = _load()
    if lib is None:
        return False
    x = np.ascontiguousarray(x, np.float32)
    return bool(
        lib.cse_write_wav(
            path.encode(), x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            x.size, sr,
        )
    )
