"""Host-side bitstream coding: ctypes binding for the first-party C++ range
coder plus helpers that turn device latents + entropy-model tables into real
bitstreams.

Replaces torchac / compressai-_CXX in the reference (SURVEY.md §2.9). The
device computes quantized symbols and per-symbol table indexes; everything
here runs on host threads so the TPU never blocks on arithmetic coding
(reference `entropy_trick`, entropy_models.py:278-290, generalized: ONE
coder call per tensor regardless of batch).
"""

from __future__ import annotations

import contextlib
import ctypes
import os
import subprocess
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "range_coder.cc")
_LIB_PATH = os.path.join(_HERE, "librangecoder.so")
_lock = threading.Lock()
_lib = None


def _build_library() -> str:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def get_lib():
    global _lib
    with _lock:
        if _lib is None:
            if (not os.path.exists(_LIB_PATH)) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
            ):
                _build_library()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.rc_encode_with_indexes.restype = ctypes.c_long
            lib.rc_encode_with_indexes.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_long,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ]
            lib.rc_decode_with_indexes.restype = ctypes.c_long
            lib.rc_decode_with_indexes.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_long,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            _lib = lib
    return _lib


def _i32(a):
    return np.ascontiguousarray(a, dtype=np.int32)


# --- AC-time accounting -----------------------------------------------------
# The reference's compress_slow/decompress_slow report network time and
# arithmetic-coding time separately (entropy_models.py:97-148). Every range-
# coder invocation below adds its wall-clock to the active measure_ac_time()
# scope, so any compress/decompress path gets an honest net-vs-AC split
# without threading timers through each codec. The accumulator is process-
# global (NOT thread-local): AsyncCoder runs the coder on pool threads, and
# their time must land in the scope opened by the dispatching thread.

_AC_ACC = {"acc": None}
_ac_lock = threading.Lock()


@contextlib.contextmanager
def measure_ac_time():
    """Context manager yielding a dict whose 'seconds' accumulates the time
    spent inside the C++ range coder while the scope is active (including
    on AsyncCoder worker threads)."""
    acc = {"seconds": 0.0}
    prev = _AC_ACC["acc"]
    _AC_ACC["acc"] = acc
    try:
        yield acc
    finally:
        _AC_ACC["acc"] = prev


def _ac_tick(dt: float):
    acc = _AC_ACC["acc"]
    if acc is not None:
        with _ac_lock:
            acc["seconds"] += dt


def encode_with_indexes(
    symbols: np.ndarray,
    indexes: np.ndarray,
    cdfs: np.ndarray,
    cdf_lengths: np.ndarray,
    offsets: np.ndarray,
) -> bytes:
    """symbols/indexes: flat int arrays of equal length; cdfs [R, stride]
    uint32 cumulative tables (sum 2^16); returns the bitstream."""
    lib = get_lib()
    symbols = _i32(symbols.ravel())
    indexes = _i32(indexes.ravel())
    assert symbols.shape == indexes.shape
    cdfs = np.ascontiguousarray(cdfs, dtype=np.uint32)
    cdf_lengths = _i32(cdf_lengths)
    offsets = _i32(offsets)
    n = symbols.size
    cap = max(n * 6 + 1024, 4096)
    out = np.empty(cap, dtype=np.uint8)
    t0 = time.perf_counter()
    written = lib.rc_encode_with_indexes(
        symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        indexes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        cdfs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        cdfs.shape[1],
        cdf_lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap,
    )
    _ac_tick(time.perf_counter() - t0)
    if written < 0:
        raise RuntimeError("range coder output buffer too small")
    return out[:written].tobytes()


def decode_with_indexes(
    data: bytes,
    indexes: np.ndarray,
    cdfs: np.ndarray,
    cdf_lengths: np.ndarray,
    offsets: np.ndarray,
) -> np.ndarray:
    """Inverse of encode_with_indexes; returns int32 symbols shaped like
    `indexes`."""
    lib = get_lib()
    shape = indexes.shape
    indexes = _i32(indexes.ravel())
    cdfs = np.ascontiguousarray(cdfs, dtype=np.uint32)
    cdf_lengths = _i32(cdf_lengths)
    offsets = _i32(offsets)
    n = indexes.size
    out = np.empty(n, dtype=np.int32)
    buf = np.frombuffer(data, dtype=np.uint8)
    t0 = time.perf_counter()
    lib.rc_decode_with_indexes(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.size,
        indexes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        cdfs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        cdfs.shape[1],
        cdf_lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    _ac_tick(time.perf_counter() - t0)
    return out.reshape(shape)


class AsyncCoder:
    """Small host thread pool so entropy coding overlaps device compute
    (SURVEY.md §7 'Serial entropy coding vs TPU'). Submit per-GOP encode
    jobs; futures resolve to bitstreams. coder.video's lsvc_compress codes
    tree layer k's symbols while the device reconstructs layer k+1."""

    def __init__(self, workers: int = 2):
        self.pool = ThreadPoolExecutor(max_workers=workers)

    def submit(self, fn, *args, **kwargs):
        """Run any host-side codec call (e.g. LaplaceCodec.compress) off
        the dispatch thread."""
        return self.pool.submit(fn, *args, **kwargs)

    def submit_encode(self, *args, **kwargs):
        return self.pool.submit(encode_with_indexes, *args, **kwargs)

    def submit_decode(self, *args, **kwargs):
        return self.pool.submit(decode_with_indexes, *args, **kwargs)

    def shutdown(self):
        self.pool.shutdown(wait=True)
