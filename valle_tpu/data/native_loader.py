"""ctypes binding for the native C++ loader (native/loader/valle_loader.cc).

Gives the data pipeline a native gather/pad/prefetch path — the TPU-side
replacement for the reference's torch DataLoader worker processes
(ref /root/reference/valle/data/datamodule.py:336-343).  Built lazily with
g++ on first use (cached in native/lib/); everything degrades to the numpy
VShardReader fallback when no compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_REPO = Path(__file__).resolve().parents[2]
_PKG_NATIVE = Path(__file__).resolve().parent / "_native"
if (_REPO / "native" / "loader" / "valle_loader.cc").exists():
    # repo checkout: build from native/ into native/lib/
    _LIB_PATH = _REPO / "native" / "lib" / "libvalle_data.so"
    _SRC = _REPO / "native" / "loader" / "valle_loader.cc"
else:
    # installed wheel: setup.py ships source (and usually a prebuilt .so)
    # as package data under valle_tpu/data/_native/
    _LIB_PATH = _PKG_NATIVE / "libvalle_data.so"
    _SRC = _PKG_NATIVE / "valle_loader.cc"
_lib = None
_lib_failed = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if not _SRC.exists() and not _LIB_PATH.exists():
        logging.info("native loader source not found; numpy fallback")
        _lib_failed = True
        return None
    if not _LIB_PATH.exists() or (
        _SRC.exists() and _SRC.stat().st_mtime > _LIB_PATH.stat().st_mtime
    ):
        try:
            _LIB_PATH.parent.mkdir(parents=True, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                 "-fPIC", "-pthread", str(_SRC), "-o", str(_LIB_PATH)],
                check=True, capture_output=True,
            )
        except Exception as e:  # no compiler / build error -> fallback
            logging.info(f"native loader unavailable ({e}); numpy fallback")
            _lib_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:
        logging.info(f"native loader dlopen failed ({e}); numpy fallback")
        _lib_failed = True
        return None
    lib.vl_open.restype = ctypes.c_void_p
    lib.vl_open.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32]
    lib.vl_close.argtypes = [ctypes.c_void_p]
    lib.vl_num_records.restype = ctypes.c_int64
    lib.vl_num_records.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.vl_record_frames.restype = ctypes.c_int32
    lib.vl_record_frames.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int64]
    lib.vl_num_quantizers.restype = ctypes.c_int32
    lib.vl_num_quantizers.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.vl_gather_pad.argtypes = [
        ctypes.c_void_p, i32p, i64p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, i32p, i32p]
    lib.vl_pool_create.restype = ctypes.c_void_p
    lib.vl_pool_create.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.vl_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.vl_pool_submit.restype = ctypes.c_int64
    lib.vl_pool_submit.argtypes = [
        ctypes.c_void_p, i32p, i64p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32]
    lib.vl_pool_wait.restype = ctypes.c_int32
    lib.vl_pool_wait.argtypes = [ctypes.c_void_p, ctypes.c_int64, i32p, i32p]
    _lib = lib
    return lib


def available() -> bool:
    return _load_lib() is not None


class NativeShardSet:
    """A set of VSH1 shards opened by the C++ loader.

    ``gather_pad`` produces the padded int32 (N, max_t, Q) batch tensor the
    train step consumes, with per-utterance lengths; ``submit``/``wait`` run
    the same through the background worker pool for prefetching.
    """

    def __init__(self, paths: Sequence[str | Path], n_threads: int = 4):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native loader not available")
        self._lib = lib
        self.paths = [str(p) for p in paths]
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths]
        )
        self._h = lib.vl_open(arr, len(self.paths))
        if not self._h:
            raise OSError(f"vl_open failed for {self.paths}")
        self._pool = lib.vl_pool_create(self._h, n_threads)
        self._pending = {}

    def num_records(self, shard: int) -> int:
        return int(self._lib.vl_num_records(self._h, shard))

    def record_frames(self, shard: int, rec: int) -> int:
        return int(self._lib.vl_record_frames(self._h, shard, rec))

    def num_quantizers(self, shard: int = 0) -> int:
        return int(self._lib.vl_num_quantizers(self._h, shard))

    def gather_pad(
        self,
        shard_idx: Sequence[int],
        rec_idx: Sequence[int],
        max_t: int,
        num_q: int,
    ):
        n = len(shard_idx)
        si = np.ascontiguousarray(shard_idx, np.int32)
        ri = np.ascontiguousarray(rec_idx, np.int64)
        codes = np.empty((n, max_t, num_q), np.int32)
        lens = np.empty((n,), np.int32)
        self._lib.vl_gather_pad(self._h, si, ri, n, max_t, num_q, codes, lens)
        return codes, lens

    def submit(
        self,
        shard_idx: Sequence[int],
        rec_idx: Sequence[int],
        max_t: int,
        num_q: int,
    ) -> int:
        n = len(shard_idx)
        si = np.ascontiguousarray(shard_idx, np.int32)
        ri = np.ascontiguousarray(rec_idx, np.int64)
        jid = self._lib.vl_pool_submit(self._pool, si, ri, n, max_t, num_q)
        self._pending[jid] = (n, max_t, num_q)
        return jid

    def wait(self, job_id: int):
        n, max_t, num_q = self._pending.pop(job_id)
        codes = np.empty((n, max_t, num_q), np.int32)
        lens = np.empty((n,), np.int32)
        rc = self._lib.vl_pool_wait(self._pool, job_id, codes, lens)
        if rc != 0:
            raise RuntimeError(f"unknown native job {job_id}")
        return codes, lens

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.vl_pool_destroy(self._pool)
            self._lib.vl_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
