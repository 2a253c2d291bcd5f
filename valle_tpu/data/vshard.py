"""Packed binary code/feature shards ("VSH1"/"VSF1") for the native loader.

Replaces HDF5 storage (ref /root/reference/valle/bin/tokenizer.py:193-214,
lhotse ``NumpyHdf5Writer``) with an mmap-friendly format the C++ loader
(native/loader/valle_loader.cc) reads zero-copy:

  [0:4)   magic b"VSH1" (int16 payload) | b"VSF1" (float16 payload)
  [4:8)   u32 num_records
  [8:12)  u32 num_quantizers Q (= feature dim for float shards)
  [12:..) index: per record u64 payload_offset, u32 num_frames
  payload: int16 codes / float16 features, row-major (T, Q)

VSH1 carries EnCodec codes; VSF1 carries BigVGAN log-mel features for the
Transformer TTS baseline (ref bin/tokenizer.py:148-149, --audio-extractor
Fbank).  Both payloads are 2 bytes/element, so the C++ gather path works on
either unchanged.  Keys live in the manifest (``"shard"`` file + integer
``"key"`` index), so the shard itself stays pure numeric data.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

MAGIC = b"VSH1"
MAGIC_F = b"VSF1"
_IDX = struct.Struct("<QI")


class VShardWriter:
    """Accumulates (T, Q) arrays, writes one packed shard on close."""

    def __init__(self, path: str | Path, num_quantizers: int,
                 dtype=np.int16):
        self.path = Path(path)
        self.num_q = int(num_quantizers)
        self.dtype = np.dtype(dtype)
        assert self.dtype in (np.int16, np.float16), self.dtype
        self._arrays: List[np.ndarray] = []

    def add(self, codes: np.ndarray) -> int:
        """Returns the record index of the added utterance."""
        codes = np.ascontiguousarray(codes, dtype=self.dtype)
        assert codes.ndim == 2 and codes.shape[1] == self.num_q, codes.shape
        self._arrays.append(codes)
        return len(self._arrays) - 1

    def close(self) -> None:
        n = len(self._arrays)
        magic = MAGIC_F if self.dtype == np.float16 else MAGIC
        header = magic + struct.pack("<II", n, self.num_q)
        offset = len(header) + n * _IDX.size
        index = bytearray()
        for a in self._arrays:
            index += _IDX.pack(offset, a.shape[0])
            offset += a.nbytes
        with open(self.path, "wb") as f:
            f.write(header)
            f.write(bytes(index))
            for a in self._arrays:
                f.write(a.tobytes())
        self._arrays = []

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class VShardReader:
    """Numpy mmap reader — fallback when the native lib is not built."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self._mm = np.memmap(self.path, dtype=np.uint8, mode="r")
        magic = bytes(self._mm[:4])
        if magic == MAGIC:
            self.dtype = np.dtype(np.int16)
        elif magic == MAGIC_F:
            self.dtype = np.dtype(np.float16)
        else:
            raise ValueError(f"{path}: not a VSH1/VSF1 shard")
        self.num_records, self.num_q = struct.unpack(
            "<II", bytes(self._mm[4:12])
        )
        raw = np.frombuffer(
            self._mm[12 : 12 + self.num_records * _IDX.size], dtype=np.uint8
        ).tobytes()
        self.offsets = np.empty(self.num_records, np.uint64)
        self.frames = np.empty(self.num_records, np.uint32)
        for i in range(self.num_records):
            self.offsets[i], self.frames[i] = _IDX.unpack_from(raw, i * _IDX.size)

    def __len__(self) -> int:
        return self.num_records

    def __getitem__(self, i: int) -> np.ndarray:
        off, t = int(self.offsets[i]), int(self.frames[i])
        nbytes = t * self.num_q * 2
        raw = np.frombuffer(
            self._mm[off : off + nbytes], dtype=self.dtype
        ).reshape(t, self.num_q)
        if self.dtype == np.float16:
            return raw.astype(np.float32)
        return raw.astype(np.int64)


def write_shard(path: str | Path, arrays: List[np.ndarray], num_q: int,
                dtype=np.int16) -> None:
    with VShardWriter(path, num_q, dtype=dtype) as w:
        for a in arrays:
            w.add(a)
