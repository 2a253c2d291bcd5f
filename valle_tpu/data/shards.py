"""Tokenized-dataset storage: jsonl.gz manifests + HDF5 code shards.

Replaces the reference's lhotse CutSet manifests + ``NumpyHdf5Writer``
(ref /root/reference/valle/bin/tokenizer.py:193-214).  A dataset directory
holds:

  manifest_<split>.jsonl.gz   one JSON object per utterance:
      {"id", "text", "tokens": [phoneme symbols], "duration": seconds,
       "shard": "codes_000.h5", "key": "<id>"}
  codes_<nnn>.h5              int16 (T, Q) EnCodec code arrays per utterance
  unique_text_tokens.k2symbols   symbol table (ref tokenizer.py:247-254)
"""

from __future__ import annotations

import gzip
import json
from pathlib import Path
from typing import Dict, Iterator, List, Optional

import h5py
import numpy as np


class CodeShardWriter:
    def __init__(self, out_dir: str | Path, prefix: str = "codes",
                 max_per_shard: int = 50000):
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.prefix = prefix
        self.max_per_shard = max_per_shard
        self._shard_idx = -1
        self._count = 0
        self._h5: Optional[h5py.File] = None
        self._open_next()

    def _open_next(self):
        if self._h5 is not None:
            self._h5.close()
        self._shard_idx += 1
        self._count = 0
        self._path = self.out_dir / f"{self.prefix}_{self._shard_idx:03d}.h5"
        self._h5 = h5py.File(self._path, "w")

    def write(self, key: str, codes: np.ndarray) -> str:
        """codes (T, Q) -> returns the shard filename holding this key."""
        if self._count >= self.max_per_shard:
            self._open_next()
        self._h5.create_dataset(key, data=codes.astype(np.int16))
        self._count += 1
        return self._path.name

    def close(self):
        if self._h5 is not None:
            self._h5.close()
            self._h5 = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


class Manifest:
    """List of utterance records with lazy code loading."""

    def __init__(self, records: List[Dict], root: Path):
        self.records = records
        self.root = Path(root)
        self._open: Dict[str, h5py.File] = {}

    @staticmethod
    def load(path: str | Path) -> "Manifest":
        path = Path(path)
        records = []
        with gzip.open(path, "rt", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if line:
                    records.append(json.loads(line))
        return Manifest(records, path.parent)

    @staticmethod
    def save(records: Iterator[Dict], path: str | Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with gzip.open(path, "wt", encoding="utf-8") as f:
            for r in records:
                f.write(json.dumps(r, ensure_ascii=False) + "\n")

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, i: int) -> Dict:
        return self.records[i]

    def codes(self, i: int) -> np.ndarray:
        r = self.records[i]
        shard = r["shard"]
        if shard not in self._open:
            self._open[shard] = h5py.File(self.root / shard, "r")
        return np.asarray(self._open[shard][r["key"]], dtype=np.int64)

    def durations(self) -> np.ndarray:
        return np.array([r["duration"] for r in self.records], np.float64)

    def describe(self) -> str:
        """Corpus statistics (ref bin/display_manifest_statistics.py)."""
        durs = self.durations()
        lines = [
            f"Cuts count: {len(self)}",
            f"Total duration (hh:mm:ss): {_fmt_secs(durs.sum())}",
            "Speech duration statistics:",
            f"  mean\t{durs.mean():.1f}",
            f"  std\t{durs.std():.1f}",
            f"  min\t{durs.min():.1f}",
            f"  25%\t{np.percentile(durs, 25):.1f}",
            f"  50%\t{np.percentile(durs, 50):.1f}",
            f"  75%\t{np.percentile(durs, 75):.1f}",
            f"  99%\t{np.percentile(durs, 99):.1f}",
            f"  max\t{durs.max():.1f}",
        ]
        return "\n".join(lines)


def _fmt_secs(s: float) -> str:
    h = int(s // 3600)
    m = int((s % 3600) // 60)
    return f"{h:02d}:{m:02d}:{s % 60:04.1f}"
