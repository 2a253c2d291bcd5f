"""Manifest statistics CLI.

Parity: ref /root/reference/valle/bin/display_manifest_statistics.py —
``cuts.describe()`` for each split.

Run: python -m valle_tpu.bin.stats --manifest-dir data/tokenized
"""

from __future__ import annotations

import argparse
from pathlib import Path

from valle_tpu.data import Manifest


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--manifest-dir", type=Path, required=True)
    args = p.parse_args()
    for manifest in sorted(args.manifest_dir.glob("manifest_*.jsonl.gz")):
        print(f"== {manifest.name} ==")
        print(Manifest.load(manifest).describe())
        print()


if __name__ == "__main__":
    main()
