#!/usr/bin/env python3
"""Corpus layout -> TSV manifests (utt_id\twav_path\ttext per line).

Replaces the reference's lhotse `prepare` stage (ref egs/*/prepare.sh stage 1,
which calls `lhotse prepare libritts/ljspeech/aishell`): walks the raw corpus
directory layout and emits one TSV per split, ready for
`python -m valle_tpu.bin.tokenize_dataset --tsv <split>.tsv`.

Supported layouts:
  libritts: $root/{train-clean-100,...}/<spk>/<chap>/<utt>.wav +
            <utt>.normalized.txt  (split = LibriTTS part name)
  ljspeech: $root/metadata.csv (id|text|normalized) + wavs/<id>.wav,
            split 12500/200/400 train/dev/test like ref
            egs/ljspeech/prepare.sh.
  aishell:  $root/wav/{train,dev,test}/<spk>/<utt>.wav +
            transcript/aishell_transcript_v0.8.txt
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def libritts(root: Path, parts: list[str], out_dir: Path) -> None:
    # ref egs/libritts/prepare.sh:84-110 combines {train-clean-100,
    # train-clean-360, train-other-500} into train; dev-clean -> dev;
    # test-clean -> test.
    split_of = {
        "train-clean-100": "train", "train-clean-360": "train",
        "train-other-500": "train", "dev-clean": "dev",
        "dev-other": "dev_other", "test-clean": "test",
        "test-other": "test_other",
    }
    rows: dict[str, list[str]] = {}
    for part in parts:
        part_dir = root / part
        if not part_dir.is_dir():
            print(f"skip missing part {part_dir}", file=sys.stderr)
            continue
        split = split_of.get(part, part)
        for wav in sorted(part_dir.rglob("*.wav")):
            txt = wav.with_suffix(".normalized.txt")
            if not txt.exists():
                txt = wav.with_suffix(".original.txt")
                if not txt.exists():
                    continue
            text = txt.read_text(encoding="utf-8").strip().replace("\t", " ")
            rows.setdefault(split, []).append(f"{wav.stem}\t{wav}\t{text}")
    _dump(rows, out_dir)


def ljspeech(root: Path, out_dir: Path) -> None:
    meta = root / "metadata.csv"
    rows_all = []
    for line in meta.read_text(encoding="utf-8").strip().split("\n"):
        fields = line.split("|")
        utt_id, text = fields[0], fields[-1].strip().replace("\t", " ")
        wav = root / "wavs" / f"{utt_id}.wav"
        if wav.exists():
            rows_all.append(f"{utt_id}\t{wav}\t{text}")
    # ref egs/ljspeech/prepare.sh: first 12500 train, next 200 dev, rest test
    rows = {
        "train": rows_all[:12500],
        "dev": rows_all[12500:12700],
        "test": rows_all[12700:],
    }
    _dump(rows, out_dir)


def aishell(root: Path, out_dir: Path) -> None:
    trans = {}
    tfile = root / "transcript" / "aishell_transcript_v0.8.txt"
    for line in tfile.read_text(encoding="utf-8").strip().split("\n"):
        utt_id, *words = line.split()
        trans[utt_id] = "".join(words)
    rows: dict[str, list[str]] = {}
    for split in ("train", "dev", "test"):
        for wav in sorted((root / "wav" / split).rglob("*.wav")):
            text = trans.get(wav.stem)
            if text:
                rows.setdefault(split, []).append(f"{wav.stem}\t{wav}\t{text}")
    _dump(rows, out_dir)


def _dump(rows: dict[str, list[str]], out_dir: Path) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    for split, lines in rows.items():
        path = out_dir / f"{split}.tsv"
        path.write_text("\n".join(lines) + "\n", encoding="utf-8")
        print(f"{path}: {len(lines)} utterances")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", choices=["libritts", "ljspeech", "aishell"],
                   required=True)
    p.add_argument("--root", type=Path, required=True)
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument("--parts", type=str, nargs="*",
                   default=["train-clean-100", "train-clean-360",
                            "train-other-500", "dev-clean", "test-clean"])
    a = p.parse_args()
    if a.corpus == "libritts":
        libritts(a.root, a.parts, a.output_dir)
    elif a.corpus == "ljspeech":
        ljspeech(a.root, a.output_dir)
    else:
        aishell(a.root, a.output_dir)


if __name__ == "__main__":
    main()
