"""Offline dataset tokenization: wavs + transcripts -> phoneme tokens +
EnCodec codes + symbol table.

Parity: ref /root/reference/valle/bin/tokenizer.py — phonemize transcripts
into ``tokens``, EnCodec-encode audio into (T, 8) code arrays stored in
shards, emit ``unique_text_tokens.k2symbols`` (ref :247-254).  Input here is
a simple TSV manifest (utt_id\twav_path\ttext) or a directory layout, instead
of lhotse cut manifests; audio encoding runs batched on the accelerator
(ref GPU batch path :198-206).

Run: python -m valle_tpu.bin.tokenize_dataset --tsv train.tsv \
        --output-dir data/tokenized --split train --codec-checkpoint codec.npz
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

from valle_tpu import macros
from valle_tpu.data import (
    CodeShardWriter,
    Manifest,
    SymbolTable,
    convert_audio,
    read_wav,
)
from valle_tpu.data.text_tokenizer import TextTokenizer, tokenize_text


def _load_or_new_symbols(out_dir: Path) -> SymbolTable:
    """Resume the symbol table across splits: tokenizing dev after train must
    EXTEND unique_text_tokens.k2symbols, not overwrite it (ids already baked
    into earlier manifests stay stable)."""
    path = out_dir / "unique_text_tokens.k2symbols"
    if path.exists():
        return SymbolTable.from_file(path)
    return SymbolTable()


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--tsv", type=Path, required=True,
                   help="utt_id\\twav_path\\ttext per line")
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument("--split", type=str, default="train")
    p.add_argument("--codec-checkpoint", type=str, default="",
                   help="required for --audio-extractor Encodec")
    p.add_argument("--audio-extractor", type=str, default="Encodec",
                   choices=["Encodec", "Fbank"],
                   help="Encodec codes (VALL-E) or BigVGAN fbank features "
                   "(Transformer baseline, ref bin/tokenizer.py:81,148)")
    p.add_argument("--text-extractor", type=str, default="espeak")
    p.add_argument("--batch-frames", type=int, default=64,
                   help="wavs encoded per device batch (padded to max len); "
                   "64 is the measured v5e sweet spot after the round-4 "
                   "LSTM scan fixes — 248.7 audio-s/s (B=128 adds only 6% "
                   "at 2x the per-batch latency; bench.py tokenize, "
                   "docs/perf_notes.md)")
    p.add_argument("--shard-format", type=str, default="vsh",
                   choices=["vsh", "h5"],
                   help="vsh = packed shards for the native C++ loader")
    return p.parse_args()


def _fbank_main(args, rows, tokenizer):
    """Fbank mode: BigVGAN log-mel features into float16 (VSF1) shards for
    the Transformer TTS baseline (ref bin/tokenizer.py:148-149)."""
    from valle_tpu.data.fbank import get_fbank_extractor

    extractor = get_fbank_extractor()
    symbols = _load_or_new_symbols(args.output_dir)
    records = []
    with CodeShardWriter(
        args.output_dir, prefix=f"fbank_{args.split}", fmt="vsf",
        num_quantizers=macros.NUM_MEL_BINS,
    ) as w:
        for i, (utt_id, wav_path, text) in enumerate(rows):
            wav, sr = read_wav(wav_path)
            wav = convert_audio(wav, sr, macros.SAMPLE_RATE, 1)
            feats = extractor.extract(wav[0], macros.SAMPLE_RATE)  # (T, 100)
            shard, key = w.write(utt_id, feats.astype(np.float16))
            tokens = tokenize_text(tokenizer, text)
            for s in tokens:
                symbols.add(s)
            records.append(
                {
                    "id": utt_id,
                    "text": text,
                    "tokens": tokens,
                    "duration": wav.shape[-1] / macros.SAMPLE_RATE,
                    "shard": shard,
                    "key": key,
                    "feature_dim": macros.NUM_MEL_BINS,
                }
            )
            if i % 200 == 0:
                logging.info(f"{i + 1}/{len(rows)}")
    Manifest.save(iter(records), args.output_dir / f"manifest_{args.split}.jsonl.gz")
    symbols.to_file(args.output_dir / "unique_text_tokens.k2symbols")
    logging.info(f"wrote fbank manifest + symbols to {args.output_dir}")


def main():
    args = get_args()
    logging.basicConfig(level=logging.INFO, force=True)
    args.output_dir.mkdir(parents=True, exist_ok=True)

    tokenizer = TextTokenizer(backend=args.text_extractor)

    rows = []
    for line in args.tsv.read_text().strip().split("\n"):
        utt_id, wav_path, text = line.split("\t", 2)
        rows.append((utt_id, wav_path, text))
    logging.info(f"{len(rows)} utterances")

    if args.audio_extractor == "Fbank":
        return _fbank_main(args, rows, tokenizer)

    from valle_tpu.bin.infer import load_codec

    assert args.codec_checkpoint, "--codec-checkpoint required for Encodec"
    codec = load_codec(args.codec_checkpoint)

    symbols = _load_or_new_symbols(args.output_dir)
    records = []
    with CodeShardWriter(
        args.output_dir, prefix=f"codes_{args.split}", fmt=args.shard_format
    ) as w:
        for i in range(0, len(rows), args.batch_frames):
            chunk = rows[i : i + args.batch_frames]
            wavs = []
            for _, wav_path, _ in chunk:
                wav, sr = read_wav(wav_path)
                wavs.append(
                    convert_audio(wav, sr, codec.sample_rate, codec.channels)[0]
                )
            tmax = max(w_.shape[-1] for w_ in wavs)
            batch = np.zeros((len(chunk), 1, tmax), np.float32)
            for k, w_ in enumerate(wavs):
                batch[k, 0, : w_.shape[-1]] = w_
            codes = np.asarray(codec.encode(batch))  # (B, T', Q)
            for k, (utt_id, _, text) in enumerate(chunk):
                n_frames = int(np.ceil(wavs[k].shape[-1] / macros.AUDIO_HOP))
                c = codes[k, :n_frames]
                shard, key = w.write(utt_id, c)
                tokens = tokenize_text(tokenizer, text)
                for s in tokens:
                    symbols.add(s)
                records.append(
                    {
                        "id": utt_id,
                        "text": text,
                        "tokens": tokens,
                        "duration": wavs[k].shape[-1] / codec.sample_rate,
                        "shard": shard,
                        "key": key,
                    }
                )
            if (i // args.batch_frames) % 50 == 0:
                logging.info(f"{i + len(chunk)}/{len(rows)}")

    Manifest.save(iter(records), args.output_dir / f"manifest_{args.split}.jsonl.gz")
    symbols.to_file(args.output_dir / "unique_text_tokens.k2symbols")
    logging.info(f"wrote manifest + symbols to {args.output_dir}")


if __name__ == "__main__":
    main()
