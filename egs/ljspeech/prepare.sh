#!/usr/bin/env bash
# LJSpeech data preparation for tpu-valle.
# Mirrors ref /root/reference/egs/ljspeech/prepare.sh: 12500/200/400
# train/dev/test split of metadata.csv order.
set -eou pipefail

stage=0
stop_stage=3
dl_dir=$PWD/download
out_dir=data/tokenized
codec_ckpt=${CODEC_CKPT:-data/encodec_24khz.npz}
repo_root=$(cd "$(dirname "$0")/../.." && pwd)

. "$(dirname "$0")/../shared/parse_options.sh" || exit 1

log() { echo -e "$(date '+%Y-%m-%d %H:%M:%S') $*"; }

if [ "$stage" -le 0 ] && [ "$stop_stage" -ge 0 ]; then
  log "Stage 0: Download LJSpeech-1.1 to $dl_dir/LJSpeech-1.1"
  if [ ! -f "$dl_dir/LJSpeech-1.1/metadata.csv" ]; then
    log "LJSpeech not found. Download https://keithito.com/LJ-Speech-Dataset/"
    log "and extract to $dl_dir/LJSpeech-1.1."
    exit 1
  fi
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  log "Stage 1: TSV manifests"
  python3 "$repo_root/egs/shared/make_tsv.py" --corpus ljspeech \
    --root "$dl_dir/LJSpeech-1.1" --output-dir data/manifests
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  log "Stage 2: Tokenize (phonemes + EnCodec codes)"
  for split in train dev test; do
    python3 -m valle_tpu.bin.tokenize_dataset \
      --tsv "data/manifests/$split.tsv" --output-dir "$out_dir" \
      --split "$split" --codec-checkpoint "$codec_ckpt"
  done
fi

log "Done. See egs/libritts/prepare.sh tail for the canonical train command."
