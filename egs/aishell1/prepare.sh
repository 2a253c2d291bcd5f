#!/usr/bin/env bash
# aishell-1 data preparation for tpu-valle (Chinese; pypinyin text backend).
# Mirrors ref /root/reference/egs/aishell1/prepare.sh. Note the reference's
# caveat (ref egs/aishell1/README.md:2): 150 h is insufficient for stable
# zero-shot results.
set -eou pipefail

stage=0
stop_stage=3
dl_dir=$PWD/download
out_dir=data/tokenized
codec_ckpt=${CODEC_CKPT:-data/encodec_24khz.npz}
text_extractor=pypinyin_initials_finals
repo_root=$(cd "$(dirname "$0")/../.." && pwd)

. "$(dirname "$0")/../shared/parse_options.sh" || exit 1

log() { echo -e "$(date '+%Y-%m-%d %H:%M:%S') $*"; }

if [ "$stage" -le 0 ] && [ "$stop_stage" -ge 0 ]; then
  log "Stage 0: Download aishell to $dl_dir/aishell/data_aishell"
  if [ ! -d "$dl_dir/aishell/data_aishell/wav" ]; then
    log "aishell not found. Download https://www.openslr.org/33/ and extract."
    exit 1
  fi
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  log "Stage 1: TSV manifests"
  python3 "$repo_root/egs/shared/make_tsv.py" --corpus aishell \
    --root "$dl_dir/aishell/data_aishell" --output-dir data/manifests
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  log "Stage 2: Tokenize (pinyin + EnCodec codes)"
  for split in train dev test; do
    python3 -m valle_tpu.bin.tokenize_dataset \
      --tsv "data/manifests/$split.tsv" --output-dir "$out_dir" \
      --split "$split" --codec-checkpoint "$codec_ckpt" \
      --text-extractor "$text_extractor"
  done
fi

log "Done."
