#!/usr/bin/env bash
# LibriTTS data preparation for tpu-valle.
# Mirrors the reference recipe (ref /root/reference/egs/libritts/prepare.sh):
#   stage 0: download        stage 1: TSV manifests from the corpus layout
#   stage 2: tokenize (phonemes + EnCodec codes)   stage 3: done (splits are
#   already combined by make_tsv.py: train-clean-100/360 + train-other-500
#   -> train, dev-clean -> dev, test-clean -> test).
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
  log "Stage 0: Download LibriTTS to $dl_dir/LibriTTS"
  if [ ! -d "$dl_dir/LibriTTS/dev-clean" ]; then
    log "LibriTTS not found. Download from https://www.openslr.org/60/ and"
    log "extract to $dl_dir/LibriTTS (or symlink an existing copy)."
    exit 1
  fi
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  log "Stage 1: TSV manifests"
  python3 "$repo_root/egs/shared/make_tsv.py" --corpus libritts \
    --root "$dl_dir/LibriTTS" --output-dir data/manifests
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  log "Stage 2: Tokenize (phonemes + EnCodec codes)"
  if [ ! -f "$codec_ckpt" ]; then
    log "Convert the EnCodec 24 kHz checkpoint first:"
    log "  python -m valle_tpu.bin.convert_codec --output $codec_ckpt"
    exit 1
  fi
  for split in train dev test; do
    python3 -m valle_tpu.bin.tokenize_dataset \
      --tsv "data/manifests/$split.tsv" --output-dir "$out_dir" \
      --split "$split" --codec-checkpoint "$codec_ckpt"
  done
fi

log "Done. Train with:"
log "  python -m valle_tpu.bin.train --manifest-dir $out_dir --exp-dir exp/valle \\"
log "    --model-name valle --norm-first true --add-prenet false \\"
log "    --decoder-dim 1024 --nhead 16 --num-decoder-layers 12 \\"
log "    --max-duration 80 --dtype bfloat16 --train-stage 1 \\"
log "    --base-lr 0.05 --warmup-steps 200 --num-epochs 20 \\"
log "    --accumulate-grad-steps 4"
