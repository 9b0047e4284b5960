#!/usr/bin/env bash
# MT pre-training stage (reference: chimera/scripts/train-en2any-MT.sh).
# Trains the interlingua model's text branch on WMT/OPUS parallel data
# binarized with chimera-preprocess and the joint SPM vocabulary.
set -euo pipefail

DATA_BIN=${DATA_BIN:?binarized parallel data dir}
SAVE_DIR=${SAVE_DIR:-checkpoints/mt}
TGT=${TGT:-de}
INTERLINGUA_LENGTH=${INTERLINGUA_LENGTH:-64}
MAX_UPDATE=${MAX_UPDATE:-500000}

chimera-train "$DATA_BIN" \
  --task translation -s en -t "$TGT" \
  --arch s2t_transformer_w2v2_interlingua_base \
  --interlingua-length "$INTERLINGUA_LENGTH" \
  --criterion label_smoothed_cross_entropy --label-smoothing 0.1 \
  --optimizer adam --adam-betas '(0.9, 0.98)' --clip-norm 0.0 \
  --lr 5e-4 --lr-scheduler inverse_sqrt --warmup-updates 4000 \
  --max-tokens 4096 --update-freq "${UPDATE_FREQ:-8}" \
  --max-update "$MAX_UPDATE" \
  --save-dir "$SAVE_DIR" --keep-last-epochs 10 \
  --best-checkpoint-metric loss \
  "$@"
