#!/usr/bin/env bash
# Final MuST-C evaluation (reference: chimera/generate/generate-mustc-final.sh):
# average 7 checkpoints around the best, decode tst-COMMON with beam 10 /
# length penalty 1.5, score with sacrebleu.
set -euo pipefail

DATA_DIR=${DATA_DIR:?MuST-C manifest dir}
SAVE_DIR=${SAVE_DIR:?checkpoint dir}
OUT=${OUT:-$SAVE_DIR/final_eval}
mkdir -p "$OUT"

CKPT="$SAVE_DIR/checkpoint_best.ckpt"
if [[ "${AVERAGE:-1}" == "1" ]]; then
  mapfile -t EPOCHS < <(ls "$SAVE_DIR"/checkpoint[0-9]*.ckpt 2>/dev/null | sort -V | tail -7)
  if [[ ${#EPOCHS[@]} -ge 2 ]]; then
    chimera-average-checkpoints --inputs "${EPOCHS[@]}" --output "$OUT/averaged.ckpt"
    CKPT="$OUT/averaged.ckpt"
  fi
fi

chimera-generate "$DATA_DIR" \
  --task triplet --config-yaml config_wave.yaml \
  --path "$CKPT" --gen-subset "${GEN_SUBSET:-tst-COMMON_wave}" \
  --beam 10 --lenpen 1.5 --max-tokens 1000000 \
  --remove-bpe sentencepiece --scoring sacrebleu \
  --results-path "$OUT" \
  "$@"
grep "^Generate" "$OUT"/generate-*.txt
