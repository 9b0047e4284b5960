#!/usr/bin/env bash
# ST fine-tuning stage (reference: chimera/scripts/train-en2any-ST.sh):
# warm-start from the MT stage's best checkpoint, train the triplet task with
# the tri-modal loss, track st_loss for checkpoint selection, and run the
# background auto-evaluator.
set -euo pipefail

DATA_DIR=${DATA_DIR:?MuST-C manifest dir (from chimera-prep-mustc)}
SAVE_DIR=${SAVE_DIR:-checkpoints/st}
MT_CKPT=${MT_CKPT:-}          # checkpoint_best.ckpt of the MT stage
W2V2=${W2V2:?path to wav2vec_small.pt}
MAX_UPDATE=${MAX_UPDATE:-150000}

mkdir -p "$SAVE_DIR"
# Warm start: MT best -> ST last + fresh optimizer, exactly the reference's
# semantics (train-en2any-ST.sh:11-19: unconditional cp + --reset-optimizer
# unless $resume == "True"). RESUME=True is the ONLY way to keep going from
# an interrupted ST run — inferring "resume" from checkpoint_last existing
# would silently resume the copied MT checkpoint (same arch, loads fine)
# with MT's optimizer state if the first run died before its first ST save.
RESET_OPT=""
if [[ "${RESUME:-}" != "True" ]]; then
  if [[ -n "$MT_CKPT" ]]; then
    cp "$MT_CKPT" "$SAVE_DIR/checkpoint_last.ckpt"
  fi
  RESET_OPT="--reset-optimizer"
fi

# background continuous eval (reference: auto-generate.py); GEN_SUBSET /
# AUTOGEN_EXTRA are overridable so integration tests can drive fixture data
chimera-auto-generate "$DATA_DIR" --save-dir "$SAVE_DIR" --task triplet \
  --gen-subset "${GEN_SUBSET:-dev_wave}" --beam 4 --remove-bpe sentencepiece \
  ${AUTOGEN_EXTRA:-} &
AUTOGEN_PID=$!
trap 'touch "$SAVE_DIR/auto_gen_stop"; wait $AUTOGEN_PID || true' EXIT

chimera-train "$DATA_DIR" \
  --task triplet --config-yaml config_wave.yaml \
  --arch s2t_transformer_w2v2_interlingua_base \
  --interlingua-length "${INTERLINGUA_LENGTH:-64}" \
  --w2v2-model-path "$W2V2" \
  --criterion triplet_st_mt_contrastive --label-smoothing 0.1 \
  --loss-ratio 1.0 1.0 1.0 \
  --optimizer adam --adam-betas '(0.9, 0.98)' \
  --lr 1e-4 --lr-scheduler inverse_sqrt --warmup-updates 25000 \
  --max-tokens 2000000 --update-freq "${UPDATE_FREQ:-8}" \
  --max-update "$MAX_UPDATE" \
  --save-dir "$SAVE_DIR" --keep-last-epochs 10 \
  --best-checkpoint-metric st_loss \
  $RESET_OPT \
  "$@"
