#!/bin/bash
# OPUS-100 MT pre-training pipeline (reference:
# chimera/prepare_data/prepare-opus100-en2any.sh + download-opus100.sh).
# Raw corpus: https://object.pouta.csc.fi/OPUS-100/v1.0/opus-100-corpus-v1.0.tar.gz
# Extract opus-100-corpus/v1.0/supervised/en-$target/* into $DATA_ROOT/orig as
#   opus.en-$target.{en,$target} (train) and opus-test.en-$target.* (test).
set -e
DATA_ROOT=${DATA_ROOT:-data/opus100}
target=${1:-de}
shift || true

chimera-prepare-wmt \
    --data-dir "$DATA_ROOT" --target "$target" --out-name "opus_en_$target" \
    --corpora "opus.en-$target" --test-corpus "opus-test.en-$target" \
    --subword-tokens 40000 "$@"

out=$DATA_ROOT/opus_en_$target
chimera-preprocess -s en -t "$target" --joined-dictionary \
    --trainpref "$out/train" --validpref "$out/valid" --testpref "$out/test" \
    --destdir "$DATA_ROOT/bin_en_$target"
