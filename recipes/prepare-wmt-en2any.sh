#!/bin/bash
# WMT MT pre-training data pipeline (reference:
# chimera/prepare_data/prepare-wmt-en2any.sh + download-wmt.sh).
#
# 1) download the raw corpora into $DATA_ROOT/orig (reference URLs):
#    wmt17 en-de:  http://statmt.org/wmt13/training-parallel-europarl-v7.tgz
#                  http://statmt.org/wmt13/training-parallel-commoncrawl.tgz
#                  http://data.statmt.org/wmt17/translation-task/training-parallel-nc-v12.tgz
#                  http://data.statmt.org/wmt17/translation-task/dev.tgz
#    (en-fr/ru/es/ro corpora lists: see the reference script)
# 2) run the python pipeline (normalize + tokenize + clean + joint 40k BPE):
set -e
DATA_ROOT=${DATA_ROOT:-data/wmt}
target=${1:-de}
shift || true

chimera-prepare-wmt \
    --data-dir "$DATA_ROOT" --target "$target" \
    --corpora "training/europarl-v7.$target-en" "commoncrawl.$target-en" \
              "training/news-commentary-v12.$target-en" \
    --subword-tokens 40000 "$@"

out=$DATA_ROOT/wmt_en_$target
chimera-preprocess -s en -t "$target" --joined-dictionary \
    --trainpref "$out/train" --validpref "$out/valid" --testpref "$out/test" \
    --destdir "$DATA_ROOT/bin_en_$target"
echo "binarized MT data at $DATA_ROOT/bin_en_$target"
