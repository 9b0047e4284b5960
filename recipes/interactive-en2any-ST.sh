#!/usr/bin/env bash
# Interactive wav -> translation (reference: chimera/scripts/interactive-en2any-ST.sh
# + chimera/tools/hand-make-config.py): builds a minimal config_wave.yaml
# pointing at the shipped SPM resources, then reads .wav paths from stdin.
set -euo pipefail

CKPT=${CKPT:?checkpoint (.ckpt or released Chimera_EN2XX.pt)}
SPM_DIR=${SPM_DIR:?dir containing spm_unigram10000_wave_joint.{model,txt}}
WORK=${WORK:-$(mktemp -d)}

python - "$WORK" "$SPM_DIR" <<'PY'
import sys
from pathlib import Path
work, spm = Path(sys.argv[1]), Path(sys.argv[2])
model = spm / "spm_unigram10000_wave_joint.model"
vocab = spm / "spm_unigram10000_wave_joint.txt"
(work / "config_wave.yaml").write_text(
    f"""audio_root: {work}
use_audio_input: true
vocab_filename: {vocab}
src_vocab_filename: {vocab}
bpe_tokenizer: {{bpe: sentencepiece, sentencepiece_model: {model}}}
src_bpe_tokenizer: {{bpe: sentencepiece, sentencepiece_model: {model}}}
"""
)
print(f"wrote {work}/config_wave.yaml")
PY

chimera-interactive "$WORK" \
  --task triplet --config-yaml config_wave.yaml \
  --path "$CKPT" --beam "${BEAM:-5}" --lenpen 1.5 \
  --remove-bpe sentencepiece \
  "$@"
