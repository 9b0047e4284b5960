#!/usr/bin/env bash
# Real-asset BLEU-parity eval: run the released Chimera_EN2XX.pt fairseq
# checkpoints through torch_import -> beam decode on MuST-C tst-COMMON and
# compare against the paper numbers (README.md:42-44 of the reference:
# EN-DE 27.1 / EN-FR 35.6 / EN-RU 17.4 / EN-ES 30.6 / EN-IT 25.0 /
# EN-RO 24.0 / EN-PT 30.2 / EN-NL 29.2 at beam 10 lenpen 1.5).
#
# The rehearsal test (tests/test_checkpoint_rehearsal.py) proves the same
# pipeline on a synthesized full-width .pt; THIS script is the run to do when
# the real checkpoints and MuST-C data are present:
#
#   CKPT=/path/Chimera_EN2DE.pt DATA_DIR=/path/mustc/en-de ./eval-mustc-final.sh
set -euo pipefail

CKPT=${CKPT:?path to Chimera_EN2XX.pt (fairseq format)}
DATA_DIR=${DATA_DIR:?MuST-C manifest dir (prep_mustc_data.py output)}
OUT=${OUT:-$(dirname "$CKPT")/pt_eval}
EXPECTED_BLEU=${EXPECTED_BLEU:-}   # e.g. 27.1 for EN-DE; empty = just report
mkdir -p "$OUT"

chimera-generate "$DATA_DIR" \
  --task triplet --config-yaml config_wave.yaml \
  --path "$CKPT" --gen-subset "${GEN_SUBSET:-tst-COMMON_wave}" \
  --beam 10 --lenpen 1.5 --max-tokens 1000000 \
  --remove-bpe sentencepiece --scoring sacrebleu \
  --results-path "$OUT" \
  "$@"

LINE=$(grep "^Generate" "$OUT"/generate-*.txt | tail -1)
echo "$LINE"
if [[ -n "$EXPECTED_BLEU" ]]; then
  BLEU=$(echo "$LINE" | grep -oE "BLEU4? = [0-9.]+" | grep -oE "[0-9.]+" | head -1)
  python - "$BLEU" "$EXPECTED_BLEU" <<'EOF'
import sys
got, want = float(sys.argv[1]), float(sys.argv[2])
delta = got - want
print(f"BLEU {got:.2f} vs reference {want:.2f} (delta {delta:+.2f})")
sys.exit(0 if delta >= -0.5 else 1)  # parity tolerance 0.5 BLEU
EOF
fi
