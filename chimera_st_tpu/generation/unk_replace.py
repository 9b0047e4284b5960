"""Attention-aligned unknown-word replacement for generated hypotheses
(reference: fairseq/utils.py replace_unk/post_process_prediction + the
fairseq_cli/generate.py --replace-unk path).

Each ``<unk>`` in a hypothesis is replaced by the source word its decoder
cross-attention argmax points at; an optional alignment dictionary (one
"src_word tgt_word" pair per line) maps the copied word through a bilingual
lexicon first, falling back to a verbatim copy."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence


def load_align_dict(path: Optional[str]) -> Dict[str, str]:
    """Parse a fairseq-format alignment dictionary (utils.load_align_dict):
    whitespace-separated ``src tgt`` per line; missing/None path -> empty
    dict (pure copy behavior)."""
    table: Dict[str, str] = {}
    if not path or path is True:  # --replace-unk with no dict argument
        return table
    with open(path, encoding="utf-8") as f:
        for line in f:
            cols = line.split()
            if len(cols) >= 2:
                table[cols[0]] = cols[1]
    return table


def replace_unk_tokens(
    hyp_symbols: List[str],
    src_words: Sequence[str],
    alignment: Sequence[int],
    align_dict: Dict[str, str],
    unk_symbol: str,
) -> List[str]:
    """Replace each ``unk_symbol`` in ``hyp_symbols`` with the source word at
    the aligned position (reference utils.py replace_unk). ``alignment[t]``
    is the source index the t-th target position attends to most; alignments
    past the source edge copy the final source word (the reference appends
    ``<eos>`` — we clamp to the last real word instead, which is what the
    attention on speech-text pairs actually means)."""
    out = []
    for t, sym in enumerate(hyp_symbols):
        if sym == unk_symbol and len(src_words):
            idx = min(int(alignment[t]) if t < len(alignment) else 0,
                      len(src_words) - 1)
            src_word = src_words[idx]
            out.append(align_dict.get(src_word, src_word))
        else:
            out.append(sym)
    return out
