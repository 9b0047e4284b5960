"""Word error rate scorer (reference: fairseq/scoring/wer.py).

Levenshtein distance via the native C++ extension when built
(chimera_st_tpu/clib — the reference uses editdistance), else pure Python DP.
"""

from __future__ import annotations

from typing import Optional

from ..config.registry import register_scorer


def levenshtein(a, b) -> int:
    try:
        from ..clib import libnat

        return libnat.levenshtein(list(a), list(b))
    except Exception:
        pass
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@register_scorer("wer")
class WerScorer:
    def __init__(self, cfg: Optional[dict] = None, tgt_dict=None):
        self.distance = 0
        self.ref_length = 0

    def reset(self):
        self.distance = 0
        self.ref_length = 0

    def add_string(self, ref: str, pred: str):
        ref_words = ref.split()
        self.distance += levenshtein(ref_words, pred.split())
        self.ref_length += len(ref_words)

    def score(self) -> float:
        return 100.0 * self.distance / max(self.ref_length, 1)

    def result_string(self) -> str:
        return f"WER: {self.score():.2f}"
