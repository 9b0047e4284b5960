"""Independent (slow, dynamic-Python) beam-search oracle.

Implements the reference SequenceGenerator semantics
(reference: fairseq/sequence_generator.py:179-769) with none of the
static-shape machinery of chimera_st_tpu/generation/beam_search.py:
full-prefix re-decode each step, Python lists, per-sentence loops. Used by
test_generate_golden.py to assert the jitted generator reproduces reference
decoding token-for-token.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import numpy as np

NEG = -1.0e7


def oracle_beam(
    logprob_fn: Callable[[np.ndarray], np.ndarray],  # prefixes [N, L] -> [N, V]
    beam_size: int,
    max_len: int,
    eos: int = 2,
    pad: int = 1,
    bos: int | None = None,
    min_len: int = 1,
    len_penalty: float = 1.0,
) -> List[Tuple[np.ndarray, float]]:
    """Beam-decode ONE sentence; returns [(tokens incl eos, normalized score)]
    sorted best-first (length K)."""
    K = beam_size
    if bos is None:
        bos = eos
    alive = [([bos], 0.0)]
    finished: List[Tuple[List[int], float]] = []

    for i in range(max_len):
        prefixes = np.asarray([t for t, _ in alive], np.int64)
        lps = np.asarray(logprob_fn(prefixes), np.float64)  # [n, V]
        V = lps.shape[1]
        gen_len = i + 1
        if gen_len <= min_len:
            lps[:, eos] = NEG
        lps[:, pad] = NEG
        if gen_len >= max_len:  # force eos, keep the model's true eos score
            only = np.full_like(lps, NEG)
            only[:, eos] = lps[:, eos]
            lps = only
        cand = np.asarray([s for _, s in alive])[:, None] + lps
        flat = cand.reshape(-1)
        top = np.argsort(-flat, kind="stable")[: 2 * K]
        new_alive = []
        for j in top:
            b, tok = divmod(int(j), V)
            score = float(flat[j])
            seq = alive[b][0] + [tok]
            if tok == eos:
                if score > 0.5 * NEG:  # banned-eos candidates are not hypos
                    finished.append((seq[1:], score / (gen_len ** len_penalty)))
            elif len(new_alive) < K:
                new_alive.append((seq, score))
        finished = sorted(finished, key=lambda x: -x[1])[:K]
        alive = new_alive
        # reference stop criterion: nothing alive can beat the worst finished
        if len(finished) == K and alive:
            best_possible = alive[0][1] / (max_len ** len_penalty)
            if best_possible <= finished[-1][1]:
                break
        if not alive:
            break

    out = [(np.asarray(t, np.int32), s) for t, s in finished]
    while len(out) < K:
        out.append((np.asarray([eos], np.int32), float(NEG)))
    return out
