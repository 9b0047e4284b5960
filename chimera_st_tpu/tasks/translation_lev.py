"""Levenshtein (edit-based NAT) translation task.

reference: fairseq/tasks/translation_lev.py (TranslationLevenshteinTask with
--noise random_delete/random_mask) + fairseq/models/nat/levenshtein_utils.py
target construction via libnat.

Host-side target construction per batch (delta vs the reference, which
computes deletion targets from the model's own predictions — a host<->device
round trip per step under XLA; this is the reference's DAE-corruption path):

- ``ins_input``  : target with a random fraction of interior tokens deleted
- ``ins_targets``: tokens to insert between adjacent kept inputs (C++
  suggested_edit_ops, clib), clipped to the insertion-head arity
- ``masked_tgt`` : target with insertion positions replaced by unk — the
  word-insertion head trains to fill them
- ``del_input``  : target with random noise tokens inserted
- ``del_targets``: which del_input positions to delete
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import numpy as np

from ..clib import suggested_edit_ops
from ..config.registry import register_task
from ..data.batching import collate_tokens, round16
from .translation import TranslationTask

logger = logging.getLogger(__name__)


@register_task("translation_lev")
class TranslationLevenshteinTask(TranslationTask):
    BOS = 0
    UNK = 3

    def __init__(self, cfg, src_dict, tgt_dict):
        super().__init__(cfg, src_dict, tgt_dict)
        self.seed = int(cfg.get("seed", 1))
        self.delete_prob_max = float(cfg.get("random_delete_max", 0.5))
        self.insert_frac_max = float(cfg.get("random_insert_max", 0.3))
        self.max_ins = int(cfg.get("max_ins", 64))
        # reference --noise (translation_lev.py inject_noise): `levenshtein`
        # (default; builds the three lev-head targets), `random_mask` (CMLM
        # mask-predict training: a uniform fraction of target positions
        # masked), `full_mask` (vanilla/iterative NAT: every non-special
        # position masked). The mask modes emit masked_target +
        # target_lengths, the batch keys --criterion nat_loss/nacrf_loss
        # consume (review fix: nat_loss was unreachable from the CLI —
        # nothing produced masked_target).
        self.noise = str(cfg.get("noise", "levenshtein"))
        if self.noise not in ("levenshtein", "random_mask", "full_mask"):
            raise ValueError(f"unknown --noise {self.noise!r}")

    def _frame(self, target: np.ndarray) -> np.ndarray:
        """[tokens..., eos] -> [bos, tokens..., eos] (bos/eos anchor the edit
        alignment; reference levenshtein_utils assumes matching endpoints)."""
        return np.concatenate([[self.BOS], target]).astype(np.int32)

    def _random_delete(self, y: np.ndarray, rng) -> np.ndarray:
        """Drop a random fraction of interior tokens (reference:
        translation_lev.py _random_delete)."""
        n = len(y)
        if n <= 2:
            return y.copy()
        p = rng.uniform(0.0, self.delete_prob_max)
        keep = rng.random(n - 2) >= p
        return np.concatenate([y[:1], y[1:-1][keep], y[-1:]]).astype(np.int32)

    def _random_insert(self, y: np.ndarray, vocab: int, rng) -> np.ndarray:
        n = len(y)
        k = int(rng.integers(0, max(int(self.insert_frac_max * n), 1) + 1))
        if k == 0:
            return y.copy()
        noise = rng.integers(4, max(vocab, 5), size=k).astype(np.int32)
        slots = rng.integers(1, n, size=k)  # insert before y[slot]
        order = np.argsort(slots, kind="stable")
        out = list(y)
        for off, j in enumerate(order):
            out.insert(int(slots[j]) + off, int(noise[j]))
        return np.asarray(out, np.int32)

    def collate_indices(self, dataset, idx, target_len: Optional[int] = None,
                        epoch: int = 1):
        batch = super().collate_indices(dataset, idx, target_len)
        if not batch or "target" not in batch:
            return batch
        pad = self.tgt_dict.pad()
        vocab = len(self.tgt_dict)

        # per-(seed, epoch, sample-id) rngs: corruption is a pure function of
        # the sample AND the epoch, so mid-epoch resume replays identical
        # noise while fresh epochs re-roll it (reference numpy_seed(seed,
        # epoch, index); review fix — the epoch was missing, so every epoch
        # trained on identical corruptions)
        ids = (np.asarray(batch["id"]) if "id" in batch
               else np.arange(len(np.asarray(batch["target"]))))
        rngs = [np.random.default_rng((self.seed, int(epoch), int(i)))
                for i in ids]

        if self.noise in ("random_mask", "full_mask"):
            from ..criterions.nat_loss import cmlm_mask_target

            tgts = np.asarray(batch["target"])
            eos = self.tgt_dict.eos()
            if self.noise == "random_mask":
                masked = np.stack([
                    cmlm_mask_target(t, self.UNK, pad_idx=pad, rng=r)
                    for t, r in zip(tgts, rngs)
                ])
                # the canvas keeps eos visible like the reference's
                # _random_mask (it never masks specials)
                masked = np.where(tgts == eos, tgts, masked)
            else:  # full_mask: everything but pad/eos becomes the mask token
                masked = np.where(
                    (tgts == pad) | (tgts == eos), tgts,
                    np.full_like(tgts, self.UNK),
                )
            batch["masked_target"] = masked.astype(np.int32)
            batch["target_lengths"] = (tgts != pad).sum(axis=1).astype(np.int32)
            return batch

        ys = [self._frame(t[t != pad]) for t in np.asarray(batch["target"])]
        y_dels = [self._random_delete(y, r) for y, r in zip(ys, rngs)]
        y_inss = [self._random_insert(y, vocab, r) for y, r in zip(ys, rngs)]

        Ly = round16(max(len(y) for y in ys))
        Ld = round16(max(len(y) for y in y_dels))
        Li = round16(max(len(y) for y in y_inss))
        y_pad = collate_tokens(ys, pad, target_len=Ly, dtype=np.int32)
        ydel_pad = collate_tokens(y_dels, pad, target_len=Ld, dtype=np.int32)
        yins_pad = collate_tokens(y_inss, pad, target_len=Li, dtype=np.int32)

        ins_counts, ins_masks, _ = suggested_edit_ops(ydel_pad, y_pad, pad)
        _, _, del_labels = suggested_edit_ops(yins_pad, y_pad, pad)

        batch["lev_target"] = y_pad
        batch["ins_input"] = ydel_pad
        batch["ins_targets"] = np.clip(ins_counts, 0, self.max_ins - 1)
        batch["masked_tgt"] = np.where(ins_masks, self.UNK, y_pad).astype(np.int32)
        batch["del_input"] = yins_pad
        batch["del_targets"] = del_labels.astype(np.int32)
        return batch


    def build_generator(self, model, gen_cfg, reranker=None):
        from ..generation.nat_generator import build_nat_generator

        return build_nat_generator(
            model, gen_cfg, self.tgt_dict, bos=self.BOS, unk=self.UNK,
            reranker=reranker,
        )

@register_task("translation_ins")
class TranslationInsertionTask(TranslationLevenshteinTask):
    """Insertion-transformer variant: adds per-slot (token, weight) targets
    (reference: fairseq uses translation_lev for the insertion model too;
    targets per models/nat/insertion_transformer.py _get_ins_targets)."""

    def __init__(self, cfg, src_dict, tgt_dict):
        super().__init__(cfg, src_dict, tgt_dict)
        self.max_span = int(cfg.get("insertion_max_span", 8))
        self.tau = float(cfg.get("insertion_tau", 1.0))

    def collate_indices(self, dataset, idx, target_len=None):
        batch = super().collate_indices(dataset, idx, target_len)
        if not batch or "ins_input" not in batch:
            return batch
        from ..models.nat_insertion import insertion_slot_targets

        # note: parent clipped ins_targets to its max_ins; recompute raw
        from ..clib import suggested_edit_ops

        ic, im, _ = suggested_edit_ops(
            batch["ins_input"], batch["lev_target"], self.tgt_dict.pad()
        )
        toks, wts = insertion_slot_targets(
            batch["ins_input"], batch["lev_target"], ic, im,
            pad=self.tgt_dict.pad(), max_span=self.max_span, tau=self.tau,
        )
        batch["slot_tokens"] = toks
        batch["slot_weights"] = wts
        return batch

    def build_generator(self, model, gen_cfg, reranker=None):
        from ..generation.nat_generator import build_nat_generator

        return build_nat_generator(
            model, gen_cfg, self.tgt_dict, bos=self.BOS, unk=self.UNK,
            reranker=reranker,
        )

