"""Multilingual translation task.

reference: fairseq/tasks/multilingual_translation.py — trains one model over
several language pairs (--lang-pairs de-en,fr-en); batches are tagged with
their pair and routed to the pair's encoder/decoder. Here the tag rides the
batch as ``task_name`` and the Trainer's per-task jit dispatch (one compiled
step per pair, train/trainer.py) replaces the reference's per-pair
round-robin; sample ratios reuse the ConcatDataset machinery."""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ..config.registry import register_criterion, register_task
from ..data.dictionary import Dictionary
from ..data.indexed_dataset import MMapIndexedDataset
from ..data.language_pair import LanguagePairDataset
from .base import ChimeraTask
from ..data.batching import round16

logger = logging.getLogger(__name__)


class _TaggedDataset:
    """Wraps a LanguagePairDataset, tagging batches with the lang pair."""

    def __init__(self, base, pair: str):
        self.base = base
        self.pair = pair

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i):
        return (self.pair, self.base[int(i)])

    def num_tokens(self, i):
        return self.base.num_tokens(int(i))

    def collater(self, samples, **kwargs):
        pair = samples[0][0]
        batch = self.base.collater([s for _, s in samples], **kwargs)
        batch["task_name"] = pair
        return batch


@register_task("multilingual_translation")
class MultilingualTranslationTask(ChimeraTask):
    text_only = True

    def __init__(self, cfg: Dict, dicts: Dict[str, Dictionary], pairs):
        super().__init__(cfg)
        self.dicts = dicts
        self.pairs = pairs

    @classmethod
    def setup_task(cls, cfg: Dict, **kwargs):
        root = Path(cfg["data"])
        pairs = cfg.get("lang_pairs")
        pairs = pairs.split(",") if isinstance(pairs, str) else list(pairs)
        langs = sorted({l for p in pairs for l in p.split("-")})
        dicts = {l: cls.load_dictionary(str(root / f"dict.{l}.txt")) for l in langs}
        logger.info(f"multilingual: pairs {pairs}, dicts "
                    + str({l: len(d) for l, d in dicts.items()}))
        return cls(cfg, dicts, pairs)

    def load_dataset(self, split: str, **kwargs):
        from ..data.wrappers import ConcatDataset

        root = Path(self.cfg["data"])
        parts = []
        for pair in self.pairs:
            src, tgt = pair.split("-")
            prefix = str(root / f"{split}.{src}-{tgt}.")
            base = LanguagePairDataset(
                MMapIndexedDataset(prefix + src),
                MMapIndexedDataset(prefix + tgt),
                self.dicts[src],
                self.dicts[tgt],
            )
            parts.append(_TaggedDataset(base, pair))
        ds = parts[0] if len(parts) == 1 else ConcatDataset(parts)
        self.datasets[split] = ds

    def batch_groups(self, dataset):
        # pair-pure batches come from the batch BUILDER now (base
        # make_batch_iterator packs each group independently); review fix —
        # trimming mixed batches to their majority pair silently dropped
        # the same minority-pair rows every epoch
        import numpy as np

        from ..data.wrappers import ConcatDataset

        if not isinstance(dataset, ConcatDataset):
            return None
        bounds = np.asarray([0] + list(dataset.cumulative_sizes))
        return np.searchsorted(bounds, np.arange(len(dataset)), side="right") - 1

    def collate_indices(self, dataset, idx, target_len: Optional[int] = None):
        samples = [dataset[int(i)] for i in idx]
        pairs = [s[0] for s in samples]
        if len(set(pairs)) > 1:  # the group-pure batching guarantees this
            raise AssertionError(
                f"mixed language pairs in one batch: {sorted(set(pairs))}")
        src_max = round16(max(len(s["source"]) for _, s in samples))
        tgt_max = round16(max(len(s["target"]) for _, s in samples))
        return dataset.collater(
            samples, src_target_len=src_max, tgt_target_len=tgt_max
        )

    def model_config_overrides(self, cfg: Dict) -> Dict:
        cfg = dict(cfg)
        cfg.setdefault("lang_pairs", tuple(self.pairs))
        # joined-dictionary setup: embedding tables are sized from ONE dict,
        # so all per-language dicts must match — verify instead of assuming
        # (review fix: a larger dict silently overflowed into XLA's clamped
        # gather, embedding every high-id token as the last row)
        sizes = {lang: len(d) for lang, d in self.dicts.items()}
        if len(set(sizes.values())) > 1:
            raise ValueError(
                "multilingual_translation shares one embedding table across "
                f"languages but the dictionaries differ in size: {sizes}; "
                "binarize with --joined-dictionary (reference multilingual "
                "setup) or train per-language models"
            )
        any_src = self.pairs[0].split("-")[0]
        any_tgt = self.pairs[0].split("-")[1]
        cfg.setdefault("src_vocab_size", len(self.dicts[any_src]))
        cfg.setdefault("tgt_vocab_size", len(self.dicts[any_tgt]))
        return cfg

    @property
    def source_dictionary(self):
        return self.dicts[self.pairs[0].split("-")[0]]

    @property
    def target_dictionary(self):
        return self.dicts[self.pairs[0].split("-")[1]]


@register_criterion("multilingual_label_smoothed_cross_entropy")
def make_multilingual_ce(cfg: Dict):
    """Routes each pair-tagged batch through the pair's encoder/decoder
    (reference: multilingual_translation.py train_step per-pair loop)."""
    from ..criterions.label_smoothed_ce import ce_loss_from_logits

    eps = float(cfg.get("label_smoothing", 0.1))
    pad = int(cfg.get("padding_idx", 1))
    sentence_avg = bool(cfg.get("sentence_avg", False))

    def criterion(model, params, batch, rngs=None, num_updates=None, train=True):
        pair = batch.get("task_name") or model.cfg.lang_pairs[0]
        logits = model.apply(
            params, batch["src_tokens"], batch["prev_output_tokens"],
            pair=pair, deterministic=not train, rngs=rngs,
        )
        loss, nll = ce_loss_from_logits(logits, batch["target"], eps, pad)
        ntokens = batch["ntokens"]
        nsentences = batch["target"].shape[0]
        sample_size = nsentences if sentence_avg else ntokens
        return loss, sample_size, {
            "loss": loss, "nll_loss": nll, "ntokens": ntokens,
            "nsentences": nsentences, "sample_size": sample_size,
        }

    return criterion
