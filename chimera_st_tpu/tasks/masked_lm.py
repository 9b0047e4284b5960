"""Masked LM pretraining task (reference: fairseq/tasks/masked_lm.py —
token blocks over a binarized corpus with BERT-style masking in the loader)."""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ..config.registry import register_task
from ..data.batching import collate_tokens, round16
from ..data.dictionary import Dictionary
from ..data.indexed_dataset import MMapIndexedDataset
from ..data.token_block_dataset import TokenBlockDataset
from .base import ChimeraTask

logger = logging.getLogger(__name__)


class MaskedTokensDataset:
    """Applies BERT masking per access, deterministic per (seed, index)
    (reference: fairseq/data/mask_tokens_dataset.py)."""

    def __init__(self, blocks, mask_idx: int, vocab_size: int, pad: int = 1,
                 mask_prob: float = 0.15, seed: int = 1, nspecial: int = 4):
        self.blocks = blocks
        self.mask_idx = mask_idx
        self.vocab_size = vocab_size
        self.pad = pad
        self.mask_prob = mask_prob
        self.seed = seed
        self.nspecial = nspecial

    def __len__(self):
        return len(self.blocks)

    def num_tokens(self, i: int) -> int:
        return self.blocks.num_tokens(i)

    def set_epoch(self, epoch: int):
        self.epoch = int(epoch)

    def __getitem__(self, i: int):
        from ..criterions.masked_lm import apply_bert_masking

        # (seed, epoch, index) like the reference's numpy_seed(seed, epoch,
        # index): masks re-roll every epoch but stay resumable (review fix:
        # (seed, index) alone replayed identical masks every epoch)
        rng = np.random.default_rng([self.seed, getattr(self, "epoch", 1), i])
        tokens = self.blocks[i]
        net, target = apply_bert_masking(
            tokens, self.mask_idx, self.vocab_size,
            mask_prob=self.mask_prob, rng=rng, nspecial=self.nspecial,
        )
        return {"id": i, "net_tokens": net, "target": target}

    def collater(self, samples, target_len: Optional[int] = None):
        if not samples:
            return {}
        net = collate_tokens([s["net_tokens"] for s in samples], self.pad,
                             target_len=target_len, dtype=np.int32)
        tgt = collate_tokens([s["target"] for s in samples], self.pad,
                             target_len=target_len, dtype=np.int32)
        return {
            "id": np.asarray([s["id"] for s in samples], np.int64),
            "net_tokens": net,
            "target": tgt,
            "ntokens": float((tgt != self.pad).sum()),
            "nsentences": len(samples),
        }


@register_task("masked_lm")
class MaskedLMTask(ChimeraTask):
    text_only = True

    def __init__(self, cfg: Dict, dictionary: Dictionary):
        super().__init__(cfg)
        self.dictionary = dictionary
        self.mask_idx = dictionary.add_symbol("<mask>")

    @classmethod
    def setup_task(cls, cfg: Dict, **kwargs):
        d = cls.load_dictionary(str(Path(cfg["data"]) / "dict.txt"))
        return cls(cfg, d)

    def load_dataset(self, split: str, **kwargs):
        root = Path(self.cfg["data"])
        data = MMapIndexedDataset(str(root / split))
        blocks = TokenBlockDataset(
            data, data.sizes,
            int(self.cfg.get("tokens_per_sample", 512)),
            pad=self.dictionary.pad(), eos=self.dictionary.eos(),
            break_mode=self.cfg.get("sample_break_mode", "complete"),
        )
        self.datasets[split] = MaskedTokensDataset(
            blocks, self.mask_idx, len(self.dictionary),
            pad=self.dictionary.pad(),
            mask_prob=float(self.cfg.get("mask_prob", 0.15)),
            seed=int(self.cfg.get("seed", 1)),
        )

    @property
    def target_dictionary(self) -> Dictionary:
        return self.dictionary

    def collate_indices(self, dataset, idx, target_len):
        samples = [dataset[int(i)] for i in idx]
        tl = round16(max(len(s["target"]) for s in samples))
        return dataset.collater(samples, tl)
