"""Synthetic benchmark tasks: dummy_mt / dummy_lm.

reference: fairseq/benchmark/{dummy_mt,dummy_lm}.py — fixed synthetic batches
for measuring training throughput without any data on disk (the reference's
only "fake backend"; SURVEY §4). One pre-built batch is replayed every step,
so the measurement isolates the compiled step from the data pipeline."""

from __future__ import annotations

import logging
from typing import Dict, Optional

import numpy as np

from ..config.registry import register_task
from ..data.dictionary import Dictionary
from .base import ChimeraTask

logger = logging.getLogger(__name__)


def _synthetic_dictionary(vocab: int) -> Dictionary:
    d = Dictionary()
    for i in range(vocab - d.nspecial):
        d.add_symbol(f"w{i}")
    return d


class _FixedBatchDataset:
    """len-N dataset whose every index yields the same synthetic example."""

    def __init__(self, example: Dict, n: int, collate_extra: Dict):
        self.example = example
        self.n = n
        self.collate_extra = collate_extra

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return self.example

    def num_tokens(self, i):
        return len(self.example["target"])

    def collater(self, samples, *args, **kwargs):
        batch = {
            k: np.stack([s[k] for s in samples])
            for k in samples[0]
        }
        batch["nsentences"] = len(samples)
        batch["ntokens"] = float(
            sum(len(s["target"]) for s in samples)
        )
        batch.update(self.collate_extra)
        return batch


@register_task("dummy_mt")
class DummyMTTask(ChimeraTask):
    def __init__(self, cfg: Dict, dictionary: Dictionary):
        super().__init__(cfg)
        self.dict = dictionary
        self.src_len = int(cfg.get("src_len", 30))
        self.tgt_len = int(cfg.get("tgt_len", 30))

    @classmethod
    def setup_task(cls, cfg: Dict, **kwargs):
        d = _synthetic_dictionary(int(cfg.get("dict_size", 49996)))
        logger.info(f"dummy_mt: dict {len(d)}, "
                    f"src/tgt len {cfg.get('src_len', 30)}/{cfg.get('tgt_len', 30)}")
        return cls(cfg, d)

    def load_dataset(self, split: str, **kwargs):
        lo = self.dict.nspecial
        src = (np.arange(self.src_len, dtype=np.int32) % (len(self.dict) - lo)) + lo
        tgt = (np.arange(self.tgt_len, dtype=np.int32) % (len(self.dict) - lo)) + lo
        tgt[-1] = self.dict.eos()
        prev = np.concatenate([[self.dict.eos()], tgt[:-1]]).astype(np.int32)
        ex = {"src_tokens": src, "prev_output_tokens": prev, "target": tgt}
        self.datasets[split] = _FixedBatchDataset(
            ex, int(self.cfg.get("dataset_size", 10000)), {}
        )

    @property
    def source_dictionary(self):
        return self.dict

    @property
    def target_dictionary(self):
        return self.dict


@register_task("dummy_lm")
class DummyLMTask(ChimeraTask):
    def __init__(self, cfg: Dict, dictionary: Dictionary):
        super().__init__(cfg)
        self.dict = dictionary
        self.tokens_per_sample = int(cfg.get("tokens_per_sample", 512))

    @classmethod
    def setup_task(cls, cfg: Dict, **kwargs):
        return cls(cfg, _synthetic_dictionary(int(cfg.get("dict_size", 49996))))

    def load_dataset(self, split: str, **kwargs):
        lo = self.dict.nspecial
        seq = (np.arange(self.tokens_per_sample + 1, dtype=np.int32)
               % (len(self.dict) - lo)) + lo
        ex = {"net_tokens": seq[:-1], "target": seq[1:]}
        self.datasets[split] = _FixedBatchDataset(
            ex, int(self.cfg.get("dataset_size", 10000)), {}
        )

    @property
    def target_dictionary(self):
        return self.dict


@register_task("dummy_masked_lm")
class DummyMaskedLMTask(ChimeraTask):
    """Synthetic masked-LM batches for harness benchmarking (reference:
    fairseq/benchmark/dummy_masked_lm.py:17-63 — every 15th position is
    masked, targets are pad elsewhere)."""

    def __init__(self, cfg: Dict, dictionary: Dictionary):
        super().__init__(cfg)
        self.dict = dictionary
        self.mask_idx = dictionary.add_symbol("<mask>")
        self.tokens_per_sample = int(cfg.get("tokens_per_sample", 512))

    @classmethod
    def setup_task(cls, cfg: Dict, **kwargs):
        return cls(cfg, _synthetic_dictionary(int(cfg.get("dict_size", 49995))))

    def load_dataset(self, split: str, **kwargs):
        lo = self.dict.nspecial
        T = self.tokens_per_sample
        seq = (np.arange(T, dtype=np.int32) % (len(self.dict) - lo)) + lo
        mask = np.arange(T) % 15 == 0  # ~1/15 masked, deterministic
        net = np.where(mask, self.mask_idx, seq).astype(np.int32)
        tgt = np.where(mask, seq, self.dict.pad()).astype(np.int32)
        ex = {"net_tokens": net, "target": tgt}
        self.datasets[split] = _FixedBatchDataset(
            ex, int(self.cfg.get("dataset_size", 10000)), {}
        )

    @property
    def source_dictionary(self):
        return self.dict

    @property
    def target_dictionary(self):
        return self.dict
