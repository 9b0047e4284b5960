"""Language modeling task (reference: fairseq/tasks/language_modeling.py)."""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ..config.registry import register_criterion, register_task
from ..data.batching import collate_tokens, round16
from ..data.dictionary import Dictionary
from ..data.indexed_dataset import MMapIndexedDataset
from ..data.token_block_dataset import TokenBlockDataset
from .base import ChimeraTask

logger = logging.getLogger(__name__)


class MonolingualDataset:
    """Wraps token blocks into (input, target) LM pairs: input is the block
    shifted right with eos prepended."""

    def __init__(self, blocks: TokenBlockDataset, pad: int, eos: int):
        self.blocks = blocks
        self.pad = pad
        self.eos = eos

    def __len__(self):
        return len(self.blocks)

    def num_tokens(self, i: int) -> int:
        return self.blocks.num_tokens(i)

    def __getitem__(self, i: int):
        tok = self.blocks[i]
        return {"id": i, "target": tok,
                "source": np.concatenate([[self.eos], tok[:-1]]).astype(np.int32)}

    def collater(self, samples, target_len: Optional[int] = None):
        if not samples:
            return {}
        src = collate_tokens([s["source"] for s in samples], self.pad,
                             target_len=target_len, dtype=np.int32)
        tgt = collate_tokens([s["target"] for s in samples], self.pad,
                             target_len=target_len, dtype=np.int32)
        return {
            "id": np.asarray([s["id"] for s in samples], np.int64),
            "net_tokens": src,
            "target": tgt,
            "ntokens": float(sum(len(s["target"]) for s in samples)),
            "nsentences": len(samples),
        }


class ShortenedDataset:
    """Per-document shortening to ``max_len`` tokens before LM block
    building (reference: fairseq/data/shorten_dataset.py
    TruncateDataset/RandomCropDataset): "truncate" keeps the prefix,
    "random_crop" takes a deterministic per-(seed, index) window."""

    def set_epoch(self, epoch: int):
        self.epoch = int(epoch)

    def __init__(self, base, max_len: int, method: str, seed: int = 1):
        assert method in ("truncate", "random_crop"), method
        self.base = base
        self.max_len = int(max_len)
        self.method = method
        self.seed = seed
        self.sizes = np.minimum(np.asarray(base.sizes), self.max_len)

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i: int):
        item = self.base[int(i)]
        n = len(item)
        if n <= self.max_len:
            return item
        if self.method == "truncate":
            return item[: self.max_len]
        rng = np.random.default_rng(
            (self.seed, getattr(self, "epoch", 1), int(i)))
        start = int(rng.integers(0, n - self.max_len + 1))
        return item[start : start + self.max_len]


@register_task("language_modeling")
class LanguageModelingTask(ChimeraTask):
    text_only = True

    def __init__(self, cfg: Dict, dictionary: Dictionary):
        super().__init__(cfg)
        self.dictionary = dictionary

    @classmethod
    def setup_task(cls, cfg: Dict, **kwargs):
        root = Path(cfg["data"])
        d = cls.load_dictionary(str(root / "dict.txt"))
        return cls(cfg, d)

    def load_dataset(self, split: str, **kwargs):
        root = Path(self.cfg["data"])
        data = MMapIndexedDataset(str(root / split))
        method = self.cfg.get("shorten_method", "none")
        splits = str(self.cfg.get("shorten_data_split_list", "") or "")
        if method != "none" and (not splits or split in splits.split(",")):
            # document shortening before block building (reference:
            # fairseq/data/shorten_dataset.py via --shorten-method
            # truncate|random_crop + --shorten-data-split-list)
            data = ShortenedDataset(
                data,
                int(self.cfg.get("tokens_per_sample", 512)),
                method,
                seed=int(self.cfg.get("seed", 1)),
            )
        blocks = TokenBlockDataset(
            data,
            data.sizes,
            int(self.cfg.get("tokens_per_sample", 512)),
            pad=self.dictionary.pad(),
            eos=self.dictionary.eos(),
            break_mode=self.cfg.get("sample_break_mode", "none"),
        )
        self.datasets[split] = MonolingualDataset(
            blocks, self.dictionary.pad(), self.dictionary.eos()
        )

    @property
    def target_dictionary(self) -> Dictionary:
        return self.dictionary

    def collate_indices(self, dataset, idx, target_len):
        samples = [dataset[int(i)] for i in idx]
        tl = round16(max(len(s["target"]) for s in samples))
        return dataset.collater(samples, tl)


@register_criterion("lm_cross_entropy")
def make_lm_cross_entropy(cfg: Dict):
    from .base import ChimeraTask  # noqa
    from ..criterions.label_smoothed_ce import ce_loss_from_logits

    ignore_index = int(cfg.get("padding_idx", 1))
    eps = float(cfg.get("label_smoothing", 0.0))

    def criterion(model, params, batch, rngs=None, num_updates=None, train=True):
        logits = model.apply(
            params, batch["net_tokens"], deterministic=not train, rngs=rngs
        )
        loss, nll = ce_loss_from_logits(logits, batch["target"], eps, ignore_index)
        ntokens = batch["ntokens"]
        sample_size = ntokens
        return loss, sample_size, {
            "loss": loss, "nll_loss": nll, "ntokens": ntokens,
            "nsentences": batch["target"].shape[0], "sample_size": sample_size,
        }

    return criterion
