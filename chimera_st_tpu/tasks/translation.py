"""Translation task over binarized parallel corpora
(reference: fairseq/tasks/translation.py — the MT pre-training stage of the
Chimera recipes, trained on fairseq-preprocess output with the interlingua
model's text branch; BLEU-during-validation drives best-checkpoint selection,
reference: translation.py:218-239,335+).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ..config.registry import register_task
from ..data.dictionary import Dictionary
from ..data.indexed_dataset import MMapIndexedDataset
from ..data.language_pair import LanguagePairDataset
from .base import ChimeraTask
from ..data.batching import round16

logger = logging.getLogger(__name__)


@register_task("translation")
class TranslationTask(ChimeraTask):
    text_only = True

    def __init__(self, cfg: Dict, src_dict: Dictionary, tgt_dict: Dictionary):
        super().__init__(cfg)
        self.src_dict = src_dict
        self.tgt_dict = tgt_dict

    @classmethod
    def setup_task(cls, cfg: Dict, **kwargs):
        root = Path(cfg["data"])
        src, tgt = cfg.get("source_lang"), cfg.get("target_lang")
        if src is None or tgt is None:
            src, tgt = cls.infer_language_pair(root)
        cfg["source_lang"], cfg["target_lang"] = src, tgt
        src_dict = cls.load_dictionary(str(root / f"dict.{src}.txt"))
        tgt_dict = cls.load_dictionary(str(root / f"dict.{tgt}.txt"))
        assert src_dict.pad() == tgt_dict.pad()
        logger.info(f"translation {src}->{tgt}: dicts {len(src_dict)}/{len(tgt_dict)}")
        return cls(cfg, src_dict, tgt_dict)

    @staticmethod
    def infer_language_pair(root: Path):
        """Find {split}.{src}-{tgt}.* files (reference: translation.py infer)."""
        for p in sorted(root.glob("train.*-*.idx")):
            parts = p.name.split(".")
            if len(parts) >= 3 and "-" in parts[1]:
                src, tgt = parts[1].split("-")
                return src, tgt
        raise FileNotFoundError(f"cannot infer language pair under {root}")

    def load_dataset(self, split: str, **kwargs):
        root = Path(self.cfg["data"])
        src, tgt = self.cfg["source_lang"], self.cfg["target_lang"]
        prefix = str(root / f"{split}.{src}-{tgt}.")
        src_data = MMapIndexedDataset(prefix + src)
        tgt_data = MMapIndexedDataset(prefix + tgt)
        self.datasets[split] = LanguagePairDataset(
            src_data, tgt_data, self.src_dict, self.tgt_dict
        )

    @property
    def source_dictionary(self) -> Dictionary:
        return self.src_dict

    @property
    def target_dictionary(self) -> Dictionary:
        return self.tgt_dict

    def collate_indices(self, dataset, idx, target_len: Optional[int] = None):
        samples = [dataset[int(i)] for i in idx]
        src_max = round16(max(len(s["source"]) for s in samples))
        tgt_max = round16(max(len(s["target"]) for s in samples))
        return dataset.collater(
            samples, src_target_len=src_max, tgt_target_len=tgt_max
        )
