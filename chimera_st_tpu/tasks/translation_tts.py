"""Translation task with TTS-synthesized source audio
(reference: fairseq/tasks/translation_tts.py:166-465 — parallel text whose
rows may carry per-index synthesized wavs; audio batches drive the speech
branch so text corpora participate in the tri-modal objective)."""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ..config.registry import register_task
from ..data.indexed_dataset import MMapIndexedDataset
from ..data.language_pair_tts import LanguagePairTTSDataset
from .translation import TranslationTask
from ..data.batching import round16

logger = logging.getLogger(__name__)


@register_task("translation_tts")
class TranslationTTSTask(TranslationTask):
    def load_dataset(self, split: str, **kwargs):
        root = Path(self.cfg["data"])
        src, tgt = self.cfg["source_lang"], self.cfg["target_lang"]
        prefix = str(root / f"{split}.{src}-{tgt}.")
        src_data = MMapIndexedDataset(prefix + src)
        tgt_data = MMapIndexedDataset(prefix + tgt)
        audio_dir = self.cfg.get("audio_dirname")
        if isinstance(audio_dir, dict):  # per-split dirs (reference :248-250)
            audio_dir = audio_dir.get(split)
        self.datasets[split] = LanguagePairTTSDataset(
            src_data,
            tgt_data,
            self.src_dict,
            self.tgt_dict,
            audio_dirname=audio_dir,
        )

    def collate_indices(self, dataset, idx, target_len: Optional[int] = None):
        samples = [dataset[int(i)] for i in idx]
        src_max = round16(max(len(s["source"]) for s in samples))
        tgt_max = round16(max(len(s["target"]) for s in samples))
        audio_max = None
        if all("wave" in s for s in samples):
            audio_max = ((max(len(s["wave"]) for s in samples) + 1279) // 1280) * 1280
        return dataset.collater(
            samples,
            src_target_len=src_max,
            tgt_target_len=tgt_max,
            audio_target_len=audio_max,
        )
