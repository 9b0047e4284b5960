"""BART denoising pretraining tasks.

reference: fairseq/tasks/denoising.py:31-250 (monolingual) and
fairseq/tasks/multilingual_denoising.py (per-language shards with temperature
resampling and language-tag suffixes). Both drive DenoisingDataset over
token-block views of binarized corpora and train a seq2seq model (BART) with
standard label-smoothed CE — the "task" layer here only wires data.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..config.registry import register_task
from ..data.denoising_dataset import DenoisingDataset
from ..data.dictionary import Dictionary
from ..data.indexed_dataset import MMapIndexedDataset
from ..data.token_block_dataset import TokenBlockDataset
from ..data.wrappers import IdStampedConcat
from .base import ChimeraTask
from ..data.batching import round16

logger = logging.getLogger(__name__)


def _denoise_kwargs(cfg: Dict) -> Dict:
    return dict(
        mask=float(cfg.get("mask", 0.3)),
        mask_random=float(cfg.get("mask_random", 0.1)),
        insert=float(cfg.get("insert", 0.0)),
        rotate=float(cfg.get("rotate", 0.0)),
        permute_sentence_ratio=float(cfg.get("permute_sentences", 0.0)),
        poisson_lambda=float(cfg.get("poisson_lambda", 3.5)),
        replace_length=int(cfg.get("replace_length", 1)),
        seed=int(cfg.get("seed", 1)),
    )


@register_task("denoising")
class DenoisingTask(ChimeraTask):
    """Monolingual BART pretraining (reference: tasks/denoising.py:31-250)."""

    text_only = True

    def __init__(self, cfg: Dict, dictionary: Dictionary):
        super().__init__(cfg)
        self.dictionary = dictionary
        self.mask_idx = dictionary.add_symbol("<mask>")

    @classmethod
    def setup_task(cls, cfg: Dict, **kwargs):
        d = cls.load_dictionary(str(Path(cfg["data"]) / "dict.txt"))
        return cls(cfg, d)

    def _blocks(self, path: str) -> TokenBlockDataset:
        data = MMapIndexedDataset(path)
        return TokenBlockDataset(
            data, data.sizes,
            int(self.cfg.get("tokens_per_sample", 512)) - 2,  # room for bos/eos
            pad=self.dictionary.pad(), eos=self.dictionary.eos(),
            break_mode=self.cfg.get("sample_break_mode", "complete"),
        )

    def _wrap(self, blocks, append_tokens=None) -> DenoisingDataset:
        d = self.dictionary
        full_stop = d.index(".") if "." in d.indices else None
        return DenoisingDataset(
            blocks, len(d), self.mask_idx,
            pad=d.pad(), bos=d.bos(), eos=d.eos(),
            full_stop_idx=full_stop,
            append_tokens=append_tokens,
            **_denoise_kwargs(self.cfg),
        )

    def load_dataset(self, split: str, **kwargs):
        root = Path(self.cfg["data"])
        self.datasets[split] = self._wrap(self._blocks(str(root / split)))

    @property
    def source_dictionary(self) -> Dictionary:
        return self.dictionary

    @property
    def target_dictionary(self) -> Dictionary:
        return self.dictionary

    def collate_indices(self, dataset, idx, target_len=None):
        samples = [dataset[int(i)] for i in idx]
        src_max = round16(max(len(s["source"]) for s in samples))
        tgt_max = round16(max(len(s["target"]) for s in samples))
        return dataset.collater(
            samples, src_target_len=src_max, tgt_target_len=tgt_max
        )


@register_task("multilingual_denoising")
class MultilingualDenoisingTask(DenoisingTask):
    """mBART-style pretraining: one corpus per language subdirectory, sampled
    with temperature alpha, each sample suffixed with its [lang] tag
    (reference: tasks/multilingual_denoising.py — langs from subdirs, lang-id
    appended when add_lang_token)."""

    @classmethod
    def setup_task(cls, cfg: Dict, **kwargs):
        root = Path(cfg["data"])
        d = cls.load_dictionary(str(root / "dict.txt"))
        langs = cfg.get("langs")
        if langs:
            langs = [l for l in str(langs).split(",") if l]
        else:
            langs = sorted(
                p.name for p in root.iterdir()
                if p.is_dir() and (p / "dict.txt").exists()
                or p.is_dir() and any(p.glob("train*.idx"))
            )
        if not langs:
            raise FileNotFoundError(f"no language subdirectories under {root}")
        # symbol order matters for checkpoint/data interop: the reference
        # adds the [lang] tokens FIRST (multilingual_denoising.py:74, in
        # setup_task) and <mask> LAST (:87, in __init__) — constructing the
        # task first used to reverse that, shifting every lang-tag id vs
        # reference-built vocabularies (review fix)
        if bool(cfg.get("add_lang_token", True)):
            for lang in langs:
                d.add_symbol(f"[{lang}]")
        task = cls(cfg, d)
        task.langs = langs
        return task

    def lang_tag_indices(self):
        return {
            self.dictionary.index(f"[{l}]")
            for l in self.langs
            if f"[{l}]" in self.dictionary.indices
        }

    def load_dataset(self, split: str, **kwargs):
        from ..data.wrappers import ConcatDataset, ResamplingDataset

        root = Path(self.cfg["data"])
        alpha = float(self.cfg.get("multilang_sampling_alpha", 1.0))
        per_lang = []
        sizes = []
        for lang in self.langs:
            blocks = self._blocks(str(root / lang / split))
            tag = None
            if bool(self.cfg.get("add_lang_token", True)):
                tag = np.asarray(
                    [self.dictionary.index(f"[{lang}]")], np.int64
                )
            per_lang.append(self._wrap(blocks, append_tokens=tag))
            sizes.append(len(blocks))
        if split == self.cfg.get("train_subset", "train") and len(per_lang) > 1:
            # temperature resampling (reference: multilingual_denoising.py
            # _get_sample_prob: p_l ~ (n_l / N)^alpha)
            probs = np.asarray(sizes, np.float64) / max(sum(sizes), 1)
            smoothed = probs**alpha
            smoothed /= smoothed.sum()
            total = sum(sizes)
            ratios = smoothed * total / np.maximum(sizes, 1)
            per_lang = [
                ResamplingDataset(
                    ds, size_ratio=float(r), seed=int(self.cfg.get("seed", 1))
                )
                for ds, r in zip(per_lang, ratios)
            ]
        self.datasets[split] = _MultilingualView(per_lang, self)

    def collate_indices(self, dataset, idx, target_len=None):
        return DenoisingTask.collate_indices(self, dataset, idx, target_len)


class _MultilingualView(IdStampedConcat):
    """Concat of per-language denoising datasets sharing one collater."""

    def __init__(self, datasets: List, task):
        super().__init__(datasets)
        self.task = task
