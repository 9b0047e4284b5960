"""Speech-to-text task (reference: fairseq/tasks/speech_to_text.py and the
BLEU-validating variant fairseq/tasks/speech_to_text_bleu.py:28-297)."""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict

import numpy as np

from ..config.registry import register_task
from ..data.dictionary import Dictionary
from ..data.manifests import S2TDataConfig, make_dataset_from_tsv
from .base import ChimeraTask

logger = logging.getLogger(__name__)


@register_task("speech_to_text")
class SpeechToTextTask(ChimeraTask):
    def __init__(self, cfg: Dict, tgt_dict: Dictionary, data_cfg: S2TDataConfig):
        super().__init__(cfg)
        self.tgt_dict = tgt_dict
        self.data_cfg = data_cfg

    @classmethod
    def setup_task(cls, cfg: Dict, **kwargs):
        root = Path(cfg["data"])
        data_cfg = S2TDataConfig(str(root / cfg.get("config_yaml", "config_wave.yaml")))
        tgt_dict = cls.load_dictionary(str(root / data_cfg.vocab_filename))
        return cls(cfg, tgt_dict, data_cfg)

    def load_dataset(self, split: str, **kwargs):
        self.datasets[split] = make_dataset_from_tsv(
            self.cfg["data"],
            split,
            self.data_cfg,
            self.tgt_dict,
            split.startswith("train"),
            seed=int(self.cfg.get("seed", 1)),
        )

    @property
    def target_dictionary(self) -> Dictionary:
        return self.tgt_dict

    def lang_tag_indices(self):
        """Ids of <lang:xx> tags, stripped from hypotheses before scoring
        (reference: speech_to_text.py build_generator symbols_to_strip)."""
        return {
            i
            for s, i in self.tgt_dict.indices.items()
            if s.startswith("<lang:")
        }


@register_task("speech_to_text_bleu")
class SpeechToTextBLEUTask(SpeechToTextTask):
    """Runs beam search during validation and aggregates corpus BLEU via
    summable count buckets (reference: speech_to_text_bleu.py:207-297)."""

    def valid_bleu_counts(self, generator, model_params, batch, decode_fn):
        tokens, scores, lens = generator._jit_generate(
            model_params,
            *generator._jit_encode_audio(
                model_params, batch["audio"], batch["audio_padding_mask"]
            ),
            None,
            beam_size=generator.s.beam_size,
        )
        import sacrebleu

        hyps, refs = [], []
        strip = self.lang_tag_indices()
        t, l = np.asarray(tokens), np.asarray(lens)
        for b in range(t.shape[0]):
            hyp_ids = t[b, 0, : l[b, 0]]
            hyps.append(decode_fn(self.tgt_dict.string(
                hyp_ids, bpe_symbol="sentencepiece",
                extra_symbols_to_ignore=strip)))
            refs.append(decode_fn(self.tgt_dict.string(
                batch["target"][b], bpe_symbol="sentencepiece",
                extra_symbols_to_ignore=strip)))
        bleu = sacrebleu.corpus_bleu(hyps, [refs], tokenize="13a")
        # summable buckets (fast-stat-sync pattern)
        return {
            **{f"_bleu_counts_{i}": c for i, c in enumerate(bleu.counts)},
            **{f"_bleu_totals_{i}": c for i, c in enumerate(bleu.totals)},
            "_bleu_sys_len": bleu.sys_len,
            "_bleu_ref_len": bleu.ref_len,
        }

    @staticmethod
    def bleu_from_counts(agg: Dict) -> float:
        import sacrebleu

        return sacrebleu.BLEU.compute_bleu(
            correct=[agg[f"_bleu_counts_{i}"] for i in range(4)],
            total=[agg[f"_bleu_totals_{i}"] for i in range(4)],
            sys_len=int(agg["_bleu_sys_len"]),
            ref_len=int(agg["_bleu_ref_len"]),
            smooth_method="exp",
        ).score
