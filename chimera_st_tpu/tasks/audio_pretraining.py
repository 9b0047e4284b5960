"""Audio pretraining tasks (reference: fairseq/tasks/audio_pretraining.py and
the bimodal variant fairseq/tasks/bimodal_pretraining.py:22-163)."""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict

import jax.numpy as jnp

from ..config.registry import register_task
from ..data.raw_audio_dataset import BimodalRawAudioDataset, RawAudioDataset
from .base import ChimeraTask

logger = logging.getLogger(__name__)


@register_task("audio_pretraining")
class AudioPretrainingTask(ChimeraTask):
    """Self-supervised pretraining over raw waveforms; with ``labels`` set
    (reference: audio_pretraining.py:65,85-124) the same task drives ASR
    fine-tuning — targets come from ``{split}.{labels}`` lines encoded with
    ``dict.{labels}.txt`` and the models are the registry's wav2vec_ctc /
    wav2vec_seq2seq fine-tune heads."""

    DATASET_CLS = RawAudioDataset

    def __init__(self, cfg: Dict):
        super().__init__(cfg)
        self._label_dict = None
        if cfg.get("labels"):
            dict_path = Path(cfg["data"]) / f"dict.{cfg['labels']}.txt"
            self._label_dict = self.load_dictionary(str(dict_path))

    @classmethod
    def setup_task(cls, cfg: Dict, **kwargs):
        return cls(cfg)

    @property
    def target_dictionary(self):
        return self._label_dict

    def load_dataset(self, split: str, **kwargs):
        from ..models.wav2vec2 import DEFAULT_CONV_SPEC, extractor_output_length

        conv_spec = (
            self.cfg.get("conv_spec")
            or self.cfg.get("w2v2_conv_spec")  # model-side flag name
            or DEFAULT_CONV_SPEC
        )
        frames_fn = lambda n: extractor_output_length(n, tuple(map(tuple, conv_spec)))
        root = Path(self.cfg["data"])
        base = self.DATASET_CLS.from_tsv(
            str(root / f"{split}.tsv"),
            audio_root=self.cfg.get("audio_root", str(root)),
            max_sample_size=int(self.cfg.get("max_sample_size", 250000)),
            min_sample_size=int(self.cfg.get("min_sample_size", 32000)),
            mask_prob=float(self.cfg.get("mask_prob", 0.65)),
            mask_length=int(self.cfg.get("mask_length", 10)),
            num_negatives=int(self.cfg.get("num_negatives", 100)),
            frames_fn=frames_fn,
        )
        if not self.cfg.get("labels"):
            self.datasets[split] = base
            return
        # fine-tune split: one label line per (post-filter) manifest row.
        # seq2seq decoding needs eos-terminated targets; CTC ignores the
        # rotation and just reads non-pad labels.
        from ..data.raw_audio_dataset import AddTargetDataset

        label_path = root / f"{split}.{self.cfg['labels']}"
        append_eos = bool(self.cfg.get("autoregressive", False))
        with open(label_path) as f:
            all_labels = [
                self._label_dict.encode_line(line, append_eos=append_eos)
                for line in f
            ]
        kept = [all_labels[j] for j in base.kept_indices]
        self.datasets[split] = AddTargetDataset(
            base,
            kept,
            pad_idx=self._label_dict.pad(),
            eos_idx=self._label_dict.eos(),
        )

    def build_model(self, model_cfg: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
        import dataclasses

        if self.cfg.get("labels"):
            # fine-tune archs (wav2vec_ctc / wav2vec_seq2seq) resolve through
            # the generic registry with the label vocab injected
            return super().build_model(model_cfg, dtype, param_dtype)

        from ..models.wav2vec2_pretraining import build_w2v2_pretrain

        return build_w2v2_pretrain(model_cfg, dtype, param_dtype)

    def collate_indices(self, dataset, idx, audio_target_len):
        return dataset.collater([dataset[int(i)] for i in idx], audio_target_len)


@register_task("bimodal_pretraining")
class BimodalPretrainingTask(AudioPretrainingTask):
    """Two aligned waveform streams with shared mask indices
    (reference: bimodal_pretraining.py:22-163). Manifest rows carry audio +
    audio2 columns (same-window crops keep the streams aligned); drives the
    ``wav2vec_bimodal`` / ``aligning_loss_bimodal`` criteria."""

    DATASET_CLS = BimodalRawAudioDataset
