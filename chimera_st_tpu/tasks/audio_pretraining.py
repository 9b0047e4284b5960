"""Audio pretraining tasks (reference: fairseq/tasks/audio_pretraining.py and
the bimodal variant fairseq/tasks/bimodal_pretraining.py:22-163)."""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict

import jax.numpy as jnp

from ..config.registry import register_task
from ..data.raw_audio_dataset import RawAudioDataset
from .base import ChimeraTask

logger = logging.getLogger(__name__)


@register_task("audio_pretraining")
class AudioPretrainingTask(ChimeraTask):
    @classmethod
    def setup_task(cls, cfg: Dict, **kwargs):
        return cls(cfg)

    def load_dataset(self, split: str, **kwargs):
        from ..models.wav2vec2 import DEFAULT_CONV_SPEC, extractor_output_length

        conv_spec = self.cfg.get("conv_spec") or DEFAULT_CONV_SPEC
        frames_fn = lambda n: extractor_output_length(n, tuple(map(tuple, conv_spec)))
        root = Path(self.cfg["data"])
        self.datasets[split] = RawAudioDataset.from_tsv(
            str(root / f"{split}.tsv"),
            audio_root=self.cfg.get("audio_root", str(root)),
            max_sample_size=int(self.cfg.get("max_sample_size", 250000)),
            min_sample_size=int(self.cfg.get("min_sample_size", 32000)),
            mask_prob=float(self.cfg.get("mask_prob", 0.65)),
            mask_length=int(self.cfg.get("mask_length", 10)),
            num_negatives=int(self.cfg.get("num_negatives", 100)),
            frames_fn=frames_fn,
        )

    def build_model(self, model_cfg: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
        import dataclasses

        from ..models.wav2vec2_pretraining import (
            W2V2PretrainConfig,
            Wav2Vec2PretrainModel,
        )

        known = {f.name for f in dataclasses.fields(W2V2PretrainConfig)}
        cfg = W2V2PretrainConfig(
            **{k: v for k, v in model_cfg.items() if k in known}
        )
        return Wav2Vec2PretrainModel(cfg, dtype=dtype, param_dtype=param_dtype)

    def collate_indices(self, dataset, idx, audio_target_len):
        return dataset.collater([dataset[int(i)] for i in idx], audio_target_len)


@register_task("bimodal_pretraining")
class BimodalPretrainingTask(AudioPretrainingTask):
    """Two aligned waveform streams with shared mask indices
    (reference: bimodal_pretraining.py:22-163). Dataset rows carry audio +
    audio2 columns; the collater mirrors the unimodal one."""
