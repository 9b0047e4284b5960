"""Triplet task: (audio, src_text, tgt_text) speech translation
(reference: fairseq/tasks/triplet.py:27-241).

Data dir layout matches the reference: ``{data}/config_wave.yaml`` +
``{split}.tsv`` manifests + vocab files. Interactive inference consumes .wav
file paths (reference: triplet.py:234-241). ``valid_step`` memory dumping
(--dump-feature-to-file) is exposed via `dump_memories`.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..config.registry import register_task
from ..data.audio import read_wav
from ..data.dictionary import Dictionary
from ..data.manifests import TripletDataConfig, make_dataset_from_tsv
from .base import ChimeraTask
from ..data.batching import round16, round16_or_none

logger = logging.getLogger(__name__)


@register_task("triplet")
class TripletTask(ChimeraTask):
    def __init__(self, cfg: Dict, tgt_dict: Dictionary, src_dict: Dictionary, data_cfg):
        super().__init__(cfg)
        self.tgt_dict = tgt_dict
        self.src_dict = src_dict
        self.data_cfg = data_cfg

    @classmethod
    def setup_task(cls, cfg: Dict, **kwargs):
        root = Path(cfg["data"])
        data_cfg = TripletDataConfig(str(root / cfg.get("config_yaml", "config_wave.yaml")))
        tgt_dict = cls.load_dictionary(str(root / data_cfg.vocab_filename))
        src_dict = cls.load_dictionary(str(root / data_cfg.src_vocab_filename))
        logger.info(
            f"triplet task: tgt dict {len(tgt_dict)}, src dict {len(src_dict)}"
        )
        return cls(cfg, tgt_dict, src_dict, data_cfg)

    def load_dataset(self, split: str, **kwargs):
        is_train = split.startswith("train")
        self.datasets[split] = make_dataset_from_tsv(
            self.cfg["data"],
            split,
            self.data_cfg,
            self.tgt_dict,
            is_train,
            src_dict=self.src_dict,
            triplet=True,
            seed=int(self.cfg.get("seed", 1)),
        )

    @property
    def source_dictionary(self) -> Dictionary:
        return self.src_dict

    @property
    def target_dictionary(self) -> Dictionary:
        return self.tgt_dict

    def collate_indices(self, dataset, idx, audio_target_len):
        samples = [dataset[int(i)] for i in idx]
        # text lengths bucketed to fixed sizes too (static decoder shapes)
        tgt_max = max(len(s.target) for s in samples) if samples[0].target is not None else 0
        src_max = (
            max(len(s.source_text) for s in samples)
            if samples[0].source_text is not None
            else 0
        )
        return dataset.collater(
            samples,
            audio_target_len=audio_target_len,
            text_target_len=round16_or_none(tgt_max),
            src_target_len=round16_or_none(src_max),
        )

    # ------------------------------------------------------- interactive

    def get_interactive_examples(self, lines: List[str]):
        """Lines are .wav paths (reference: triplet.py:234-241)."""
        wavs = []
        for line in lines:
            wav, sr = read_wav(line.strip())
            wavs.append(wav.astype(np.float32))
        return wavs

    def batch_interactive(self, wavs: List[np.ndarray]):
        T = max(len(w) for w in wavs)
        T = ((T + 1279) // 1280) * 1280  # bucket to w2v2 stride multiples
        audio = np.zeros((len(wavs), T), np.float32)
        mask = np.ones((len(wavs), T), bool)
        for i, w in enumerate(wavs):
            audio[i, : len(w)] = w
            mask[i, : len(w)] = False
        return {"audio": audio, "audio_padding_mask": mask,
                "audio_lengths": np.asarray([len(w) for w in wavs], np.int32)}

    def dump_memories(self, model, params, batch) -> Dict[str, np.ndarray]:
        """Audio/text memory banks for visualization
        (reference: triplet.py:196-232 --dump-feature-to-file)."""
        from ..models.interlingua import ChimeraInterlinguaModel

        audio_mem, _ = model.apply(
            params,
            batch["audio"],
            batch["audio_padding_mask"],
            method=ChimeraInterlinguaModel.encode_audio,
        )
        out = {"audio_memory": np.asarray(audio_mem)}
        if "src_text" in batch:
            text_mem, _ = model.apply(
                params, batch["src_text"], method=ChimeraInterlinguaModel.encode_text
            )
            out["text_memory"] = np.asarray(text_mem)
        return out


@register_task("speech_to_text_triplet_infer")
class TripletInferenceTask(TripletTask):
    """Alias used by interactive configs."""
