from ..config.registry import TASKS
from .base import ChimeraTask
from . import audio_pretraining, denoising, dummy, joint_task, language_modeling, masked_lm, multilingual_translation, sentence_prediction, lm_tail, speech_to_text, translation, translation_extra, translation_lev, translation_tts, triplet  # noqa: F401 — registration


def setup_task(cfg: dict, **kwargs) -> ChimeraTask:
    name = cfg.get("_name")
    return TASKS.get(name).setup_task(cfg, **kwargs)


__all__ = ["ChimeraTask", "setup_task", "TASKS"]
