from ..config.registry import ARCHITECTURES, MODELS
from .interlingua import ChimeraInterlinguaModel, InterlinguaConfig
from . import bart, berard, wav2vec2_pretraining, fconv, fconv_self_att, hf_gpt2, lightconv_mt, lm_extra, lstm, masked_lm, multilingual_transformer, nat_cmlm, nat_insertion, nat_levenshtein, nat_vanilla, pipeline_lm, roberta_hub, s2t_transformer, transformer_mt, wav2vec2_asr, wav2vec_v1  # noqa: F401 — registration


def build_model_from_arch(arch: str, cfg_dict=None, **kw):
    """Resolve an architecture preset and build the flax module."""
    model_name, preset = ARCHITECTURES.get(arch)
    cfg_dict = preset(dict(cfg_dict or {}))
    builder = MODELS.get(model_name)
    return builder(cfg_dict, **kw)


__all__ = [
    "ChimeraInterlinguaModel",
    "InterlinguaConfig",
    "build_model_from_arch",
]
