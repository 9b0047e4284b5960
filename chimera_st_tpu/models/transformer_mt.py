"""Standalone text transformer models.

- `TransformerModel` — encoder-decoder MT transformer
  (reference: fairseq/models/transformer.py:39-1025, arch "transformer"),
- `TransformerLM` — decoder-only language model
  (reference: fairseq/models/transformer_lm.py).

Both reuse the shared layer stack; the MT model is the text-only subset of
the interlingua model without memory slots."""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.registry import register_model, register_model_architecture
from .embedding import Embed
from .layers import (
    LayerNorm,
    TransformerEncoderLayer,
    positional_embedding_from_mask,
)
from .transformer_decoder import TransformerDecoder

Dtype = Any


@dataclass(frozen=True)
class TransformerMTConfig:
    src_vocab_size: int = 8
    tgt_vocab_size: int = 8
    padding_idx: int = 1
    encoder_embed_dim: int = 512
    encoder_ffn_dim: int = 2048
    encoder_layers: int = 6
    encoder_heads: int = 8
    encoder_normalize_before: bool = False
    decoder_embed_dim: int = 512
    decoder_ffn_dim: int = 2048
    decoder_layers: int = 6
    decoder_heads: int = 8
    decoder_normalize_before: bool = False
    share_decoder_input_output_embed: bool = True
    share_all_embeddings: bool = False
    max_target_positions: int = 1024
    decoder_causal: bool = True  # False: bidirectional (CMLM)
    dropout: float = 0.1
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    activation: str = "relu"
    no_scale_embedding: bool = False
    # BART-style options (reference: fairseq/models/bart/model.py —
    # learned positions + embedding layernorm)
    learned_pos: bool = False
    layernorm_embedding: bool = False
    # pipeline parallelism: encoder and decoder stacks each pipelined over
    # the `pipe` mesh axis (reference: pipeline_parallel_transformer's
    # pipeline_encoder_balance / pipeline_decoder_balance,
    # model_parallel/models/pipeline_parallel_transformer/model.py:441-463)
    pipeline_stages: int = 0
    pipeline_chunks: int = 0
    pipeline_remat: bool = False


class TransformerModel(nn.Module):
    cfg: TransformerMTConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    # mesh with a `pipe` axis, required when cfg.pipeline_stages > 1
    pipeline_mesh: Any = None

    def setup(self):
        c = self.cfg
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embed_tokens = Embed(
            c.src_vocab_size, c.encoder_embed_dim, padding_idx=c.padding_idx,
            name="embed_tokens", **common,
        )
        self.encoder_layers_list = [
            TransformerEncoderLayer(
                c.encoder_embed_dim, c.encoder_ffn_dim, c.encoder_heads,
                dropout=c.dropout, attention_dropout=c.attention_dropout,
                activation_dropout=c.activation_dropout, activation=c.activation,
                normalize_before=c.encoder_normalize_before,
                name=f"layers_{i}", **common,
            )
            for i in range(c.encoder_layers)
        ]
        if c.encoder_normalize_before:
            self.encoder_layer_norm = LayerNorm(
                c.encoder_embed_dim, dtype=self.dtype, name="encoder_layer_norm"
            )
        self.decoder = TransformerDecoder(
            vocab_size=c.tgt_vocab_size,
            embed_dim=c.decoder_embed_dim,
            ffn_dim=c.decoder_ffn_dim,
            num_layers=c.decoder_layers,
            num_heads=c.decoder_heads,
            dropout=c.dropout,
            attention_dropout=c.attention_dropout,
            activation_dropout=c.activation_dropout,
            activation=c.activation,
            normalize_before=c.decoder_normalize_before,
            padding_idx=c.padding_idx,
            share_input_output_embed=c.share_decoder_input_output_embed,
            no_scale_embedding=c.no_scale_embedding,
            max_target_positions=c.max_target_positions,
            causal=c.decoder_causal,
            learned_pos=c.learned_pos,
            layernorm_embedding=c.layernorm_embedding,
            pipeline_mesh=self.pipeline_mesh,
            pipeline_stages=c.pipeline_stages,
            pipeline_chunks=c.pipeline_chunks,
            pipeline_remat=c.pipeline_remat,
            name="decoder", **common,
        )
        self.embed_scale = (
            1.0 if c.no_scale_embedding else math.sqrt(c.encoder_embed_dim)
        )
        if c.learned_pos:
            self.embed_positions = Embed(
                c.max_target_positions + c.padding_idx + 1,
                c.encoder_embed_dim,
                padding_idx=c.padding_idx,
                name="embed_positions", **common,
            )
        if c.layernorm_embedding:
            self.layernorm_embedding_mod = LayerNorm(
                c.encoder_embed_dim, dtype=self.dtype, name="layernorm_embedding"
            )
        self.dropout_layer = nn.Dropout(c.dropout)

    def encode(self, src_tokens: jax.Array, deterministic: bool = True):
        c = self.cfg
        pad_mask = src_tokens == c.padding_idx
        x = self.embed_scale * self.embed_tokens(src_tokens)
        if c.learned_pos:
            nonpad = (~pad_mask).astype(jnp.int32)
            pos_ids = jnp.cumsum(nonpad, axis=1) * nonpad + c.padding_idx
            pos = self.embed_positions(pos_ids)
        else:
            pos = positional_embedding_from_mask(
                pad_mask, c.encoder_embed_dim, c.padding_idx
            )
        x = x + pos.astype(x.dtype)
        if c.layernorm_embedding:
            x = self.layernorm_embedding_mod(x)
        x = self.dropout_layer(x, deterministic=deterministic)
        piped = None
        if (
            self.pipeline_mesh is not None
            and c.pipeline_stages > 1
            and not self.is_initializing()
        ):
            piped = self._pipelined_encoder(x, pad_mask)
        if piped is not None:
            x = piped
        else:  # pipeline off, init pass, or ragged tail batch
            for layer in self.encoder_layers_list:
                x = layer(x, encoder_padding_mask=pad_mask,
                          deterministic=deterministic)
        if c.encoder_normalize_before:
            x = self.encoder_layer_norm(x)
        return x, pad_mask

    def _pipelined_encoder(self, x: jax.Array, pad_mask: jax.Array):
        """Encoder stack through the GPipe schedule (parallel/pipeline.py);
        same trace-time param stacking as TransformerDecoder._pipelined_layers.
        Returns None for ragged batches (caller runs the sequential loop)."""
        from ..parallel.pipeline import pipelined_layer_stack

        c = self.cfg
        per_layer = [
            self.variables["params"][f"layers_{i}"]
            for i in range(c.encoder_layers)
        ]
        layer_tmpl = TransformerEncoderLayer(
            c.encoder_embed_dim, c.encoder_ffn_dim, c.encoder_heads,
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            activation=c.activation,
            normalize_before=c.encoder_normalize_before,
            dtype=self.dtype, param_dtype=self.param_dtype, parent=None,
        )

        def layer_apply(p, h, pmask):
            return layer_tmpl.apply({"params": p}, h, pmask)

        return pipelined_layer_stack(
            per_layer, layer_apply, x, (pad_mask,),
            mesh=self.pipeline_mesh,
            stages=c.pipeline_stages,
            chunks=c.pipeline_chunks,
            remat=c.pipeline_remat,
        )

    def __call__(self, src_tokens, prev_output_tokens, deterministic: bool = True):
        enc, enc_mask = self.encode(src_tokens, deterministic)
        return self.decoder(
            prev_output_tokens, enc, enc_mask, deterministic=deterministic
        )

    # text-branch API parity with the interlingua model so criterions work
    def encode_text(self, src_tokens, deterministic: bool = True):
        return self.encode(src_tokens, deterministic)

    def forward_text_with_internal(self, src_tokens, prev_output_tokens,
                                   deterministic: bool = True):
        enc, enc_mask = self.encode(src_tokens, deterministic)
        logits = self.decoder(prev_output_tokens, enc, enc_mask,
                              deterministic=deterministic)
        return logits, enc


@dataclass(frozen=True)
class TransformerLMConfig:
    vocab_size: int = 8
    padding_idx: int = 1
    embed_dim: int = 512
    ffn_dim: int = 2048
    layers: int = 6
    heads: int = 8
    normalize_before: bool = True
    max_target_positions: int = 1024
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation: str = "relu"
    # reference: --adaptive-softmax-cutoff (fairseq/modules/adaptive_softmax.py)
    adaptive_softmax_cutoffs: Optional[Tuple[int, ...]] = None
    # character-aware input embeddings (reference transformer_lm.py:86-101
    # --character-embeddings/--character-filters/--character-embedding-dim/
    # --char-embedder-highway-layers + modules/character_token_embedder.py);
    # the word->char spelling table itself is injected by the task at build
    # time (tasks/base.py model_config_overrides), never persisted
    character_embeddings: bool = False
    character_filters: Optional[Tuple[Tuple[int, int], ...]] = None
    character_embedding_dim: int = 4
    char_embedder_highway_layers: int = 2
    max_char_len: int = 50
    # pipeline parallelism (reference: --pipeline-balance/-chunks via
    # fairscale Pipe; here the GPipe schedule in parallel/pipeline.py)
    pipeline_stages: int = 0
    pipeline_chunks: int = 0
    pipeline_remat: bool = False


class TransformerLM(nn.Module):
    """Decoder-only LM: the shared TransformerDecoder without cross-attention
    inputs (encoder_out=None skips encoder_attn)."""

    cfg: TransformerLMConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    # mesh with a `pipe` axis, required when cfg.pipeline_stages > 1 (set by
    # the train CLI; not part of the persisted config)
    pipeline_mesh: Any = None
    # task-injected [V, max_char_len] spelling table when
    # cfg.character_embeddings (not persisted; rebuilt from the dictionary)
    word_to_char: Any = None

    def setup(self):
        c = self.cfg
        char_cfg = None
        if c.character_embeddings:
            char_cfg = {
                "word_to_char": self.word_to_char,
                "char_embed_dim": c.character_embedding_dim,
                "filters": c.character_filters,
                "highway_layers": c.char_embedder_highway_layers,
            }
        self.decoder = TransformerDecoder(
            vocab_size=c.vocab_size,
            char_embedder_cfg=char_cfg,
            embed_dim=c.embed_dim,
            ffn_dim=c.ffn_dim,
            num_layers=c.layers,
            num_heads=c.heads,
            dropout=c.dropout,
            attention_dropout=c.attention_dropout,
            activation_dropout=c.activation_dropout,
            activation=c.activation,
            normalize_before=c.normalize_before,
            padding_idx=c.padding_idx,
            max_target_positions=c.max_target_positions,
            pipeline_mesh=self.pipeline_mesh,
            pipeline_stages=c.pipeline_stages,
            pipeline_chunks=c.pipeline_chunks,
            pipeline_remat=c.pipeline_remat,
            name="decoder",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        if c.adaptive_softmax_cutoffs:
            from .adaptive_softmax import AdaptiveSoftmax

            self.adaptive_softmax = AdaptiveSoftmax(
                c.vocab_size, c.embed_dim,
                cutoffs=tuple(c.adaptive_softmax_cutoffs),
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="adaptive_softmax",
            )
        else:
            self.adaptive_softmax = None

    def __call__(self, tokens: jax.Array, deterministic: bool = True):
        """[B, T] tokens -> logits/log-probs [B, T, V] (causal)."""
        if self.adaptive_softmax is not None:
            feats = self.decoder(tokens, None, None, deterministic=deterministic,
                                 features_only=True)
            return self.adaptive_softmax.log_prob(feats)
        return self.decoder(tokens, None, None, deterministic=deterministic)

    def adaptive_nll(self, tokens: jax.Array, target: jax.Array,
                     deterministic: bool = True):
        """Per-position clustered NLL (adaptive_loss criterion path)."""
        assert self.adaptive_softmax is not None
        feats = self.decoder(tokens, None, None, deterministic=deterministic,
                             features_only=True)
        return self.adaptive_softmax.nll(feats, target)


@register_model("transformer")
def build_transformer(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    known = {f.name for f in dataclasses.fields(TransformerMTConfig)}
    d = dict(cfg_dict)
    mesh = d.pop("pipeline_mesh", None)
    cfg = TransformerMTConfig(**{k: v for k, v in d.items() if k in known})
    if cfg.pipeline_stages > 1:
        assert mesh is not None and mesh.shape.get("pipe", 1) == cfg.pipeline_stages, (
            "pipeline_stages > 1 needs a mesh whose `pipe` axis equals the "
            "stage count (train CLI: --pipeline-stages builds it)"
        )
        assert (
            cfg.dropout == 0.0
            and cfg.attention_dropout == 0.0
            and cfg.activation_dropout == 0.0
        ), (
            "the pipeline path runs layers without dropout; set --dropout 0 "
            "--attention-dropout 0 --activation-dropout 0 "
            "(documented delta vs the reference's Pipe)"
        )
        assert cfg.encoder_layers % cfg.pipeline_stages == 0, (
            "encoder_layers must divide into pipeline_stages (uniform balance)"
        )
        assert cfg.decoder_layers % cfg.pipeline_stages == 0, (
            "decoder_layers must divide into pipeline_stages (uniform balance)"
        )
    return TransformerModel(cfg, dtype=dtype, param_dtype=param_dtype,
                            pipeline_mesh=mesh)


@register_model("transformer_lm")
def build_transformer_lm(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    known = {f.name for f in dataclasses.fields(TransformerLMConfig)}
    d = dict(cfg_dict)
    d.setdefault("vocab_size", d.pop("tgt_vocab_size", 8))
    mesh = d.pop("pipeline_mesh", None)
    word_to_char = d.pop("word_to_char", None)  # task-injected, not persisted
    cfg = TransformerLMConfig(**{k: v for k, v in d.items() if k in known})
    if cfg.character_embeddings:
        assert word_to_char is not None, (
            "--character-embeddings needs a task with a target dictionary "
            "(the word->char table is built from it)"
        )
    if cfg.pipeline_stages > 1:
        assert mesh is not None and mesh.shape.get("pipe", 1) == cfg.pipeline_stages, (
            "pipeline_stages > 1 needs a mesh whose `pipe` axis equals the "
            "stage count (train CLI: --pipeline-stages builds it)"
        )
        assert (
            cfg.dropout == 0.0
            and cfg.attention_dropout == 0.0
            and cfg.activation_dropout == 0.0
        ), (
            "the pipeline path runs layers without dropout; set --dropout 0 "
            "--attention-dropout 0 --activation-dropout 0 "
            "(documented delta vs the reference's Pipe)"
        )
        assert cfg.layers % cfg.pipeline_stages == 0, (
            "layers must divide into pipeline_stages (uniform balance)"
        )
    return TransformerLM(cfg, dtype=dtype, param_dtype=param_dtype,
                         pipeline_mesh=mesh, word_to_char=word_to_char)


@register_model_architecture("transformer", "transformer")
def transformer_base(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("encoder_embed_dim", 512)
    d.setdefault("encoder_ffn_dim", 2048)
    d.setdefault("encoder_layers", 6)
    d.setdefault("encoder_heads", 8)
    d.setdefault("decoder_embed_dim", d["encoder_embed_dim"])
    d.setdefault("decoder_ffn_dim", d["encoder_ffn_dim"])
    d.setdefault("decoder_layers", 6)
    d.setdefault("decoder_heads", 8)
    return d


@register_model_architecture("transformer", "transformer_iwslt_de_en")
def transformer_iwslt(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("encoder_embed_dim", 512)
    d.setdefault("encoder_ffn_dim", 1024)
    d.setdefault("encoder_heads", 4)
    d.setdefault("decoder_ffn_dim", 1024)
    d.setdefault("decoder_heads", 4)
    return transformer_base(d)


@register_model_architecture("transformer", "transformer_wmt_en_de_big")
def transformer_big(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("attention_dropout", 0.1)
    return transformer_vaswani_big(d)


# the reference also registers transformer_align as a *model* name
# (fairseq/models/transformer_align.py:14); here it is the plain transformer
# trained with label_smoothed_cross_entropy_with_alignment, so the model name
# resolves to the same builder
register_model("transformer_align")(build_transformer)


@register_model_architecture("transformer_align", "transformer_align")
def transformer_align(cfg):
    """Alignment-supervised MT (reference: fairseq/models/transformer_align.py
    — a plain transformer trained with
    label_smoothed_cross_entropy_with_alignment; alignment extraction lives
    on the decoder, transformer_decoder.py cross_attention_weights)."""
    from .transformer_mt import transformer_base  # self-module at runtime

    return transformer_base(cfg)


@register_model_architecture("transformer_lm", "transformer_lm")
def transformer_lm_base(cfg: Dict) -> Dict:
    return dict(cfg)


# ---------------------------------------------------------------------------
# reference arch-name parity (fairseq/models/transformer.py:988-1025,
# transformer_align.py:89-93, transformer_lm.py:310-393)


@register_model_architecture("transformer", "transformer_wmt_en_de")
def transformer_wmt_en_de(cfg: Dict) -> Dict:
    return transformer_base(dict(cfg))


@register_model_architecture("transformer", "transformer_vaswani_wmt_en_de_big")
def transformer_vaswani_big(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("encoder_embed_dim", 1024)
    d.setdefault("encoder_ffn_dim", 4096)
    d.setdefault("encoder_heads", 16)
    d.setdefault("decoder_heads", 16)  # ref pins decoder_attention_heads=16
    d.setdefault("dropout", 0.3)
    return transformer_base(d)


@register_model_architecture("transformer", "transformer_vaswani_wmt_en_fr_big")
def transformer_vaswani_fr_big(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("dropout", 0.1)
    return transformer_vaswani_big(d)


@register_model_architecture("transformer", "transformer_wmt_en_de_big_t2t")
def transformer_big_t2t(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("encoder_normalize_before", True)
    d.setdefault("decoder_normalize_before", True)
    d.setdefault("attention_dropout", 0.1)
    d.setdefault("activation_dropout", 0.1)
    return transformer_vaswani_big(d)


@register_model_architecture("transformer", "transformer_wmt_en_de_big_align")
def transformer_big_align(cfg: Dict) -> Dict:
    """Big MT arch for alignment-supervised training (pairs with
    label_smoothed_cross_entropy_with_alignment). The reference pins
    alignment_layer=4/alignment_heads=1 (transformer_align.py:89-93); here
    A-line extraction always head-averages the last decoder layer's
    cross-attention (documented delta, cli/generate.py --print-alignment)."""
    d = dict(cfg)
    d.setdefault("attention_dropout", 0.1)
    return transformer_vaswani_big(d)


@register_model_architecture("transformer_lm", "transformer_lm_big")
def transformer_lm_big(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("layers", 12)
    d.setdefault("embed_dim", 1024)
    d.setdefault("ffn_dim", 4096)
    d.setdefault("heads", 16)
    return transformer_lm_base(d)


@register_model_architecture("transformer_lm", "transformer_lm_wiki103")
@register_model_architecture("transformer_lm", "transformer_lm_baevski_wiki103")
def transformer_lm_wiki103(cfg: Dict) -> Dict:
    """Baevski & Auli wikitext-103 LM (reference transformer_lm.py:318-335).
    The adaptive SOFTMAX cutoffs are honored; the reference additionally ties
    an adaptive INPUT embedding — not a transformer_lm option here (the
    adaptive-input module exists in models/modules_extra.py; documented
    delta)."""
    d = dict(cfg)
    d.setdefault("layers", 16)
    d.setdefault("heads", 8)
    d.setdefault("dropout", 0.3)
    d.setdefault("attention_dropout", 0.1)
    d.setdefault("activation_dropout", 0.1)
    d.setdefault("adaptive_softmax_cutoffs", (20000, 60000))
    return transformer_lm_big(d)


@register_model_architecture("transformer_lm", "transformer_lm_gbw")
@register_model_architecture("transformer_lm", "transformer_lm_baevski_gbw")
def transformer_lm_gbw(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("embed_dim", 512)
    d.setdefault("dropout", 0.1)
    d.setdefault("attention_dropout", 0.1)
    return transformer_lm_big(d)


def _gpt_preset(cfg: Dict, embed, ffn, layers, heads) -> Dict:
    d = dict(cfg)
    d.setdefault("embed_dim", embed)
    d.setdefault("ffn_dim", ffn)
    d.setdefault("layers", layers)
    d.setdefault("heads", heads)
    d.setdefault("dropout", 0.1)
    d.setdefault("attention_dropout", 0.1)
    d.setdefault("activation", "gelu")
    return transformer_lm_base(d)


@register_model_architecture("transformer_lm", "transformer_lm_gpt")
def transformer_lm_gpt(cfg: Dict) -> Dict:
    return _gpt_preset(cfg, 768, 3072, 12, 12)


@register_model_architecture("transformer_lm", "transformer_lm_gpt2_small")
def transformer_lm_gpt2_small(cfg: Dict) -> Dict:
    return _gpt_preset(cfg, 1024, 4096, 24, 16)


@register_model_architecture("transformer_lm", "transformer_lm_gpt2_medium")
def transformer_lm_gpt2_medium(cfg: Dict) -> Dict:
    return _gpt_preset(cfg, 1280, 5120, 36, 20)


@register_model_architecture("transformer_lm", "transformer_lm_gpt2_big")
def transformer_lm_gpt2_big(cfg: Dict) -> Dict:
    return _gpt_preset(cfg, 1600, 6400, 48, 25)


@register_model_architecture("transformer", "transformer_iwslt_de_en_pipeline_parallel")
def transformer_iwslt_pipeline(cfg: Dict) -> Dict:
    """reference arch name (model_parallel/models/pipeline_parallel_transformer):
    same dims as transformer_iwslt_de_en; pipelining here is the
    --pipeline-stages/--pipeline-chunks flags (parallel/pipeline.py), not a
    separate model class."""
    return transformer_iwslt(dict(cfg))


@register_model_architecture("transformer", "transformer_wmt_en_de_big_pipeline_parallel")
def transformer_big_pipeline(cfg: Dict) -> Dict:
    return transformer_big(dict(cfg))


@register_model_architecture("transformer_lm", "transformer_lm_megatron")
def transformer_lm_megatron(cfg: Dict) -> Dict:
    """reference: model_parallel/models/transformer_lm.py:152-160 on the
    Megatron mpu submodule. Here model parallelism is a sharding annotation
    (--model-parallel-size N -> TP PartitionSpecs over the mesh `model`
    axis, parallel/partition.py), so the megatron presets register on the
    plain transformer_lm model."""
    return _gpt_preset(cfg, 3072, 3072 * 4, 72, 32)


@register_model_architecture("transformer_lm", "transformer_lm_megatron_11b")
def transformer_lm_megatron_11b(cfg: Dict) -> Dict:
    return _gpt_preset(cfg, 3072, 3072 * 6, 72, 32)
