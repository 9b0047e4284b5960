"""Chimera interlingua ("shared semantic memory") speech/text encoder-decoder.

TPU-native rebuild of the reference flagship model
(reference: fairseq/models/chimera/w2v2_transformer_interlingua.py:28-344 and
fairseq/models/chimera/w2v2_transformer.py:239-433):

- the encoder accepts either raw waveform (wav2vec2 trunk -> Conv1d subsampler)
  or text tokens (embedding + sinusoidal positions) — in the reference the
  dispatch is on dtype (w2v2_transformer_interlingua.py:212); here the two
  modalities are separate jitted methods (static branch, no runtime dispatch),
- M learned memory slots refined by N interlingua layers. The reference
  implements these as full self-attention over [h; mem] with a column mask that
  blocks all attention INTO the mem columns (w2v2_transformer_interlingua.py:284-298)
  and discards the h rows; that reduces exactly to mem->h cross-attention with
  the same layer parameters, so we compute only the M memory rows
  (see TransformerEncoderLayer.cross_only) — O(M*T) instead of O((T+M)^2),
- reference quirk preserved behind a flag: the interlingua layers attend over
  *padded* encoder positions too (the reference passes an all-False padding
  mask); set ``interlingua_mask_padding=True`` for properly masked attention,
- memory slot 0 replicates the reference's Embedding(M, D, padding_idx=0):
  zero-initialized and gradient-frozen,
- the fixed-length M-slot memory bank is the decoder's cross-attention input:
  decoder cross-attention is O(M) regardless of input length (this is the
  reference's answer to long audio — no sequence parallelism needed).

Architecture preset `s2t_transformer_w2v2_interlingua_base` resolves to
d=512, ffn=2048, 12 encoder / 6 decoder layers, 8 heads, pre-LN, relu
(reference: w2v2_transformer.py:437-477 + w2v2_transformer_interlingua.py:315-343;
note the *_base overrides at :321-324 are dead getattr's after
base_architecture already set those keys — actual values are the 512-dim ones).
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

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
from .subsampler import Conv1dSubsampler, subsampled_length
from .transformer_decoder import TransformerDecoder
from .wav2vec2 import (
    DEFAULT_CONV_SPEC,
    Wav2Vec2Encoder,
    downsample_padding_mask,
    extractor_output_length,
)

Dtype = Any


@dataclass(frozen=True)
class InterlinguaConfig:
    # vocab
    tgt_vocab_size: int = 8
    src_vocab_size: Optional[int] = 8  # None: no text branch
    padding_idx: int = 1
    # shared encoder
    encoder_embed_dim: int = 512
    encoder_ffn_dim: int = 2048
    encoder_layers: int = 12
    encoder_heads: int = 8
    encoder_normalize_before: bool = True
    # decoder
    decoder_embed_dim: int = 512
    decoder_ffn_dim: int = 2048
    decoder_layers: int = 6
    decoder_heads: int = 8
    decoder_normalize_before: bool = True
    share_decoder_input_output_embed: bool = True
    max_target_positions: int = 1024
    # interlingua
    interlingua_length: int = 16
    interlingua_layers: int = 3
    non_shared_encoder_layers: int = 0
    no_interlingua: bool = False
    interlingua_mask_padding: bool = False  # True = fix the reference quirk
    modal_embedding: bool = False
    # subsampler
    conv_kernel_sizes: Tuple[int, ...] = (5, 5)
    conv_channels: int = 1024
    # wav2vec2 trunk (base/small)
    w2v2_embed_dim: int = 768
    w2v2_ffn_dim: int = 3072
    w2v2_layers: int = 12
    w2v2_heads: int = 8
    w2v2_conv_spec: Tuple[Tuple[int, int, int], ...] = DEFAULT_CONV_SPEC
    w2v2_extractor_mode: str = "default"
    w2v2_conv_bias: bool = False
    w2v2_layer_norm_first: bool = False
    w2v2_conv_pos: int = 128
    w2v2_conv_pos_groups: int = 16
    # remat the w2v2 context network in the backward pass (activation memory
    # for throughput at large batch; measured in benchmarks/trace_train.py)
    w2v2_remat: bool = False
    # wav2vec2 regularization (from the w2v2 checkpoint args in the reference,
    # w2v2_transformer.py:255-267 — independent of the ST model's dropout)
    w2v2_dropout: float = 0.1
    w2v2_attention_dropout: float = 0.1
    w2v2_activation_dropout: float = 0.0
    # gradient scale on the conv extractor (reference: --feature-grad-mult,
    # wav2vec2.py:337; the Chimera fine-tune recipe runs 0.1 or 0)
    feature_grad_mult: float = 1.0
    # regularization / misc
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation: str = "relu"
    no_scale_embedding: bool = False

    def audio_output_length(self, n_samples: int) -> int:
        """raw samples -> memory-input frame count (w2v conv ~320x, subsampler 4x)."""
        t = extractor_output_length(n_samples, self.w2v2_conv_spec)
        return subsampled_length(t, len(self.conv_kernel_sizes))


class ChimeraInterlinguaModel(nn.Module):
    cfg: InterlinguaConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.wav2vec_model = Wav2Vec2Encoder(
            encoder_embed_dim=c.w2v2_embed_dim,
            encoder_ffn_dim=c.w2v2_ffn_dim,
            encoder_layers=c.w2v2_layers,
            encoder_heads=c.w2v2_heads,
            conv_spec=c.w2v2_conv_spec,
            extractor_mode=c.w2v2_extractor_mode,
            conv_bias=c.w2v2_conv_bias,
            layer_norm_first=c.w2v2_layer_norm_first,
            conv_pos=c.w2v2_conv_pos,
            conv_pos_groups=c.w2v2_conv_pos_groups,
            dropout=c.w2v2_dropout,
            attention_dropout=c.w2v2_attention_dropout,
            activation_dropout=c.w2v2_activation_dropout,
            feature_grad_mult=c.feature_grad_mult,
            remat=c.w2v2_remat,
            name="wav2vec_model",
            **common,
        )
        self.subsample = Conv1dSubsampler(
            c.w2v2_embed_dim,
            c.conv_channels,
            c.encoder_embed_dim,
            c.conv_kernel_sizes,
            name="subsample",
            **common,
        )
        if c.src_vocab_size is not None:
            self.text_embed_tokens = Embed(
                c.src_vocab_size,
                c.encoder_embed_dim,
                padding_idx=c.padding_idx,
                name="text_embed_tokens",
                **common,
            )
        mk_layer = lambda name: TransformerEncoderLayer(
            c.encoder_embed_dim,
            c.encoder_ffn_dim,
            c.encoder_heads,
            dropout=c.dropout,
            attention_dropout=c.attention_dropout,
            activation_dropout=c.activation_dropout,
            activation=c.activation,
            normalize_before=c.encoder_normalize_before,
            name=name,
            **common,
        )
        self.transformer_layers = [
            mk_layer(f"transformer_layers_{i}") for i in range(c.encoder_layers)
        ]
        if c.non_shared_encoder_layers > 0:
            self.audio_exclusive_layers = [
                mk_layer(f"audio_exclusive_layers_{i}")
                for i in range(c.non_shared_encoder_layers)
            ]
        if c.encoder_normalize_before:
            self.encoder_layer_norm = LayerNorm(
                c.encoder_embed_dim, dtype=self.dtype, name="encoder_layer_norm"
            )
        if not c.no_interlingua:
            self.interlingua_embedding = Embed(
                c.interlingua_length,
                c.encoder_embed_dim,
                padding_idx=0,  # reference quirk: slot 0 pinned to zero
                name="interlingua_embedding",
                **common,
            )
            self.interlingua_refine_layers = [
                mk_layer(f"interlingua_layers_{i}")
                for i in range(c.interlingua_layers)
            ]
        if c.modal_embedding:
            self.modal_embed = Embed(
                3, c.encoder_embed_dim, padding_idx=2, name="modal_embedding", **common
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
            name="decoder",
            **common,
        )
        self.embed_scale = (
            1.0 if c.no_scale_embedding else math.sqrt(c.encoder_embed_dim)
        )
        self.dropout_layer = nn.Dropout(c.dropout)

    # ------------------------------------------------------------- encoding

    def _shared_encode(
        self,
        feature: jax.Array,  # [B, T, C] (text embedding or subsampled audio)
        padding_mask: jax.Array,  # [B, T] True = pad
        is_text: bool,
        modal_id: int,
        deterministic: bool,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """Shared transformer stack + interlingua memory refinement.

        Returns (encoder_out [B, M, C] or [B, T, C], padding_mask or None).
        reference: w2v2_transformer_interlingua.py:207-312.
        """
        c = self.cfg
        x = self.embed_scale * feature
        if is_text:
            # reference adds positions only on the text branch (:233-236)
            pos = positional_embedding_from_mask(
                padding_mask, c.encoder_embed_dim, c.padding_idx
            )
            x = x + pos.astype(x.dtype)
        x = self.dropout_layer(x, deterministic=deterministic)

        if is_text or c.non_shared_encoder_layers == 0:
            layers = self.transformer_layers
        else:
            layers = (
                list(self.audio_exclusive_layers)
                + self.transformer_layers[c.non_shared_encoder_layers :]
            )
        for layer in layers:
            x = layer(x, encoder_padding_mask=padding_mask, deterministic=deterministic)

        if c.encoder_normalize_before:
            x = self.encoder_layer_norm(x)

        if c.no_interlingua:
            return x, padding_mask

        B = x.shape[0]
        mem = jnp.broadcast_to(
            self.interlingua_embedding.table()[None, :, :],
            (B, c.interlingua_length, c.encoder_embed_dim),
        )
        if c.modal_embedding:
            ids = jnp.full((B, c.interlingua_length), modal_id, jnp.int32)
            mem = mem + self.modal_embed(ids)
        kp_mask = padding_mask if c.interlingua_mask_padding else None
        for layer in self.interlingua_refine_layers:
            mem = layer.cross_only(
                mem, x, key_padding_mask=kp_mask, deterministic=deterministic
            )
        return mem, None  # fixed-length memory bank: nothing is padding

    def encode_audio(
        self,
        source: jax.Array,  # [B, T] raw waveform (float)
        padding_mask: jax.Array,  # [B, T] True = pad
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        feat, w2v_mask = self.wav2vec_model(
            source, padding_mask, deterministic=deterministic
        )
        feat = self.subsample(feat)
        if w2v_mask is None:
            sub_mask = jnp.zeros(feat.shape[:2], bool)
        else:
            lengths = jnp.sum(~w2v_mask, axis=-1)
            for _ in self.cfg.conv_kernel_sizes:
                lengths = (lengths - 1) // 2 + 1
            pos = jnp.arange(feat.shape[1])[None, :]
            sub_mask = pos >= lengths[:, None]
        return self._shared_encode(
            feat, sub_mask, is_text=False, modal_id=0, deterministic=deterministic
        )

    def encode_text(
        self,
        src_tokens: jax.Array,  # [B, T] int
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        padding_mask = src_tokens == self.cfg.padding_idx
        feat = self.text_embed_tokens(src_tokens)
        return self._shared_encode(
            feat, padding_mask, is_text=True, modal_id=1, deterministic=deterministic
        )

    # ------------------------------------------------------------- decoding

    def decode(
        self,
        prev_output_tokens: jax.Array,
        encoder_out: jax.Array,
        encoder_padding_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        return self.decoder(
            prev_output_tokens,
            encoder_out,
            encoder_padding_mask,
            deterministic=deterministic,
        )

    # ----------------------------------------------------------- full paths

    def __call__(
        self,
        source: jax.Array,
        padding_mask: jax.Array,
        prev_output_tokens: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        """ST path: raw audio -> logits [B, T_tgt, V]."""
        enc, enc_mask = self.encode_audio(source, padding_mask, deterministic)
        return self.decode(prev_output_tokens, enc, enc_mask, deterministic)

    def forward_audio_with_internal(
        self, source, padding_mask, prev_output_tokens, deterministic: bool = True
    ):
        """reference: forward_with_internal (w2v2_transformer_interlingua.py:137-146)."""
        enc, enc_mask = self.encode_audio(source, padding_mask, deterministic)
        logits = self.decode(prev_output_tokens, enc, enc_mask, deterministic)
        return logits, enc

    def forward_text_with_internal(
        self, src_tokens, prev_output_tokens, deterministic: bool = True
    ):
        enc, enc_mask = self.encode_text(src_tokens, deterministic)
        logits = self.decode(prev_output_tokens, enc, enc_mask, deterministic)
        return logits, enc

    def init_everything(
        self, source, padding_mask, src_tokens, prev_output_tokens
    ):
        """Init-time entry touching every parameterized branch (flax only
        materializes params on executed paths)."""
        logits, _ = self.forward_audio_with_internal(
            source, padding_mask, prev_output_tokens
        )
        if self.cfg.src_vocab_size is not None:
            self.forward_text_with_internal(src_tokens, prev_output_tokens)
        return logits


# ----------------------------------------------------------- registrations


@register_model("s2t_transformer_w2v2_interlingua")
def build_interlingua_model(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    known = {f.name for f in dataclasses.fields(InterlinguaConfig)}
    cfg = InterlinguaConfig(**{k: v for k, v in cfg_dict.items() if k in known})
    return ChimeraInterlinguaModel(cfg, dtype=dtype, param_dtype=param_dtype)


def _arch_base(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("encoder_embed_dim", 512)
    d.setdefault("encoder_ffn_dim", 2048)
    d.setdefault("encoder_layers", 12)
    d.setdefault("encoder_heads", 8)
    d.setdefault("decoder_embed_dim", d["encoder_embed_dim"])
    d.setdefault("decoder_ffn_dim", d["encoder_ffn_dim"])
    d.setdefault("decoder_layers", 6)
    d.setdefault("decoder_heads", 8)
    d.setdefault("dropout", 0.1)
    d.setdefault("attention_dropout", d["dropout"])
    d.setdefault("activation_dropout", d["dropout"])
    d.setdefault("activation", "relu")
    d.setdefault("conv_kernel_sizes", (5, 5))
    d.setdefault("conv_channels", 1024)
    return d


@register_model_architecture(
    "s2t_transformer_w2v2_interlingua", "s2t_transformer_w2v2_interlingua_base"
)
def interlingua_base(cfg: Dict) -> Dict:
    d = _arch_base(cfg)
    d.setdefault("interlingua_length", 16)
    d.setdefault("interlingua_layers", 3)
    return d


# plain w2v2+transformer ST model (no memory bank) under its reference
# names: w2v2_transformer.py:42 register_model("s2t_transformer_w2v2") and
# the :480-507 small presets. no_interlingua=True routes encode_audio
# around the memory layers (this file :268).
@register_model("s2t_transformer_w2v2")
def build_s2t_w2v2_model(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    return build_interlingua_model(
        {**cfg_dict, "no_interlingua": True}, dtype, param_dtype
    )


@register_model_architecture("s2t_transformer_w2v2", "s2t_transformer_w2v2")
def s2t_w2v2_base(cfg: Dict) -> Dict:
    return _arch_base(cfg)


def _s2t_w2v2_s(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("encoder_embed_dim", 256)
    d.setdefault("encoder_ffn_dim", 256 * 8)
    d.setdefault("encoder_heads", 4)
    d.setdefault("decoder_heads", 4)
    return _arch_base(d)


@register_model_architecture("s2t_transformer_w2v2", "s2t_transformer_w2v2_s")
def s2t_w2v2_s(cfg: Dict) -> Dict:
    return _s2t_w2v2_s(cfg)


@register_model_architecture("s2t_transformer_w2v2", "s2t_transformer_w2v2yr_s")
def s2t_w2v2yr_s(cfg: Dict) -> Dict:
    return _s2t_w2v2_s(cfg)


@register_model_architecture("s2t_transformer_w2v2", "s2t_transformer_w2v2_sp")
def s2t_w2v2_sp(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("encoder_layers", 16)
    return _s2t_w2v2_s(d)


@register_model_architecture("s2t_transformer_w2v2", "s2t_transformer_w2v2asr_s")
def s2t_w2v2asr_s(cfg: Dict) -> Dict:
    # the reference flips use_asr_finetune_w2v (loads an ASR-fine-tuned
    # wav2vec checkpoint); trunk shape is identical — checkpoint choice is
    # a --w2v2-model-path concern here
    return _s2t_w2v2_s(cfg)
