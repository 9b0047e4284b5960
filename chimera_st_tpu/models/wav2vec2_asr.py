"""wav2vec 2.0 ASR fine-tuning models: CTC head and seq2seq decoder.

reference: fairseq/models/wav2vec/wav2vec2_asr.py — `Wav2VecCtc` (:146-184,
Wav2VecEncoder + final_dropout + Linear proj to the target vocabulary) and
`wav2vec_seq2seq` (:186-302, the same encoder under a standard incremental
transformer decoder). Architecture defaults mirror :630-675.

TPU-native deltas:
- span masking at fine-tune time (`apply_mask`, reference :321-340) takes
  host-sampled `mask_indices` from the collater (the same split as the
  pretraining path) and swaps in a learned `mask_emb`; sampling inside the
  jitted step would need data-dependent shapes.
- `freeze_finetune_updates` (reference :366-369: the trunk runs under
  torch.no_grad for the first N updates) is a traced `stop_gradient` gate on
  the trunk output, so one compiled step serves both phases.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config.registry import register_model, register_model_architecture
from .transformer_decoder import TransformerDecoder
from .wav2vec2 import DEFAULT_CONV_SPEC, Wav2Vec2Encoder

Dtype = Any


@dataclass(frozen=True)
class Wav2VecAsrConfig:
    vocab_size: int = 8
    padding_idx: int = 1
    # wav2vec2 trunk (field names match InterlinguaConfig for importer reuse)
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
    w2v2_dropout: float = 0.0
    w2v2_attention_dropout: float = 0.0
    w2v2_activation_dropout: float = 0.0
    layerdrop: float = 0.0
    feature_grad_mult: float = 0.0  # reference fine-tune default (:653)
    freeze_finetune_updates: int = 0
    apply_mask: bool = False
    final_dropout: float = 0.0
    # seq2seq decoder (reference :657-675 defaults)
    decoder_embed_dim: int = 1024
    decoder_ffn_dim: int = 4096
    decoder_layers: int = 10
    decoder_heads: int = 16
    decoder_normalize_before: bool = False
    decoder_dropout: float = 0.0
    decoder_attention_dropout: float = 0.0
    decoder_activation_dropout: float = 0.0
    share_decoder_input_output_embed: bool = False
    max_target_positions: int = 2048


class _W2VTrunk(nn.Module):
    """Shared trunk wrapper: wav2vec2 encoder + fine-tune masking + freeze gate."""

    cfg: Wav2VecAsrConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.w2v_model = Wav2Vec2Encoder(
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
            layerdrop=c.layerdrop,
            mask_emb=c.apply_mask,
            name="w2v_model",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    def __call__(
        self,
        source: jax.Array,  # [B, T] raw waveform
        padding_mask: Optional[jax.Array],
        mask_indices: Optional[jax.Array] = None,  # [B, T'] bool (train)
        num_updates: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        c = self.cfg
        x, out_mask = self.w2v_model(
            source,
            padding_mask,
            mask_indices=mask_indices if (c.apply_mask and not deterministic) else None,
            deterministic=deterministic,
        )
        if c.freeze_finetune_updates > 0 and num_updates is not None:
            # trained = past the freeze horizon; otherwise grads stop at the
            # trunk output (reference :366-369 ft gate)
            ft = num_updates >= c.freeze_finetune_updates
            x = jnp.where(ft, x, jax.lax.stop_gradient(x))
        return x, out_mask


class Wav2VecCtcModel(nn.Module):
    """reference: wav2vec2_asr.py:146-184 (Wav2VecCtc / Wav2VecEncoder proj)."""

    cfg: Wav2VecAsrConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.trunk = _W2VTrunk(
            self.cfg, dtype=self.dtype, param_dtype=self.param_dtype, name="trunk"
        )
        self.final_dropout = nn.Dropout(self.cfg.final_dropout)
        self.proj = nn.Dense(
            self.cfg.vocab_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="proj",
        )

    def ctc_logits(
        self,
        source: jax.Array,
        padding_mask: Optional[jax.Array],
        mask_indices: Optional[jax.Array] = None,
        num_updates: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """Per-frame vocabulary logits [B, T', V] (fp32) + frame padding mask."""
        x, out_mask = self.trunk(
            source, padding_mask, mask_indices, num_updates, deterministic
        )
        x = self.final_dropout(x, deterministic=deterministic)
        return self.proj(x).astype(jnp.float32), out_mask

    def __call__(self, source, padding_mask=None, deterministic: bool = True):
        return self.ctc_logits(source, padding_mask, deterministic=deterministic)


class Wav2VecSeq2SeqModel(nn.Module):
    """reference: wav2vec2_asr.py:186-302 (TransformerModel over Wav2VecEncoder).

    Surface-compatible with the SequenceGenerator (encode_audio / decode /
    `.decoder` incremental step) and the audio-dispatching CE criteria
    (forward_audio_with_internal)."""

    cfg: Wav2VecAsrConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.trunk = _W2VTrunk(
            c, dtype=self.dtype, param_dtype=self.param_dtype, name="trunk"
        )
        self.final_dropout = nn.Dropout(c.final_dropout)
        if c.decoder_embed_dim != c.w2v2_embed_dim:
            # trunk dim -> decoder dim (reference wav2vec2_asr.py:360-364:
            # Wav2VecEncoder.proj when tgt_dict is None)
            self.proj = nn.Dense(
                c.decoder_embed_dim,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="proj",
            )
        else:
            self.proj = None
        self.decoder = TransformerDecoder(
            vocab_size=c.vocab_size,
            embed_dim=c.decoder_embed_dim,
            ffn_dim=c.decoder_ffn_dim,
            num_layers=c.decoder_layers,
            num_heads=c.decoder_heads,
            dropout=c.decoder_dropout,
            attention_dropout=c.decoder_attention_dropout,
            activation_dropout=c.decoder_activation_dropout,
            normalize_before=c.decoder_normalize_before,
            padding_idx=c.padding_idx,
            share_input_output_embed=c.share_decoder_input_output_embed,
            max_target_positions=c.max_target_positions,
            name="decoder",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )

    def encode_audio(
        self,
        source: jax.Array,
        padding_mask: Optional[jax.Array],
        deterministic: bool = True,
        mask_indices: Optional[jax.Array] = None,
        num_updates: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        x, out_mask = self.trunk(
            source, padding_mask, mask_indices, num_updates, deterministic
        )
        x = self.final_dropout(x, deterministic=deterministic)
        if self.proj is not None:
            x = self.proj(x)
        return x, out_mask

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

    def forward_audio_with_internal(
        self,
        source,
        padding_mask,
        prev_output_tokens,
        deterministic: bool = True,
        mask_indices: Optional[jax.Array] = None,
        num_updates: Optional[jax.Array] = None,
    ):
        enc, enc_mask = self.encode_audio(
            source, padding_mask, deterministic, mask_indices, num_updates
        )
        logits = self.decode(prev_output_tokens, enc, enc_mask, deterministic)
        return logits, enc

    def __call__(
        self, source, padding_mask, prev_output_tokens, deterministic: bool = True
    ) -> jax.Array:
        logits, _ = self.forward_audio_with_internal(
            source, padding_mask, prev_output_tokens, deterministic
        )
        return logits


def _build(cls, cfg_dict: Dict, dtype, param_dtype):
    known = {f.name for f in dataclasses.fields(Wav2VecAsrConfig)}
    d = dict(cfg_dict)
    d.setdefault("vocab_size", d.pop("tgt_vocab_size", 8))
    if "conv_spec" in d:  # task-level name
        d.setdefault("w2v2_conv_spec", d.pop("conv_spec"))
    if "w2v2_conv_spec" in d and d["w2v2_conv_spec"] is not None:
        d["w2v2_conv_spec"] = tuple(map(tuple, d["w2v2_conv_spec"]))
    cfg = Wav2VecAsrConfig(**{k: v for k, v in d.items() if k in known})
    return cls(cfg, dtype=dtype, param_dtype=param_dtype)


@register_model("wav2vec_ctc")
def build_wav2vec_ctc(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    return _build(Wav2VecCtcModel, cfg_dict, dtype, param_dtype)


@register_model("wav2vec_seq2seq")
def build_wav2vec_seq2seq(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    return _build(Wav2VecSeq2SeqModel, cfg_dict, dtype, param_dtype)


@register_model_architecture("wav2vec_ctc", "wav2vec_ctc")
def wav2vec_ctc_arch(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("feature_grad_mult", 0.0)
    d.setdefault("final_dropout", 0.0)
    return d


@register_model_architecture("wav2vec_seq2seq", "wav2vec_seq2seq")
def wav2vec_seq2seq_arch(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("decoder_embed_dim", 1024)
    d.setdefault("decoder_ffn_dim", 4096)
    d.setdefault("decoder_layers", 10)
    d.setdefault("decoder_heads", 16)
    return d
