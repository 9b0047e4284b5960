"""Non-autoregressive CMLM transformer with mask-predict decoding.

Covers the reference's NAT model family entry point
(reference: fairseq/models/nat/cmlm_transformer.py "Mask-Predict: Parallel
Decoding of Conditional Masked Language Models" + the iterative-refinement
decode loop, fairseq/iterative_refinement_generator.py).

TPU-native design: the refinement loop is a fixed-iteration `lax.scan`
(the reference loops with dynamic early exit); each iteration re-predicts the
lowest-confidence tokens, with a linearly-decaying mask ratio. Target length
comes from a length head over mean-pooled encoder states (the reference
predicts length from an encoder length token)."""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.registry import register_model, register_model_architecture
from .transformer_mt import TransformerMTConfig, TransformerModel

Dtype = Any


@dataclass(frozen=True)
class CMLMConfig(TransformerMTConfig):
    max_predicted_length: int = 256
    mask_idx: Optional[int] = None  # default: unk (3)


class CMLMTransformer(nn.Module):
    cfg: CMLMConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        # encoder + BIDIRECTIONAL decoder share the MT model structure
        mt_cfg = TransformerMTConfig(
            **{**{f.name: getattr(self.cfg, f.name)
                  for f in dataclasses.fields(TransformerMTConfig)},
               "decoder_causal": False}
        )
        self.backbone = TransformerModel(
            mt_cfg, dtype=self.dtype, param_dtype=self.param_dtype, name="backbone"
        )
        self.length_head = nn.Dense(
            self.cfg.max_predicted_length,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="length_head",
        )

    @property
    def mask_idx(self) -> int:
        return 3 if self.cfg.mask_idx is None else self.cfg.mask_idx

    def encode(self, src_tokens, deterministic: bool = True):
        return self.backbone.encode(src_tokens, deterministic)

    def predict_length_logits(self, enc, enc_mask):
        """[B, max_predicted_length] length distribution from pooled encoder."""
        valid = (~enc_mask)[:, :, None].astype(enc.dtype)
        pooled = jnp.sum(enc * valid, axis=1) / jnp.maximum(
            jnp.sum(valid, axis=1), 1.0
        )
        return self.length_head(pooled).astype(jnp.float32)

    def decode_tokens(self, tokens, enc, enc_mask, deterministic: bool = True):
        """Bidirectional decode: [B, T] (masked) tokens -> logits [B, T, V]."""
        return self.backbone.decoder(
            tokens, enc, enc_mask, deterministic=deterministic
        )

    def __call__(self, src_tokens, masked_target, deterministic: bool = True):
        """Training forward -> (token logits, length logits)."""
        enc, enc_mask = self.encode(src_tokens, deterministic)
        logits = self.decode_tokens(masked_target, enc, enc_mask, deterministic)
        length_logits = self.predict_length_logits(enc, enc_mask)
        return logits, length_logits

    # ------------------------------------------------------- mask-predict

    def mask_predict(
        self,
        src_tokens: jax.Array,
        iterations: int = 10,
        max_len: Optional[int] = None,
        pad: int = 1,
        eos: int = 2,
        return_history: bool = False,
    ):
        """Iterative refinement decode -> (tokens [B, L], lengths [B]).

        reference: iterative_refinement_generator.py — here a fixed-iteration
        scan; iteration i re-masks the floor(L * (1 - (i+1)/N)) least
        confident positions and re-predicts them.

        With ``return_history`` (--retain-iter-history, reference
        retain_history which snapshots decoder_out.output_tokens after each
        forward_decoder) also returns the per-iteration canvases
        [iterations, B, L] — each entry is the fully-predicted canvas of that
        round, before skeptical re-masking."""
        c = self.cfg
        L = max_len or c.max_predicted_length
        enc, enc_mask = self.encode(src_tokens)
        len_logits = self.predict_length_logits(enc, enc_mask)
        lengths = jnp.clip(jnp.argmax(len_logits, axis=-1), 1, L)  # [B]
        tokens, _, hist = self._mask_predict_from(
            lengths, enc, enc_mask, iterations, L, pad,
            return_history=return_history,
        )
        if return_history:
            return tokens, lengths, hist
        return tokens, lengths

    def _mask_predict_from(self, lengths, enc, enc_mask, iterations, L, pad=1,
                           return_history: bool = False):
        """Mask-predict loop from given target lengths ->
        (tokens, scores, history-or-None)."""
        B = lengths.shape[0]
        pos = jnp.arange(L)[None, :]
        tgt_pad_mask = pos >= lengths[:, None]
        mask_tok = self.mask_idx

        tokens = jnp.where(tgt_pad_mask, pad, mask_tok).astype(jnp.int32)

        def iteration(carry, i):
            tokens, scores = carry
            logits = self.decode_tokens(tokens, enc, enc_mask).astype(jnp.float32)
            lp = jax.nn.log_softmax(logits, axis=-1)
            pred = jnp.argmax(lp, axis=-1).astype(jnp.int32)
            conf = jnp.max(lp, axis=-1)
            # only positions currently masked get re-predicted
            is_masked = tokens == mask_tok
            tokens = jnp.where(is_masked, pred, tokens)
            scores = jnp.where(is_masked, conf, scores)
            # the round's fully-predicted canvas (what the reference's
            # history list records), padded for display
            snapshot = jnp.where(tgt_pad_mask, pad, tokens) if return_history \
                else None
            # re-mask the least confident for the next round
            n_remask = (
                lengths.astype(jnp.float32) * (1.0 - (i + 1.0) / iterations)
            ).astype(jnp.int32)  # [B]
            ranked = jnp.argsort(jnp.where(tgt_pad_mask, jnp.inf, scores), axis=1)
            rank_of = jnp.argsort(ranked, axis=1)  # position -> confidence rank
            remask = (rank_of < n_remask[:, None]) & ~tgt_pad_mask
            tokens = jnp.where(remask, mask_tok, tokens)
            return (tokens, scores), snapshot

        scores0 = jnp.zeros((B, L), jnp.float32)
        (tokens, scores), hist = jax.lax.scan(
            iteration, (tokens, scores0), jnp.arange(iterations)
        )
        tokens = jnp.where(tgt_pad_mask, pad, tokens)
        return tokens, scores, hist

    def mask_predict_with_length_beam(
        self,
        src_tokens: jax.Array,
        beam: int = 5,
        iterations: int = 10,
        max_len: Optional[int] = None,
        pad: int = 1,
        eos: int = 2,
        return_candidates: bool = False,
    ):
        """Length-beam mask-predict (reference:
        iterative_refinement_generator.py:138-158 on allow_length_beam
        models): run the refinement for the top-``beam`` predicted lengths in
        one batched pass and keep the candidate whose FINAL per-token
        confidences average highest — the reference reranks candidates by
        output_scores mean. -> (tokens [B, L], lengths [B]).

        With ``return_candidates`` returns ALL length-beam candidates
        beam-minor instead of selecting: (tokens [B*beam, L],
        lengths [B*beam], mean-confidence [B*beam]) — the surface the
        external reranker (--iter-decode-with-external-reranker,
        reference iterative_refinement_generator.py:313 rerank) scores."""
        c = self.cfg
        L = max_len or c.max_predicted_length
        B = src_tokens.shape[0]
        enc, enc_mask = self.encode(src_tokens)
        len_logits = self.predict_length_logits(enc, enc_mask)
        _, top_lens = jax.lax.top_k(len_logits, beam)  # [B, beam]
        lengths = jnp.clip(top_lens.reshape(-1), 1, L)  # [B*beam]
        enc_t = jnp.repeat(enc, beam, axis=0)
        enc_mask_t = jnp.repeat(enc_mask, beam, axis=0)
        tokens, scores, _ = self._mask_predict_from(
            lengths, enc_t, enc_mask_t, iterations, L, pad
        )
        pos = jnp.arange(L)[None, :]
        valid = pos < lengths[:, None]
        denom = jnp.maximum(jnp.sum(valid, axis=1), 1)
        mean_conf = jnp.sum(jnp.where(valid, scores, 0.0), axis=1) / denom
        if return_candidates:
            return tokens, lengths, mean_conf
        best = jnp.argmax(mean_conf.reshape(B, beam), axis=1)
        flat = jnp.arange(B) * beam + best
        return tokens[flat], lengths[flat]


@register_model("cmlm_transformer")
def build_cmlm(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    known = {f.name for f in dataclasses.fields(CMLMConfig)}
    cfg = CMLMConfig(**{k: v for k, v in cfg_dict.items() if k in known})
    return CMLMTransformer(cfg, dtype=dtype, param_dtype=param_dtype)


@register_model_architecture("cmlm_transformer", "cmlm_transformer")
def cmlm_base(cfg: Dict) -> Dict:
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


@register_model_architecture("cmlm_transformer", "cmlm_transformer_wmt_en_de")
def cmlm_wmt_en_de(cfg: Dict) -> Dict:
    """reference: nat/cmlm_transformer.py:160-162 (= base arch)."""
    return cmlm_base(cfg)
