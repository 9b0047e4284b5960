"""Vanilla + iterative non-autoregressive transformers, and NAT-CRF.

Reference: fairseq/models/nat/nonautoregressive_transformer.py (one-shot
NAT with a length head; decoder inputs are [bos, unk, ..., unk, eos]),
fairseq/models/nat/iterative_nonautoregressive_transformer.py (trains the
same model through stochastically-corrupted multi-step inputs), and
fairseq/models/nat/nat_crf_transformer.py (NAT emissions + DynamicCRF
structured decoding, Sun et al. 2019).

TPU-native design: decoding is a fixed number of full re-prediction passes
under ``lax.scan`` (the reference's IterativeRefinementGenerator loops with
dynamic early exit); the CRF forward/Viterbi are scans over time
(models/crf.py). ``src_embedding_copy`` (an optional reference flag that
feeds uniformly-copied source EMBEDDINGS) is superseded by the default
unk-token inputs — the copied-embedding variant needs a features-in
decoder entry point that no other component uses.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.registry import register_model, register_model_architecture
from .transformer_mt import TransformerMTConfig, TransformerModel

Dtype = Any


@dataclass(frozen=True)
class NATConfig(TransformerMTConfig):
    max_predicted_length: int = 256
    unk_idx: int = 3
    bos_idx: int = 0
    eos_idx: int = 2
    # iterative variant (reference: iterative_nonautoregressive_transformer
    # --train-step/--dae-ratio/--stochastic-approx)
    train_steps: int = 1
    dae_ratio: float = 0.5
    # NAT-CRF (reference: nat_crf_transformer --crf-lowrank-approx/--crf-beam-approx)
    crf_lowrank: int = 0  # 0: no CRF
    crf_beam: int = 64


class NATransformer(nn.Module):
    """One-shot NAT: bidirectional decoder over unk-filled inputs + length
    head; optionally a DynamicCRF output layer (crf_lowrank > 0)."""

    cfg: NATConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        mt_cfg = TransformerMTConfig(
            **{**{f.name: getattr(self.cfg, f.name)
                  for f in dataclasses.fields(TransformerMTConfig)},
               "decoder_causal": False}
        )
        self.backbone = TransformerModel(
            mt_cfg, dtype=self.dtype, param_dtype=self.param_dtype,
            name="backbone",
        )
        self.length_head = nn.Dense(
            self.cfg.max_predicted_length, dtype=self.dtype,
            param_dtype=self.param_dtype, name="length_head",
        )
        if self.cfg.crf_lowrank > 0:
            from .crf import DynamicCRF

            self.crf = DynamicCRF(
                self.cfg.tgt_vocab_size, low_rank=self.cfg.crf_lowrank,
                beam=self.cfg.crf_beam, dtype=self.dtype,
                param_dtype=self.param_dtype, name="crf",
            )
        else:
            self.crf = None

    # --------------------------------------------------------------- pieces
    def encode(self, src_tokens: jax.Array, deterministic: bool = True):
        return self.backbone.encode(src_tokens, deterministic)

    def predict_length_logits(self, enc, enc_mask) -> jax.Array:
        valid = (~enc_mask)[..., None].astype(enc.dtype)
        pooled = jnp.sum(enc * valid, axis=1) / jnp.maximum(
            jnp.sum(valid, axis=1), 1.0
        )
        return self.length_head(pooled).astype(jnp.float32)

    def initial_output_tokens(self, lengths: jax.Array, max_len: int):
        """[bos, unk * (len-2), eos] rows + padding mask
        (reference: NATransformerModel.initialize_output_tokens)."""
        c = self.cfg
        pos = jnp.arange(max_len)[None, :]
        toks = jnp.full_like(
            jnp.broadcast_to(pos, (lengths.shape[0], max_len)), c.unk_idx
        )
        toks = jnp.where(pos == 0, c.bos_idx, toks)
        toks = jnp.where(pos == (lengths - 1)[:, None], c.eos_idx, toks)
        pad = pos >= lengths[:, None]
        toks = jnp.where(pad, c.padding_idx, toks)
        return toks.astype(jnp.int32)

    def decode_tokens(self, tokens, enc, enc_mask, deterministic=True):
        return self.backbone.decoder(
            tokens, enc, enc_mask, deterministic=deterministic
        )

    # ------------------------------------------------------------- training
    def __call__(
        self,
        src_tokens: jax.Array,
        prev_output_tokens: jax.Array,  # unk-filled to the target length
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """-> (token logits [B, T, V] fp32, length logits [B, L])."""
        enc, enc_mask = self.encode(src_tokens, deterministic)
        logits = self.decode_tokens(
            prev_output_tokens, enc, enc_mask, deterministic
        )
        return logits, self.predict_length_logits(enc, enc_mask)

    def forward_iterative(
        self,
        src_tokens: jax.Array,
        prev_output_tokens: jax.Array,
        rng: jax.Array,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """INAT training forward: after the first pass, each further step
        feeds back the model's own (stop-gradient) predictions, each token
        kept with prob ``dae_ratio`` else reverted to unk (reference:
        iterative_nonautoregressive_transformer.py _sequential_poisoning /
        stochastic approximation). Returns stacked per-step logits
        [S, B, T, V] and the length logits."""
        c = self.cfg
        enc, enc_mask = self.encode(src_tokens, deterministic)
        pad = prev_output_tokens == c.padding_idx

        logits_steps = []
        toks = prev_output_tokens
        for s in range(max(1, c.train_steps)):
            logits = self.decode_tokens(toks, enc, enc_mask, deterministic)
            logits_steps.append(logits)
            if s + 1 < max(1, c.train_steps):
                pred = jnp.argmax(
                    jax.lax.stop_gradient(logits), axis=-1
                ).astype(jnp.int32)
                keep = jax.random.bernoulli(
                    jax.random.fold_in(rng, s), c.dae_ratio, pred.shape
                )
                toks = jnp.where(keep, pred, jnp.full_like(pred, c.unk_idx))
                # anchors survive poisoning
                toks = jnp.where(
                    (prev_output_tokens == c.bos_idx)
                    | (prev_output_tokens == c.eos_idx),
                    prev_output_tokens, toks,
                )
                toks = jnp.where(pad, c.padding_idx, toks)
        return jnp.stack(logits_steps), self.predict_length_logits(
            enc, enc_mask
        )

    def crf_loglikelihood(
        self,
        src_tokens: jax.Array,
        prev_output_tokens: jax.Array,
        targets: jax.Array,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """NAT-CRF training: per-sentence CRF log-likelihood of the targets
        under the decoder emissions + length logits
        (reference: nat_crf_transformer.py forward)."""
        assert self.crf is not None, "built without crf_lowrank"
        enc, enc_mask = self.encode(src_tokens, deterministic)
        emissions = self.decode_tokens(
            prev_output_tokens, enc, enc_mask, deterministic
        )
        mask = prev_output_tokens != self.cfg.padding_idx
        llh = self.crf.loglikelihood(emissions, targets, mask)
        return llh, self.predict_length_logits(enc, enc_mask)

    def init_everything(self, src_tokens, prev_output_tokens):
        """Init entry that materializes ALL params (lazy flax setup would
        skip the CRF head on the plain __call__ path)."""
        logits, length_logits = self(src_tokens, prev_output_tokens)
        if self.crf is not None:
            targets = jnp.where(
                prev_output_tokens == self.cfg.unk_idx,
                jnp.ones_like(prev_output_tokens) * 4,
                prev_output_tokens,
            )
            mask = prev_output_tokens != self.cfg.padding_idx
            self.crf.loglikelihood(logits, targets, mask)
        return logits, length_logits

    # -------------------------------------------------------------- decode
    def translate(
        self,
        src_tokens: jax.Array,
        max_len: Optional[int] = None,
        iterations: int = 1,
        deterministic: bool = True,
        return_history: bool = False,
    ):
        """Predict lengths, then ``iterations`` full re-prediction passes
        (argmax feedback; the reference's iterative refinement without the
        dynamic early exit). With a CRF head the final pass decodes with
        Viterbi. -> (tokens [B, L], lengths [B]).

        With ``return_history`` (--retain-iter-history) also returns the
        canvas after each pass, [iterations, B, L]."""
        c = self.cfg
        L = max_len or c.max_predicted_length
        enc, enc_mask = self.encode(src_tokens, deterministic)
        lengths = jnp.clip(
            jnp.argmax(self.predict_length_logits(enc, enc_mask), -1), 2, L
        )
        toks = self.initial_output_tokens(lengths, L)
        pos = jnp.arange(L)[None, :]
        interior = (pos > 0) & (pos < (lengths - 1)[:, None])

        history = []
        for it in range(max(1, iterations)):
            emissions = self.decode_tokens(toks, enc, enc_mask, deterministic)
            if self.crf is not None and it == max(1, iterations) - 1:
                pred = self.crf.decode(emissions, pos < lengths[:, None])
            else:
                pred = jnp.argmax(emissions, axis=-1).astype(jnp.int32)
            toks = jnp.where(interior, pred, toks)
            if return_history:
                history.append(toks)
        if return_history:
            return toks, lengths, jnp.stack(history)
        return toks, lengths

    def translate_with_length_beam(
        self,
        src_tokens: jax.Array,
        beam: int = 5,
        max_len: Optional[int] = None,
        iterations: int = 1,
        deterministic: bool = True,
        return_candidates: bool = False,
    ):
        """Length-beam NAT decode (reference:
        iterative_refinement_generator.py:138-158 `--iter-decode-with-beam` on
        models with allow_length_beam): decode the top-``beam`` predicted
        lengths per sentence in ONE batched pass and keep the candidate with
        the best average token log-prob over its interior.
        -> (tokens [B, L], lengths [B]).

        With ``return_candidates`` returns all candidates beam-minor —
        (tokens [B*beam, L], lengths [B*beam], mean log-prob [B*beam]) —
        for the external reranker (--iter-decode-with-external-reranker)."""
        c = self.cfg
        L = max_len or c.max_predicted_length
        B = src_tokens.shape[0]
        enc, enc_mask = self.encode(src_tokens, deterministic)
        len_logits = self.predict_length_logits(enc, enc_mask)  # [B, L_head]
        # top-beam candidate lengths, clipped to the static canvas
        _, top_lens = jax.lax.top_k(len_logits, beam)  # [B, beam]
        lengths = jnp.clip(top_lens.reshape(-1), 2, L)  # [B*beam]
        # tile encoder state per candidate (beam-minor: sentence b's
        # candidates are rows b*beam..b*beam+beam-1)
        enc_t = jnp.repeat(enc, beam, axis=0)
        enc_mask_t = jnp.repeat(enc_mask, beam, axis=0)

        toks = self.initial_output_tokens(lengths, L)
        pos = jnp.arange(L)[None, :]
        interior = (pos > 0) & (pos < (lengths - 1)[:, None])
        emissions = None
        for it in range(max(1, iterations)):
            emissions = self.decode_tokens(toks, enc_t, enc_mask_t,
                                           deterministic)
            if self.crf is not None and it == max(1, iterations) - 1:
                pred = self.crf.decode(emissions, pos < lengths[:, None])
            else:
                pred = jnp.argmax(emissions, axis=-1).astype(jnp.int32)
            toks = jnp.where(interior, pred, toks)

        # rerank: mean log-prob of the chosen interior tokens (the
        # reference averages the word scores of each candidate)
        lp = jax.nn.log_softmax(emissions.astype(jnp.float32), axis=-1)
        tok_lp = jnp.take_along_axis(lp, toks[..., None], axis=-1)[..., 0]
        denom = jnp.maximum(jnp.sum(interior, axis=1), 1)
        score = jnp.sum(jnp.where(interior, tok_lp, 0.0), axis=1) / denom
        if return_candidates:
            return toks, lengths, score
        best = jnp.argmax(score.reshape(B, beam), axis=1)  # [B]
        flat = jnp.arange(B) * beam + best
        return toks[flat], lengths[flat]


def _build(cfg_dict, dtype, param_dtype, **over):
    known = {f.name for f in dataclasses.fields(NATConfig)}
    d = {k: v for k, v in dict(cfg_dict).items() if k in known}
    d.update(over)
    return NATransformer(NATConfig(**d), dtype=dtype, param_dtype=param_dtype)


@register_model("nonautoregressive_transformer")
def build_nat(cfg_dict, dtype=jnp.float32, param_dtype=jnp.float32):
    return _build(cfg_dict, dtype, param_dtype, crf_lowrank=0, train_steps=1)


@register_model("iterative_nonautoregressive_transformer")
def build_inat(cfg_dict, dtype=jnp.float32, param_dtype=jnp.float32):
    d = dict(cfg_dict)
    d.setdefault("train_steps", 2)
    return _build(d, dtype, param_dtype, crf_lowrank=0)


@register_model("nacrf_transformer")
def build_nacrf(cfg_dict, dtype=jnp.float32, param_dtype=jnp.float32):
    d = dict(cfg_dict)
    d.setdefault("crf_lowrank", 32)
    d.setdefault("crf_beam", 64)
    return _build(d, dtype, param_dtype)


@register_model_architecture(
    "nonautoregressive_transformer", "nonautoregressive_transformer"
)
def nat_base(cfg):
    return cfg


@register_model_architecture(
    "iterative_nonautoregressive_transformer",
    "iterative_nonautoregressive_transformer",
)
def inat_base(cfg):
    return cfg


@register_model_architecture("nacrf_transformer", "nacrf_transformer")
def nacrf_base(cfg):
    return cfg


@register_model_architecture(
    "nonautoregressive_transformer", "nonautoregressive_transformer_wmt_en_de"
)
def nat_wmt_en_de(cfg):
    """reference: nat/nonautoregressive_transformer.py:437-440 (= base)."""
    return nat_base(cfg)


@register_model_architecture(
    "iterative_nonautoregressive_transformer",
    "iterative_nonautoregressive_transformer_wmt_en_de",
)
def inat_wmt_en_de(cfg):
    """reference: nat/iterative_nonautoregressive_transformer.py:223-228."""
    return inat_base(cfg)
