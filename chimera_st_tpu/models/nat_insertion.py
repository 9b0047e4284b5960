"""Insertion transformer (parallel-insertion NAT).

reference: fairseq/models/nat/insertion_transformer.py ("Insertion
Transformer", Stern et al. 2019): for every adjacent slot the decoder scores
the vocabulary of tokens to insert; training weights the tokens of each
slot's span by a balanced-binary-tree schedule (center-first); the PAD class
is the no-insert decision. Decode inserts at most one token per slot per
round, in parallel, until all slots predict pad (fixed rounds here — a
converged round is a no-op).

Training targets are reconstructed host-side from the same batched C++
suggested_edit_ops used by the Levenshtein model (see
insertion_slot_targets below)."""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config.registry import register_criterion, register_model, register_model_architecture
from .nat_levenshtein import _scan_refine_history, apply_ins_placeholders
from .transformer_mt import TransformerMTConfig, TransformerModel

Dtype = Any


def insertion_slot_targets(
    ins_input: np.ndarray,  # [B, Lx] corrupted input (pad-padded)
    target: np.ndarray,  # [B, Ly] full target
    ins_counts: np.ndarray,  # [B, Lx-1] from suggested_edit_ops
    ins_masks: np.ndarray,  # [B, Ly] from suggested_edit_ops
    pad: int = 1,
    max_span: int = 8,
    tau: float = 1.0,
):
    """Per-slot insertable tokens + balanced-tree weights
    (reference: insertion_transformer.py _get_ins_targets + the
    neg-binary-tree weighting). Empty slots get (pad, weight 1) — pad is the
    no-insert class."""
    B, Lxm1 = ins_counts.shape
    toks = np.full((B, Lxm1, max_span), pad, np.int32)
    wts = np.zeros((B, Lxm1, max_span), np.float32)
    for b in range(B):
        span_tokens = target[b][ins_masks[b].astype(bool)]
        pos = 0
        for s in range(Lxm1):
            n = int(ins_counts[b, s])
            if n == 0:
                toks[b, s, 0] = pad
                wts[b, s, 0] = 1.0
                continue
            span = span_tokens[pos : pos + n]
            pos += n
            n_keep = min(n, max_span)
            center = (n - 1) / 2.0
            raw = np.exp(-np.abs(np.arange(n) - center) / max(tau, 1e-6))
            raw = raw / raw.sum()
            toks[b, s, :n_keep] = span[:n_keep]
            wts[b, s, :n_keep] = raw[:n_keep] / max(raw[:n_keep].sum(), 1e-6)
    return toks, wts


@dataclass(frozen=True)
class InsertionConfig(TransformerMTConfig):
    pass


class InsertionTransformer(nn.Module):
    cfg: InsertionConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        mt_cfg = TransformerMTConfig(
            **{**{f.name: getattr(self.cfg, f.name)
                  for f in dataclasses.fields(TransformerMTConfig)},
               "decoder_causal": False}
        )
        self.backbone = TransformerModel(
            mt_cfg, dtype=self.dtype, param_dtype=self.param_dtype, name="backbone"
        )
        self.slot_proj = nn.Dense(
            self.cfg.decoder_embed_dim, name="slot_proj",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

    def encode(self, src_tokens, deterministic: bool = True):
        return self.backbone.encode(src_tokens, deterministic)

    def slot_logits(self, tokens, enc, enc_mask, deterministic: bool = True):
        """[B, L-1, V] token-insertion scores per adjacent slot."""
        f = self.backbone.decoder(
            tokens, enc, enc_mask, deterministic=deterministic, features_only=True
        )
        pairs = jnp.concatenate([f[:, :-1], f[:, 1:]], axis=-1)
        h = jax.nn.gelu(self.slot_proj(pairs))
        # score against the tied output embedding (reference ties to vocab)
        return self.backbone.decoder.embed_tokens.attend(h).astype(jnp.float32)

    def __call__(self, src_tokens, slot_input, deterministic: bool = True):
        enc, enc_mask = self.encode(src_tokens, deterministic)
        return self.slot_logits(slot_input, enc, enc_mask, deterministic)

    def refine(self, src_tokens, iterations: int = 8, max_len: int = 64,
               pad: int = 1, bos: int = 0, eos: int = 2, unk: int = 3,
               force_iterations: bool = False, return_history: bool = False):
        """Parallel insertion decode -> (tokens [B, L], lengths [B]).
        ``force_iterations`` disables the all-slots-said-pad early exit
        (--iter-decode-force-max-iter). ``return_history``
        (--retain-iter-history) runs the full fixed bound instead (a no-insert
        round is a fixpoint of the deterministic rounds, so the result is
        identical) and also returns per-round canvases [iterations, B, L] +
        per-sentence step counts [B]."""
        B = src_tokens.shape[0]
        enc, enc_mask = self.encode(src_tokens)
        init_tokens = jnp.full((B, max_len), pad, jnp.int32)
        init_tokens = init_tokens.at[:, 0].set(bos).at[:, 1].set(eos)

        def one_round(tokens):
            logits = self.slot_logits(tokens, enc, enc_mask)
            pick = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, L-1]
            do_insert = (pick != pad) & (tokens[:, 1:] != pad)
            ins = do_insert.astype(jnp.int32)
            new = apply_ins_placeholders(tokens, ins, pad, unk, eos)
            # place picked tokens at the created placeholders, in slot order
            fill = jnp.cumsum((new == unk).astype(jnp.int32), axis=1) - 1
            picked_sorted = _compact_picks(pick, do_insert)
            filled = jnp.where(
                new == unk,
                jnp.take_along_axis(
                    picked_sorted, jnp.clip(fill, 0, pick.shape[1] - 1), axis=1
                ),
                new,
            )
            return filled, jnp.any(do_insert)

        if return_history:
            tokens, hist, steps = _scan_refine_history(
                lambda t: one_round(t)[0], init_tokens, iterations
            )
            return tokens, jnp.sum(tokens != pad, axis=1), hist, steps

        def body(state):
            i, tokens, _ = state
            filled, inserted = one_round(tokens)
            return i + 1, filled, inserted

        def cond(state):
            i, _, inserted = state
            if force_iterations:
                return i < iterations
            return (i < iterations) & inserted  # stop once all slots said pad

        _, tokens, _ = jax.lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), init_tokens, jnp.asarray(True))
        )
        lengths = jnp.sum(tokens != pad, axis=1)
        return tokens, lengths


def _compact_picks(pick, do_insert):
    """Left-compact the picked tokens of inserting slots (slot order ==
    placeholder order after apply_ins_placeholders)."""
    order = jnp.argsort(~do_insert, axis=1, stable=True)
    return jnp.take_along_axis(pick, order, axis=1)


@register_model("insertion_transformer")
def build_insertion(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    known = {f.name for f in dataclasses.fields(InsertionConfig)}
    cfg = InsertionConfig(**{k: v for k, v in cfg_dict.items() if k in known})
    return InsertionTransformer(cfg, dtype=dtype, param_dtype=param_dtype)


@register_model_architecture("insertion_transformer", "insertion_transformer")
def insertion_base(cfg: Dict) -> Dict:
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


@register_criterion("insertion_loss")
def make_insertion_loss(cfg: Dict):
    """Weighted CE over slots: each slot's loss is the tree-weighted NLL of
    its insertable tokens (pad = no-insert class gets weight 1 on empty
    slots). Batch fields built by tasks/translation_ins.py."""
    pad_idx = int(cfg.get("padding_idx", 1))

    def criterion(model, params, batch, rngs=None, num_updates=None, train=True):
        logits = model.apply(
            params, batch["src_tokens"], batch["ins_input"],
            deterministic=not train, rngs=rngs,
        )
        lp = jax.nn.log_softmax(logits, axis=-1)  # [B, L-1, V]
        toks = batch["slot_tokens"]  # [B, L-1, S]
        wts = batch["slot_weights"]  # [B, L-1, S]
        slot_valid = (batch["ins_input"][:, 1:] != pad_idx)[..., None]
        nll = -jnp.take_along_axis(lp, toks, axis=-1)
        loss = jnp.sum(jnp.where(slot_valid, wts * nll, 0.0))
        sample_size = jnp.maximum(jnp.sum(slot_valid), 1).astype(jnp.float32)
        return loss, sample_size, {
            "loss": loss,
            "nll_loss": loss,
            "ntokens": batch["ntokens"],
            "nsentences": batch["ins_input"].shape[0],
            "sample_size": sample_size,
        }

    return criterion
