"""Label-smoothed cross entropy.

Matches the reference formula exactly
(reference: fairseq/criterions/label_smoothed_cross_entropy.py:13-31):
loss = (1 - eps) * nll + (eps / V) * sum_v(-lprobs_v), pad positions zeroed.
Log-softmax runs in fp32 (bf16-safe).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config.registry import register_criterion


def label_smoothed_nll_loss(
    lprobs: jax.Array,  # [..., V] log-probabilities (fp32)
    target: jax.Array,  # [...] int
    epsilon: float,
    ignore_index: Optional[int] = 1,
    reduce: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (loss, nll_loss); summed over non-pad positions if reduce."""
    nll = -jnp.take_along_axis(lprobs, target[..., None], axis=-1)[..., 0]
    smooth = -jnp.sum(lprobs, axis=-1)
    if ignore_index is not None:
        keep = target != ignore_index
        nll = jnp.where(keep, nll, 0.0)
        smooth = jnp.where(keep, smooth, 0.0)
    if reduce:
        nll = jnp.sum(nll)
        smooth = jnp.sum(smooth)
    eps_i = epsilon / lprobs.shape[-1]
    loss = (1.0 - epsilon) * nll + eps_i * smooth
    return loss, nll


def ce_loss_from_logits(
    logits: jax.Array,  # [B, T, V]
    target: jax.Array,  # [B, T]
    epsilon: float = 0.0,
    ignore_index: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return label_smoothed_nll_loss(lprobs, target, epsilon, ignore_index)


def accuracy_counts(logits, target, ignore_index: int = 1):
    keep = target != ignore_index
    pred = jnp.argmax(logits, axis=-1)
    n_correct = jnp.sum((pred == target) & keep)
    total = jnp.sum(keep)
    return n_correct, total


@register_criterion("label_smoothed_cross_entropy")
def make_label_smoothed_ce(cfg: dict):
    """Criterion factory. Returned fn: (model, params, batch, rngs) ->
    (loss, sample_size, logging)."""
    eps = float(cfg.get("label_smoothing", 0.1))
    sentence_avg = bool(cfg.get("sentence_avg", False))
    ignore_index = int(cfg.get("padding_idx", 1))

    def criterion(model, params, batch, rngs=None, num_updates=None, train=True):
        if "audio" in batch:
            # audio-source batch (pure-CE ST / wav2vec_seq2seq ASR fine-tune)
            logits, _ = model.apply(
                params,
                batch["audio"],
                batch["audio_padding_mask"],
                batch["prev_output_tokens"],
                deterministic=not train,
                rngs=rngs,
                method=type(model).forward_audio_with_internal,
            )
        else:
            logits, _ = model.apply(
                params,
                batch["src_tokens"],
                batch["prev_output_tokens"],
                deterministic=not train,
                rngs=rngs,
                method=type(model).forward_text_with_internal,
            )
        loss, nll = ce_loss_from_logits(
            logits, batch["target"], eps, ignore_index
        )
        ntokens = batch["ntokens"]
        nsentences = batch["target"].shape[0]
        sample_size = nsentences if sentence_avg else ntokens
        logging = {
            "loss": loss,
            "nll_loss": nll,
            "ntokens": ntokens,
            "nsentences": nsentences,
            "sample_size": sample_size,
        }
        return loss, sample_size, logging

    return criterion


@register_criterion("label_smoothed_cross_entropy_with_alignment")
def make_label_smoothed_ce_with_alignment(cfg: dict):
    """CE + supervised-attention alignment loss (reference:
    fairseq/criterions/label_smoothed_cross_entropy_with_alignment.py — NLL of
    the head-averaged cross-attention probabilities at gold (tgt, src) links,
    weighted by --alignment-lambda; the transformer_align model surface).

    Batch carries ``alignment_tgt``/``alignment_src`` [B, A] index arrays
    padded with -1 (host-built from the preprocess --align-suffix data)."""
    base = make_label_smoothed_ce(cfg)
    align_lambda = float(cfg.get("alignment_lambda", 0.05))

    def criterion(model, params, batch, rngs=None, num_updates=None, train=True):
        loss, sample_size, logging = base(
            model, params, batch, rngs=rngs, num_updates=num_updates, train=train
        )
        if "alignment_tgt" in batch:
            # one combined apply for encode + attention. Remaining documented
            # delta vs the reference (which reads attn out of the SAME
            # net_output as the CE): this is a second, dropout-free forward —
            # folding attn into forward_text_with_internal across every
            # encoder-decoder model was judged not worth the surface churn
            # for an alignment-supervision-only cost.
            attn = model.apply(
                params, batch["src_tokens"], batch["prev_output_tokens"],
                method=lambda m, s, t: m.decoder.cross_attention_weights(
                    t, *m.encode_text(s)
                ),
            )  # [B, T, S] probabilities
            at = batch["alignment_tgt"]
            asrc = batch["alignment_src"]
            valid = (at >= 0) & (asrc >= 0)
            p = jnp.take_along_axis(
                jnp.take_along_axis(
                    attn, jnp.maximum(at, 0)[:, :, None], axis=1
                ),
                jnp.maximum(asrc, 0)[:, :, None, None][..., 0],
                axis=2,
            )[..., 0]
            align_nll = -jnp.log(jnp.clip(p, 1e-9, 1.0))
            # reference align_weights (label_smoothed_cross_entropy_with_
            # alignment.py:73-80): each link weighs 1/(number of links
            # sharing its target position), so a multiply-aligned target
            # token does not dominate the gradient (review fix: raw sums
            # over-weighted one-to-many alignments)
            same_tgt = (
                (at[:, :, None] == at[:, None, :])
                & valid[:, :, None] & valid[:, None, :]
            )
            link_counts = jnp.maximum(same_tgt.sum(axis=-1), 1)
            align_nll = align_nll / link_counts.astype(align_nll.dtype)
            align_loss = jnp.sum(jnp.where(valid, align_nll, 0.0))
            loss = loss + align_lambda * align_loss
            logging = dict(logging)
            logging["alignment_loss"] = align_loss
            logging["loss"] = loss
        return loss, sample_size, logging

    return criterion
