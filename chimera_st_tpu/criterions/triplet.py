"""Tri-modal Chimera loss: ST cross-entropy + MT cross-entropy + per-memory
contrastive alignment.

TPU-native rebuild of the reference criterion
(reference: fairseq/criterions/triplet_st_mt_contrastive.py:18-212):

- runs the model twice sharing parameters — audio path then text path — and
  the decoder sees both (reference :78-107),
- contrastive term: per-sample M x M cosine-similarity matrix between audio
  and text memory banks (fp32), temperature 0.1, InfoNCE classifying the
  matching audio slot for each text slot (reference compute_contrastive
  :154-169 — torch F.cross_entropy over the class dim of [B, M, M]),
- ``loss_ratio = (r0, r1, r2)`` weights, optional linear ramp of the
  contrastive weight until ``contrastive_increase_until`` updates (:119-124),
- the sample-contrastive variant contrasts across the batch instead of across
  memory slots (reference: triplet_st_mt_samplecontrastive.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config.registry import register_criterion
from .label_smoothed_ce import ce_loss_from_logits


def memory_contrastive_loss(
    audio_mem: jax.Array,  # [B, M, D]
    text_mem: jax.Array,  # [B, M, D]
    temperature: float = 0.1,
) -> jax.Array:
    """Per-memory-slot InfoNCE over cosine similarities (summed)."""
    a = audio_mem.astype(jnp.float32)
    t = text_mem.astype(jnp.float32)
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-8)
    # logits[b, i, j] = cos(audio_i, text_j) / temp
    logits = jnp.einsum("bid,bjd->bij", a, t) / temperature
    # for each text slot j: classify audio slot i == j (normalize over i)
    lsm = jax.nn.log_softmax(logits, axis=1)
    diag = jnp.diagonal(lsm, axis1=1, axis2=2)  # [B, M]
    return -jnp.sum(diag)


def sample_contrastive_loss(
    audio_mem: jax.Array,  # [B, M, D]
    text_mem: jax.Array,
    temperature: float = 0.1,
) -> jax.Array:
    """Across-batch InfoNCE: mean-pooled memories, classify matching sample."""
    a = jnp.mean(audio_mem.astype(jnp.float32), axis=1)
    t = jnp.mean(text_mem.astype(jnp.float32), axis=1)
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-8)
    logits = (a @ t.T) / temperature  # [B, B]
    lsm = jax.nn.log_softmax(logits, axis=0)
    return -jnp.sum(jnp.diagonal(lsm))


def _make_triplet(cfg: dict, contrastive_fn):
    eps = float(cfg.get("label_smoothing", 0.1))
    ratios = tuple(cfg.get("loss_ratio", (1.0, 1.0, 1.0)))
    temp = float(cfg.get("contrastive_temp", 0.1))
    ramp_until = cfg.get("contrastive_increase_until", None)
    sentence_avg = bool(cfg.get("sentence_avg", False))
    ignore_index = int(cfg.get("padding_idx", 1))
    # per-sample distillation reweighting by id parity
    # (reference: triplet_st_mt_contrastive.py:80-96 --kd-ratio a b:
    # even-id samples weighted a, odd-id ("teacher") samples weighted b;
    # only valid with loss_ratio (1, 0, 0))
    kd_ratio = cfg.get("kd_ratio", None)
    if kd_ratio is not None and tuple(kd_ratio) == (None, None):
        kd_ratio = None
    if kd_ratio is not None:
        assert tuple(ratios) == (1.0, 0.0, 0.0), (
            "--kd-ratio requires --loss-ratio 1 0 0 (reference assertion)"
        )

    def criterion(model, params, batch, rngs=None, num_updates=None, train=True):
        det = not train
        st_logits, audio_mem = model.apply(
            params,
            batch["audio"],
            batch["audio_padding_mask"],
            batch["prev_output_tokens"],
            deterministic=det,
            rngs=rngs,
            method=type(model).forward_audio_with_internal,
        )
        if kd_ratio is None:
            st_loss, st_nll = ce_loss_from_logits(
                st_logits, batch["target"], eps, ignore_index
            )
        else:
            lprobs = jax.nn.log_softmax(st_logits.astype(jnp.float32), axis=-1)
            from .label_smoothed_ce import label_smoothed_nll_loss

            per_tok, per_tok_nll = label_smoothed_nll_loss(
                lprobs, batch["target"], eps, ignore_index, reduce=False
            )
            is_teacher = (batch["id"] % 2).astype(jnp.float32)  # [B]
            w = is_teacher * kd_ratio[1] + (1.0 - is_teacher) * kd_ratio[0]
            st_loss = jnp.sum(per_tok * w[:, None])
            st_nll = jnp.sum(per_tok_nll * w[:, None])

        if ratios[1] != 0.0 or ratios[2] != 0.0:
            mt_logits, text_mem = model.apply(
                params,
                batch["src_text"],
                batch["prev_output_tokens"],
                deterministic=det,
                rngs=rngs,
                method=type(model).forward_text_with_internal,
            )
            mt_loss, mt_nll = ce_loss_from_logits(
                mt_logits, batch["target"], eps, ignore_index
            )
        else:
            mt_loss = mt_nll = jnp.zeros((), jnp.float32)
            text_mem = None

        if ratios[2] != 0.0 and text_mem is not None:
            contrastive = contrastive_fn(audio_mem, text_mem, temp)
        else:
            contrastive = jnp.zeros((), jnp.float32)

        r2 = ratios[2]
        if ramp_until and num_updates is not None:
            r2 = r2 * jnp.minimum(1.0, num_updates / ramp_until)
        loss = ratios[0] * st_loss + ratios[1] * mt_loss + r2 * contrastive
        nll = ratios[0] * st_nll + ratios[1] * mt_nll

        ntokens = batch["ntokens"]
        nsentences = batch["target"].shape[0]
        sample_size = nsentences if sentence_avg else ntokens
        logging = {
            "loss": loss,
            "nll_loss": nll,
            "st_loss": st_loss,
            "st_nll_loss": st_nll,
            "mt_loss": mt_loss,
            "mt_nll_loss": mt_nll,
            "contrastive_loss": contrastive,
            "ntokens": ntokens,
            "nsentences": nsentences,
            "sample_size": sample_size,
        }
        return loss, sample_size, logging

    return criterion


@register_criterion("triplet_st_mt_contrastive")
def make_triplet_contrastive(cfg: dict):
    return _make_triplet(cfg, memory_contrastive_loss)


@register_criterion("triplet_st_mt_samplecontrastive")
def make_triplet_sample_contrastive(cfg: dict):
    return _make_triplet(cfg, sample_contrastive_loss)
