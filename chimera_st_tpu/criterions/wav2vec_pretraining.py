"""wav2vec 2.0 pretraining criterion (reference:
fairseq/criterions/wav2vec_criterion.py — InfoNCE over masked frames +
diversity penalty (num_vars - prob_ppl)/num_vars + feature L2 penalty) and
its bimodal variant (reference: criterions/wav2vec_criterion_bimodal.py —
the same objective summed over both modality directions)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config.registry import register_criterion


def infonce_from_outputs(out, loss_weights=(0.1, 10.0)):
    """(loss, sample_size, logging) from a pretrain-model output dict."""
    logits = out["logits"].astype(jnp.float32)  # [B, T, 1+N], class 0 positive
    mask = out["mask"]
    lsm = jax.nn.log_softmax(logits, axis=-1)
    nll = -lsm[..., 0]
    masked_nll = jnp.where(mask, nll, 0.0)
    sample_size = jnp.sum(mask).astype(jnp.float32)
    contrastive = jnp.sum(masked_nll)

    div_w, pen_w = loss_weights
    diversity = (
        (out["num_vars"] - out["prob_perplexity"]) / out["num_vars"]
    ) * sample_size
    features_pen = out["features_pen"] * sample_size

    loss = contrastive + div_w * diversity + pen_w * features_pen
    # accuracy over masked frames
    correct = jnp.where(mask, jnp.argmax(logits, axis=-1) == 0, False)
    logging = {
        "loss": loss,
        "contrastive_loss": contrastive,
        "diversity_loss": diversity,
        "features_pen": features_pen,
        "prob_perplexity": out["prob_perplexity"],
        "n_correct": jnp.sum(correct).astype(jnp.float32),
        "total": sample_size,
        "sample_size": sample_size,
        "ntokens": sample_size,
        "nsentences": logits.shape[0],
    }
    return loss, sample_size, logging


@register_criterion("wav2vec")
def make_wav2vec_criterion(cfg: dict):
    loss_weights = tuple(cfg.get("loss_weights", (0.1, 10.0)))

    def criterion(model, params, batch, rngs=None, num_updates=None, train=True):
        temp = batch.get("gumbel_temp", 2.0)
        rngs = dict(rngs or {})
        if train and "dropout" in rngs:
            rngs["gumbel"] = jax.random.fold_in(rngs["dropout"], 7)
        out = model.apply(
            params,
            batch["audio"],
            batch.get("audio_padding_mask"),
            batch["mask_indices"],
            batch["negative_indices"],
            gumbel_temp=temp,
            deterministic=not train,
            rngs=rngs if train else None,
        )
        return infonce_from_outputs(out, loss_weights)

    return criterion


@register_criterion("wav2vec_bimodal")
def make_wav2vec_bimodal_criterion(cfg: dict):
    """Cross-modal variant: two aligned inputs share mask indices; the loss
    sums each modality's InfoNCE against the other's quantized targets
    (reference: wav2vec2_quasiwave.py:52-207 bimodal_forward)."""
    loss_weights = tuple(cfg.get("loss_weights", (0.1, 10.0)))

    def criterion(model, params, batch, rngs=None, num_updates=None, train=True):
        rngs = dict(rngs or {})
        if train and "dropout" in rngs:
            rngs["gumbel"] = jax.random.fold_in(rngs["dropout"], 7)
        total_loss = 0.0
        total_ss = 0.0
        logging = {}
        for direction, (src_key, tgt_key) in enumerate(
            [("audio", "audio2"), ("audio2", "audio")]
        ):
            out = model.apply(
                params,
                batch[src_key],
                batch.get(f"{src_key}_padding_mask"),
                batch["mask_indices"],
                batch["negative_indices"],
                deterministic=not train,
                rngs=rngs if train else None,
            )
            loss, ss, lg = infonce_from_outputs(out, loss_weights)
            total_loss = total_loss + loss
            total_ss = total_ss + ss
            for k, v in lg.items():
                logging[f"d{direction}_{k}"] = v
        logging["loss"] = total_loss
        logging["sample_size"] = total_ss
        logging["ntokens"] = total_ss
        logging["nsentences"] = batch["audio"].shape[0]
        return total_loss, total_ss, logging

    return criterion
