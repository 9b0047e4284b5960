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
    """(loss, sample_size, logging) from a pretrain-model output dict.

    ``loss_weights`` is (diversity, features_pen[, kmeans]); the optional
    third entry weights the kmeans-VQ latent+commitment MSE the model emits
    on the straight-through quantizer path (reference:
    modules/kmeans_vector_quantizer.py ``kmeans_loss``; defaults to 1.0)."""
    logits = out["logits"].astype(jnp.float32)  # [B, T, 1+N], class 0 positive
    mask = out["mask"]
    lsm = jax.nn.log_softmax(logits, axis=-1)
    nll = -lsm[..., 0]
    masked_nll = jnp.where(mask, nll, 0.0)
    sample_size = jnp.sum(mask).astype(jnp.float32)
    contrastive = jnp.sum(masked_nll)

    div_w, pen_w = loss_weights[:2]
    kmeans_w = loss_weights[2] if len(loss_weights) > 2 else 1.0
    diversity = (
        (out["num_vars"] - out["prob_perplexity"]) / out["num_vars"]
    ) * sample_size
    features_pen = out["features_pen"] * sample_size
    kmeans = out.get("kmeans_loss", jnp.float32(0.0)) * sample_size

    loss = contrastive + div_w * diversity + pen_w * features_pen + kmeans_w * kmeans
    # accuracy over masked frames
    correct = jnp.where(mask, jnp.argmax(logits, axis=-1) == 0, False)
    logging = {
        "loss": loss,
        "contrastive_loss": contrastive,
        "diversity_loss": diversity,
        "features_pen": features_pen,
        "kmeans_loss": kmeans,
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
        temp = batch.get("gumbel_temp", 2.0)  # annealed by the task
        # genuinely CROSS-modal: one apply computes preds_1 vs targets_2 and
        # preds_2 vs targets_1 over the shared mask (review fix: two
        # independent unimodal applies trained no cross-modal alignment and
        # dropped the gumbel temperature schedule)
        out12, out21 = model.apply(
            params,
            batch["audio"],
            batch["audio2"],
            batch.get("audio_padding_mask"),
            batch.get("audio2_padding_mask"),
            batch["mask_indices"],
            batch["negative_indices"],
            gumbel_temp=temp,
            deterministic=not train,
            rngs=rngs if train else None,
            method=type(model).bimodal_forward,
        )
        total_loss = 0.0
        total_ss = 0.0
        logging = {}
        for direction, out in enumerate([out12, out21]):
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


@register_criterion("aligning_loss_bimodal")
def make_aligning_loss_bimodal(cfg: dict):
    """Align the two modalities' unmasked context features directly
    (reference: criterions/aligning_loss_bimodal.py — cosine or L2 distance
    between aligned_feature_fn outputs; the second half of the quasiwave
    pretraining objective).

    ``fix_side`` ('audio' | 'text') treats that side as a fixed target. The
    reference freezes a pickled snapshot of the model at first forward
    (aligning_loss_bimodal.py:49-51); here the same role is played by
    ``stop_gradient`` through the fixed side of the CURRENT parameters — a
    per-step target rather than a start-of-training snapshot (documented
    delta: no second parameter copy exists in a functional train step).
    Batch keys: 'audio' is the audio side, 'audio2' the text/quasiwave side.
    """
    loss_kind = cfg.get("loss", "cosine")
    if loss_kind not in ("cosine", "l2"):
        raise ValueError(f"aligning loss must be cosine|l2, got {loss_kind!r}")
    fix_side = cfg.get("fix_side")
    if fix_side not in (None, "audio", "text"):
        raise ValueError(f"fix_side must be audio|text, got {fix_side!r}")

    def pair_loss(x1, x2, valid):
        x1 = x1.astype(jnp.float32)
        x2 = x2.astype(jnp.float32)
        if loss_kind == "cosine":
            n1 = jnp.maximum(jnp.linalg.norm(x1, axis=-1), 1e-8)
            n2 = jnp.maximum(jnp.linalg.norm(x2, axis=-1), 1e-8)
            per_frame = 1.0 - jnp.sum(x1 * x2, axis=-1) / (n1 * n2)
        else:
            per_frame = jnp.mean(jnp.square(x1 - x2), axis=-1)
        return jnp.sum(jnp.where(valid, per_frame, 0.0))

    def criterion(model, params, batch, rngs=None, num_updates=None, train=True):
        feats = {}
        for side, key in (("audio", "audio"), ("text", "audio2")):
            x, mask = model.apply(
                params,
                batch[key],
                batch.get(f"{key}_padding_mask"),
                deterministic=not train,
                rngs=rngs if train else None,
                method=type(model).aligned_features,
            )
            feats[side] = (x, mask)
        a, a_mask = feats["audio"]
        t, t_mask = feats["text"]
        T = min(a.shape[1], t.shape[1])
        a, t = a[:, :T], t[:, :T]
        valid = jnp.ones(a.shape[:2], bool)
        if a_mask is not None:
            valid &= ~a_mask[:, :T]
        if t_mask is not None:
            valid &= ~t_mask[:, :T]

        if fix_side is None:
            loss = pair_loss(a, t, valid)
        else:
            # the trainable side regresses onto a stop-gradient snapshot of
            # the fixed side (reference aligning_loss_bimodal.py:85-89 with
            # the pickled snapshot replaced by stop_gradient; review fix —
            # the old arithmetic paired the fixed side with ITSELF (a zero,
            # gradient-free term) and let gradients flow into the
            # supposedly-fixed side through the second term)
            fixed = jax.lax.stop_gradient(a if fix_side == "audio" else t)
            trainable = t if fix_side == "audio" else a
            loss = pair_loss(trainable, fixed, valid)

        sample_size = jnp.sum(valid).astype(jnp.float32)
        logging = {
            "loss": loss,
            "sample_size": sample_size,
            "ntokens": sample_size,
            "nsentences": a.shape[0],
        }
        return loss, sample_size, logging

    return criterion
