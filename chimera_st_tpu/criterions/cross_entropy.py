"""Plain cross entropy criterion (reference: fairseq/criterions/cross_entropy.py)."""

from __future__ import annotations

from ..config.registry import register_criterion
from .label_smoothed_ce import ce_loss_from_logits


@register_criterion("cross_entropy")
def make_cross_entropy(cfg: dict):
    sentence_avg = bool(cfg.get("sentence_avg", False))
    ignore_index = int(cfg.get("padding_idx", 1))

    def criterion(model, params, batch, rngs=None, num_updates=None, train=True):
        if "net_tokens" in batch:
            # decoder-only LM batch (reference cross_entropy consumes any
            # net_input; the LM task emits net_tokens -> next-token target)
            logits = model.apply(
                params, batch["net_tokens"], deterministic=not train, rngs=rngs
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
        loss, nll = ce_loss_from_logits(logits, batch["target"], 0.0, ignore_index)
        ntokens = batch["ntokens"]
        nsentences = batch["target"].shape[0]
        sample_size = nsentences if sentence_avg else ntokens
        return loss, sample_size, {
            "loss": loss,
            "nll_loss": nll,
            "ntokens": ntokens,
            "nsentences": nsentences,
            "sample_size": sample_size,
        }

    return criterion
