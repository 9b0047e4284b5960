"""Ensemble refinement decode for the Levenshtein NAT family.

Reference: fairseq/models/nat/nonautoregressive_ensembles.py — ``EnsembleLevT``
averages member probabilities *per pipeline stage* (deletion, placeholder
insertion, word fill) because each stage's input depends on the previous
stage's ensembled decision; ``BasicEnsembleModel`` raises NotImplementedError
for every other NAT family, and we keep that surface.

TPU-native shape: the members share one flax module (the reference likewise
requires every member to be a LevenshteinTransformerModel), so an ensemble is
just a tuple of parameter trees pushed through the same apply functions. The
per-stage average is a logsumexp over stacked member log-softmaxes — computed
inside the single traced ``lax.while_loop`` refinement program, so an N-member
ensemble is one XLA program with N-fold head evaluations, not N dispatches.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models.nat_levenshtein import (
    LevenshteinTransformer,
    apply_del_words,
    apply_ins_placeholders,
)


def ensemble_refine(
    model: LevenshteinTransformer,
    params_list: Sequence,
    src_tokens: jax.Array,
    iterations: int = 6,
    max_len: int = 64,
    pad: int = 1,
    bos: int = 0,
    eos: int = 2,
    unk: int = 3,
    eos_penalty: float = 0.0,
    force_iterations: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Iterative refinement with per-stage probability averaging.

    Mirrors ``LevenshteinTransformer.refine`` (models/nat_levenshtein.py:152)
    with each head's log-probs replaced by the ensemble average
    (reference EnsembleLevT.forward_decoder: deletion -> placeholder ->
    word-insertion, averaging ``logsumexp(stack(log_probs)) - log(n)`` at
    every stage before the argmax).
    """
    cls = type(model)
    n = len(params_list)
    encs = [model.apply(p, src_tokens, method=cls.encode) for p in params_list]

    def avg_logprobs(method, tokens):
        lps = [
            jax.nn.log_softmax(
                model.apply(p, tokens, enc, enc_mask, method=method), axis=-1
            )
            for p, (enc, enc_mask) in zip(params_list, encs)
        ]
        if n == 1:
            return lps[0]
        return jax.scipy.special.logsumexp(jnp.stack(lps), axis=0) - jnp.log(
            jnp.asarray(n, jnp.float32)
        )

    B = src_tokens.shape[0]
    L = max_len
    init_tokens = jnp.full((B, L), pad, jnp.int32)
    init_tokens = init_tokens.at[:, 0].set(bos).at[:, 1].set(eos)

    def one_round(tokens):
        del_lp = avg_logprobs(cls.forward_word_del, tokens)
        del_pred = jnp.argmax(del_lp, axis=-1) == 1
        tokens = apply_del_words(tokens, del_pred, pad, bos, eos)
        ins_lp = avg_logprobs(cls.forward_mask_ins, tokens)
        if eos_penalty > 0.0:
            # reference EnsembleLevT applies the penalty to the AVERAGED
            # scores (nonautoregressive_ensembles.py forward_decoder)
            ins_lp = ins_lp.at[..., 0].add(-eos_penalty)
        n_ins = jnp.argmax(ins_lp, axis=-1)
        tokens = apply_ins_placeholders(tokens, n_ins, pad, unk, eos)
        word_lp = avg_logprobs(cls.forward_word_ins, tokens)
        pred = jnp.argmax(word_lp, axis=-1).astype(jnp.int32)
        return jnp.where(tokens == unk, pred, tokens)

    def cond(state):
        i, _, changed = state
        if force_iterations:
            return i < iterations
        return (i < iterations) & changed

    def body(state):
        i, tokens, _ = state
        new = one_round(tokens)
        return i + 1, new, jnp.any(new != tokens)

    _, tokens, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), init_tokens, jnp.asarray(True))
    )
    lengths = jnp.sum(tokens != pad, axis=1)
    return tokens, lengths


def build_nat_ensemble_generator(models, params_list, gen_cfg, tgt_dict):
    """Ensemble counterpart of ``build_nat_generator`` for the generate CLI.

    Returns a K=1 generator over ``ensemble_refine``, or None when the lead
    model is not a NAT family. Non-Levenshtein NAT ensembles raise, matching
    the reference's BasicEnsembleModel.forward_decoder NotImplementedError.
    """
    model = models[0]
    cls = type(model)
    is_nat = any(
        hasattr(cls, m) for m in ("refine", "mask_predict", "translate")
    )
    if not is_nat:
        return None
    if not isinstance(model, LevenshteinTransformer):
        raise NotImplementedError(
            "ensemble decoding is only supported for levenshtein_transformer "
            "among the NAT families (reference: nonautoregressive_ensembles.py)"
        )
    if not all(isinstance(m, LevenshteinTransformer) for m in models):
        raise NotImplementedError("all ensemble members must be Levenshtein models")
    if getattr(gen_cfg, "retain_iter_history", False) \
            or getattr(gen_cfg, "print_step", False):
        raise NotImplementedError(
            "--retain-iter-history/--print-step are not supported for NAT "
            "ensemble decoding; use a single checkpoint")

    max_len = min(getattr(gen_cfg, "max_decode_len", 64) or 64, 256)
    req_iters = getattr(gen_cfg, "iter_decode_max_iter", None)
    iterations = req_iters if req_iters is not None else 6
    eos_penalty = float(getattr(gen_cfg, "iter_decode_eos_penalty", 0.0) or 0.0)
    force = bool(getattr(gen_cfg, "iter_decode_force_max_iter", False))
    pad, eos = tgt_dict.pad(), tgt_dict.eos()
    bos, unk = tgt_dict.bos(), tgt_dict.unk()

    @jax.jit
    def _run(ps, src_tokens):
        tokens, lengths = ensemble_refine(
            model, ps, src_tokens, iterations=iterations, max_len=max_len,
            pad=pad, bos=bos, eos=eos, unk=unk,
            eos_penalty=eos_penalty, force_iterations=force,
        )
        return tokens[:, 1:], jnp.maximum(lengths - 1, 1)  # drop bos

    ps = tuple(params_list)

    class NATEnsembleGenerator:
        def generate_text(self, _params, src_tokens, src_lengths=None):
            tokens, lens = _run(ps, src_tokens)
            scores = jnp.zeros(tokens.shape[:1] + (1,), jnp.float32)
            return tokens[:, None, :], scores, lens[:, None]

    return NATEnsembleGenerator()
