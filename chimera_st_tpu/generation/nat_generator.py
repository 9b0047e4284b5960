"""Unified generate-CLI adapter for the non-autoregressive model families
(reference: fairseq/iterative_refinement_generator.py, which dispatches on
the model's initialize_output_tokens/forward_decoder surface).

Each NAT family here exposes a jit-friendly whole-decode method instead of
the reference's per-step generator protocol:

- ``refine``        Levenshtein / Insertion (models/nat_levenshtein.py:152,
                    models/nat_insertion.py:110)
- ``mask_predict``  CMLM (models/nat_cmlm.py:88)
- ``translate``     vanilla / iterative NAT / NAT-CRF (models/nat_vanilla.py:202)

``build_nat_generator`` returns a ``generate_text`` adapter matching the
beam generator's (tokens [B, K, L], scores [B, K], lens [B, K]) contract,
or None if the model isn't a NAT family.

Extras beyond the plain decode:

- ``--retain-iter-history`` (reference retain_history): the adapter records
  each refinement round's canvas; the CLI prints them as ``E-{id}_{step}``
  lines (reference fairseq_cli/generate.py:331-344). Exposed as
  ``adapter.last_history`` ([iters, B, L] numpy) + ``adapter.last_steps``
  ([B], the reference's per-hypo "steps" printed as ``I-{id}`` under
  --print-step).
- ``--iter-decode-with-external-reranker`` (reference
  iterative_refinement_generator.py:113-120,313-359 rerank): the last --path
  checkpoint is an autoregressive seq2seq model; every length-beam candidate
  is teacher-force scored with it (mean token log-prob, position 0 replaced
  by eos exactly like the reference's rebuild_batch) and the best candidate
  per sentence wins instead of the NAT model's own confidence ranking.
"""

from __future__ import annotations

from typing import Optional, Tuple


def _rerank_settings(gen_cfg):
    retain_history = bool(getattr(gen_cfg, "retain_iter_history", False))
    print_step = bool(getattr(gen_cfg, "print_step", False))
    reranking = bool(
        getattr(gen_cfg, "iter_decode_with_external_reranker", False))
    return retain_history, print_step, reranking


def build_nat_generator(model, gen_cfg, tgt_dict, bos: Optional[int] = None,
                        unk: Optional[int] = None,
                        reranker: Optional[Tuple] = None):
    """``reranker`` is an optional (ar_model, ar_params) pair — required when
    gen_cfg.iter_decode_with_external_reranker is set (the CLI passes the
    last --path model, mirroring the reference's "last checkpoint is the
    reranker" convention)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    cls = type(model)
    max_len = min(getattr(gen_cfg, "max_decode_len", 64) or 64, 256)
    pad, eos = tgt_dict.pad(), tgt_dict.eos()
    bos = tgt_dict.bos() if bos is None else bos
    unk = tgt_dict.unk() if unk is None else unk
    req_iters = getattr(gen_cfg, "iter_decode_max_iter", None)
    eos_penalty = float(getattr(gen_cfg, "iter_decode_eos_penalty", 0.0) or 0.0)
    force = bool(getattr(gen_cfg, "iter_decode_force_max_iter", False))
    length_beam = int(getattr(gen_cfg, "iter_decode_with_beam", 1) or 1)
    retain_history, print_step, reranking = _rerank_settings(gen_cfg)
    # --print-step needs per-sentence step counts. On a single canvas they
    # ride the history-recording decode; length-beam decodes have no early
    # exit, so every sentence runs the full schedule and the count is the
    # constant `iterations` (no history variant needed — keeps --print-step
    # valid alongside --iter-decode-with-beam/--iter-decode-with-external-
    # reranker like the reference).
    record_history = retain_history or (print_step and length_beam <= 1)

    is_nat = any(hasattr(cls, m) for m in ("refine", "mask_predict",
                                           "translate"))
    if not is_nat:
        if reranking:
            raise NotImplementedError(
                "--iter-decode-with-external-reranker only applies to NAT "
                "models (the reference's IterativeRefinementGenerator)")
        return None
    if reranking:
        # mirrors the reference's asserts (generator requires beam > 1 and
        # a trailing reranker checkpoint)
        if reranker is None:
            raise ValueError(
                "--iter-decode-with-external-reranker needs at least two "
                "--path checkpoints; the last one is the AR reranker")
        if length_beam <= 1:
            raise ValueError(
                "--iter-decode-with-external-reranker requires "
                "--iter-decode-with-beam > 1 (reranking needs multiple "
                "candidates per sentence)")
    if retain_history and length_beam > 1:
        raise NotImplementedError(
            "--retain-iter-history with --iter-decode-with-beam is not "
            "supported here (history is recorded for the single-canvas "
            "refinement)")

    _run_history = None  # set per family when step/history recording is viable

    if hasattr(cls, "refine"):
        iterations = req_iters if req_iters is not None else (
            8 if "Insertion" in cls.__name__ else 6
        )
        extra = dict(force_iterations=force)
        if "Levenshtein" in cls.__name__:
            # only the LevT refine has the placeholder stage the penalty
            # acts on (reference forward_decoder)
            extra["eos_penalty"] = eos_penalty
        elif eos_penalty:
            raise NotImplementedError(
                "--iter-decode-eos-penalty only applies to "
                "levenshtein_transformer (its placeholder-insertion stage)")
        if length_beam > 1:
            # the reference asserts model.allow_length_beam; refine-family
            # canvases have no length head to beam over
            raise NotImplementedError(
                f"--iter-decode-with-beam is not supported for "
                f"{cls.__name__}; length-beam needs a length-prediction "
                f"head (vanilla/iterative NAT, NAT-CRF, CMLM)")

        @jax.jit
        def _run(params, src_tokens):
            tokens, lengths = model.apply(
                params, src_tokens, iterations=iterations, max_len=max_len,
                pad=pad, bos=bos, eos=eos, unk=unk, method=cls.refine, **extra,
            )
            return tokens[:, 1:], jnp.maximum(lengths - 1, 1)  # drop bos

        if record_history:
            @jax.jit
            def _run_history(params, src_tokens):
                tokens, lengths, hist, steps = model.apply(
                    params, src_tokens, iterations=iterations,
                    max_len=max_len, pad=pad, bos=bos, eos=eos, unk=unk,
                    method=cls.refine, return_history=True, **extra,
                )
                return (tokens[:, 1:], jnp.maximum(lengths - 1, 1),
                        hist[:, :, 1:], steps)

    elif hasattr(cls, "mask_predict"):
        iterations = req_iters if req_iters is not None else 10

        if length_beam > 1 and not hasattr(cls, "mask_predict_with_length_beam"):
            # symmetric with the translate family's guard (review fix: a
            # model without the beam method silently decoded a single
            # canvas, and with reranking died on an unbound closure)
            raise NotImplementedError(
                f"--iter-decode-with-beam is not supported for {cls.__name__}")
        if length_beam > 1:
            @jax.jit
            def _run(params, src_tokens):
                return model.apply(
                    params, src_tokens, beam=length_beam,
                    iterations=iterations, max_len=max_len, pad=pad, eos=eos,
                    method=cls.mask_predict_with_length_beam,
                )

            @jax.jit
            def _candidates(params, src_tokens):
                return model.apply(
                    params, src_tokens, beam=length_beam,
                    iterations=iterations, max_len=max_len, pad=pad, eos=eos,
                    return_candidates=True,
                    method=cls.mask_predict_with_length_beam,
                )
        else:
            @jax.jit
            def _run(params, src_tokens):
                return model.apply(
                    params, src_tokens, iterations=iterations, max_len=max_len,
                    pad=pad, eos=eos, method=cls.mask_predict,
                )

            if record_history:
                @jax.jit
                def _run_history(params, src_tokens):
                    tokens, lengths, hist = model.apply(
                        params, src_tokens, iterations=iterations,
                        max_len=max_len, pad=pad, eos=eos,
                        return_history=True, method=cls.mask_predict,
                    )
                    # mask-predict has no early exit: every sentence runs
                    # the full schedule
                    steps = jnp.full(tokens.shape[:1], iterations, jnp.int32)
                    return tokens, lengths, hist, steps

    elif hasattr(cls, "translate"):
        iterations = req_iters if req_iters is not None else 1

        if length_beam > 1 and not hasattr(cls, "translate_with_length_beam"):
            raise NotImplementedError(
                f"--iter-decode-with-beam is not supported for {cls.__name__}")
        if length_beam > 1:
            # --iter-decode-with-beam B: decode top-B lengths, keep the best
            # (reference iterative_refinement_generator.py:138-158)
            @jax.jit
            def _run(params, src_tokens):
                tokens, lengths = model.apply(
                    params, src_tokens, beam=length_beam, max_len=max_len,
                    iterations=iterations,
                    method=cls.translate_with_length_beam,
                )
                return tokens[:, 1:], jnp.maximum(lengths - 1, 1)

            @jax.jit
            def _candidates(params, src_tokens):
                tokens, lengths, score = model.apply(
                    params, src_tokens, beam=length_beam, max_len=max_len,
                    iterations=iterations, return_candidates=True,
                    method=cls.translate_with_length_beam,
                )
                return tokens[:, 1:], jnp.maximum(lengths - 1, 1), score
        else:
            @jax.jit
            def _run(params, src_tokens):
                tokens, lengths = model.apply(
                    params, src_tokens, max_len=max_len, iterations=iterations,
                    method=cls.translate,
                )
                return tokens[:, 1:], jnp.maximum(lengths - 1, 1)  # drop bos

            if record_history:
                @jax.jit
                def _run_history(params, src_tokens):
                    tokens, lengths, hist = model.apply(
                        params, src_tokens, max_len=max_len,
                        iterations=iterations, return_history=True,
                        method=cls.translate,
                    )
                    steps = jnp.full(tokens.shape[:1], iterations, jnp.int32)
                    return (tokens[:, 1:], jnp.maximum(lengths - 1, 1),
                            hist[:, :, 1:], steps)

    else:
        return None

    if record_history and _run_history is None:
        raise NotImplementedError(
            f"--retain-iter-history is not supported for {cls.__name__} "
            "with these settings")

    _rerank = None
    if reranking:
        rr_model, rr_params = reranker
        rr_cls = type(rr_model)
        if not (hasattr(rr_cls, "encode") or hasattr(rr_cls, "encode_text")):
            raise ValueError(
                f"the reranker checkpoint ({rr_cls.__name__}) is not an "
                "autoregressive seq2seq model")

        @jax.jit
        def _rerank(params, src_tokens, cand_tokens):
            # teacher-forced mean log-prob of each candidate under the AR
            # model. The reference's rebuild_batch sets canvas position 0
            # (bos) to eos and scores tokens 1.. — our candidates are
            # already bos-stripped, so the equivalent is an eos-led prefix
            # over ALL candidate tokens, masked to non-pad and
            # mean-normalized (iterative_refinement_generator.py:326-356).
            beam_rep = cand_tokens.shape[0] // src_tokens.shape[0]
            src_rep = jnp.repeat(src_tokens, beam_rep, axis=0)
            led = jnp.concatenate(
                [jnp.full((cand_tokens.shape[0], 1), eos, cand_tokens.dtype),
                 cand_tokens], axis=1,
            )
            logits = rr_model.apply(params, src_rep, led[:, :-1])
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            tok_lp = jnp.take_along_axis(
                lp, cand_tokens[..., None], axis=-1)[..., 0]
            mask = cand_tokens != pad
            denom = jnp.maximum(jnp.sum(mask, axis=1), 1)
            return jnp.sum(jnp.where(mask, tok_lp, 0.0), axis=1) / denom

    class NATGenerator:
        """K=1 'beam' adapter over a whole-sequence refinement decode.

        ``last_history``/``last_steps`` (numpy, None unless
        --retain-iter-history) carry the most recent batch's per-round
        canvases [iters, B, L] and per-sentence finalization steps [B]."""

        last_history = None
        last_steps = None

        def generate_text(self, params, src_tokens, src_lengths=None):
            B = src_tokens.shape[0]
            if print_step and _run_history is None:
                # length-beam decodes have no early exit: every sentence runs
                # the full refinement schedule
                self.last_steps = np.full((B,), iterations, np.int32)
            if _rerank is not None:
                # candidates come back beam-minor [B*beam, L]; the NAT
                # model's own score is replaced by the AR reranker's
                cand, cand_lens, _ = _candidates(params, src_tokens)
                rr_score = _rerank(rr_params, src_tokens, cand)
                best = jnp.argmax(rr_score.reshape(B, length_beam), axis=1)
                flat = jnp.arange(B) * length_beam + best
                tokens, lens = cand[flat], cand_lens[flat]
                scores = rr_score[flat][:, None]
                return tokens[:, None, :], scores, lens[:, None]
            if _run_history is not None:
                tokens, lens, hist, steps = _run_history(params, src_tokens)
                # history is only surfaced under the explicit flag;
                # --print-step alone also rides this decode for real
                # early-exit step counts
                if retain_history:
                    self.last_history = np.asarray(hist)
                self.last_steps = np.asarray(steps)
            else:
                tokens, lens = _run(params, src_tokens)
            scores = jnp.zeros(tokens.shape[:1] + (1,), jnp.float32)
            return tokens[:, None, :], scores, lens[:, None]

    return NATGenerator()
