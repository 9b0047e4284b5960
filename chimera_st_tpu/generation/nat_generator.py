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
or None if the model isn't a NAT family."""

from __future__ import annotations

from typing import Optional


def build_nat_generator(model, gen_cfg, tgt_dict, bos: Optional[int] = None,
                        unk: Optional[int] = None):
    import jax
    import jax.numpy as jnp

    cls = type(model)
    max_len = min(getattr(gen_cfg, "max_decode_len", 64) or 64, 256)
    pad, eos = tgt_dict.pad(), tgt_dict.eos()
    bos = tgt_dict.bos() if bos is None else bos
    unk = tgt_dict.unk() if unk is None else unk
    req_iters = getattr(gen_cfg, "iter_decode_max_iter", None)
    eos_penalty = float(getattr(gen_cfg, "iter_decode_eos_penalty", 0.0) or 0.0)
    force = bool(getattr(gen_cfg, "iter_decode_force_max_iter", False))
    length_beam = int(getattr(gen_cfg, "iter_decode_with_beam", 1) or 1)

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

    elif hasattr(cls, "mask_predict"):
        iterations = req_iters if req_iters is not None else 10

        if length_beam > 1 and hasattr(cls, "mask_predict_with_length_beam"):
            @jax.jit
            def _run(params, src_tokens):
                return model.apply(
                    params, src_tokens, beam=length_beam,
                    iterations=iterations, max_len=max_len, pad=pad, eos=eos,
                    method=cls.mask_predict_with_length_beam,
                )
        else:
            @jax.jit
            def _run(params, src_tokens):
                return model.apply(
                    params, src_tokens, iterations=iterations, max_len=max_len,
                    pad=pad, eos=eos, method=cls.mask_predict,
                )

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
        else:
            @jax.jit
            def _run(params, src_tokens):
                tokens, lengths = model.apply(
                    params, src_tokens, max_len=max_len, iterations=iterations,
                    method=cls.translate,
                )
                return tokens[:, 1:], jnp.maximum(lengths - 1, 1)  # drop bos

    else:
        return None

    class NATGenerator:
        """K=1 'beam' adapter over a whole-sequence refinement decode."""

        def generate_text(self, params, src_tokens, src_lengths=None):
            tokens, lens = _run(params, src_tokens)
            scores = jnp.zeros(tokens.shape[:1] + (1,), jnp.float32)
            return tokens[:, None, :], scores, lens[:, None]

    return NATGenerator()
