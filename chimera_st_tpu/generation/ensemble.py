"""Ensemble decoding with optional LM shallow fusion.

reference: fairseq/sequence_generator.py:770-905 EnsembleModel (probability
averaging across models) and fairseq_cli/generate.py:112-128 (--lm-path
shallow fusion: lprobs += lm_weight * lm_lprobs).

Composes through the generator's step_fn contract: each model keeps its own
KV caches (one pytree, beam-gathered together); per step the ensemble emits
log(mean(prob_i)) + lm_weight * lm_lprobs.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.interlingua import ChimeraInterlinguaModel
from .beam_search import beam_search
from .generator import GeneratorSettings


class EnsembleSequenceGenerator:
    def __init__(
        self,
        models: List,  # flax modules with .decoder + encode_audio/encode_text
        params_list: List,
        settings: GeneratorSettings,
        pad: int = 1,
        eos: int = 2,
        unk: int = 3,
        lm: Optional[Tuple] = None,  # (lm_model, lm_params, weight)
    ):
        assert len(models) == len(params_list) >= 1
        if getattr(settings, "kv_cache_int8", False):
            # loud rejection over silent ignore (repo convention): the
            # ensemble cache allocation below is bf16-only
            raise NotImplementedError(
                "--kv-cache-int8 is a single-model decode feature; ensemble "
                "decoding allocates full-precision caches"
            )
        self.models = models
        self.params_list = params_list
        self.s = settings
        self.pad, self.eos, self.unk = pad, eos, unk
        self.lm = lm
        self._jit_generate = jax.jit(
            self._generate_from_encoders, static_argnames=("beam_size",)
        )

    def encode_audio(self, source, padding_mask):
        outs = []
        for model, params in zip(self.models, self.params_list):
            enc, mask = model.apply(
                params, source, padding_mask,
                method=type(model).encode_audio,
            )
            outs.append((enc, mask))
        return outs

    def encode_text(self, src_tokens):
        """Text-task ensembles (reference: fairseq_cli/generate.py:103-128 —
        MT ensembles over checkpoint-averaged models)."""
        outs = []
        for model, params in zip(self.models, self.params_list):
            enc, mask = model.apply(
                params, src_tokens, method=type(model).encode_text
            )
            outs.append((enc, mask))
        return outs

    def _generate_from_encoders(self, encoder_outs, max_lens, beam_size: int,
                                min_lens=None):
        B = encoder_outs[0][0].shape[0]
        K = beam_size
        max_len = self.s.max_decode_len

        per_model = []
        for model, params, (enc, enc_mask) in zip(
            self.models, self.params_list, encoder_outs
        ):
            enc_kv = model.apply(
                params, enc, method=lambda m, e: m.decoder.precompute_encoder_kv(e)
            )
            enc_kv = jax.tree_util.tree_map(lambda x: jnp.repeat(x, K, axis=0), enc_kv)
            mask = None if enc_mask is None else jnp.repeat(enc_mask, K, axis=0)
            c = model.cfg
            hd = c.decoder_embed_dim // c.decoder_heads
            # time-major, beam-minor cache (see layers.py cached branch)
            caches = [
                {"k": jnp.zeros((max_len + 1, c.decoder_heads, hd, B * K), model.dtype),
                 "v": jnp.zeros((max_len + 1, c.decoder_heads, hd, B * K), model.dtype)}
                for _ in range(c.decoder_layers)
            ]
            per_model.append((model, params, enc_kv, mask, caches))

        lm_caches = None
        if self.lm is not None:
            lm_model, lm_params, lm_weight = self.lm
            lc = lm_model.cfg
            hd = lc.embed_dim // lc.heads
            lm_caches = [
                {"k": jnp.zeros((max_len + 1, lc.heads, hd, B * K), lm_model.dtype),
                 "v": jnp.zeros((max_len + 1, lc.heads, hd, B * K), lm_model.dtype)}
                for _ in range(lc.layers)
            ]

        init_caches = {
            "models": [pm[4] for pm in per_model],
            "lm": lm_caches,
        }

        n = len(self.models)

        def step_fn(tokens_t, index, caches):
            lps = []
            new_model_caches = []
            for (model, params, enc_kv, mask, _), cache in zip(
                per_model, caches["models"]
            ):
                logits, new_cache = model.apply(
                    params, tokens_t, index, cache, enc_kv, mask,
                    method=lambda m, t, i, c, ekv, em: m.decoder.step(t, i, c, ekv, em),
                )
                if self.s.temperature != 1.0:  # was silently ignored here
                    logits = logits / self.s.temperature
                lps.append(jax.nn.log_softmax(logits.astype(jnp.float32), -1))
                new_model_caches.append(new_cache)
            if n == 1:
                avg = lps[0]
            else:
                # log(mean(p_i)) — the reference's probability-space average
                avg = jax.nn.logsumexp(jnp.stack(lps), axis=0) - jnp.log(float(n))

            new_lm_caches = None
            if self.lm is not None:
                lm_model, lm_params, lm_weight = self.lm
                lm_logits, new_lm_caches = lm_model.apply(
                    lm_params, tokens_t, index, caches["lm"], None, None,
                    method=lambda m, t, i, c, ekv, em: m.decoder.step(t, i, c, ekv, em),
                )
                avg = avg + lm_weight * jax.nn.log_softmax(
                    lm_logits.astype(jnp.float32), -1
                )
            return avg, {"models": new_model_caches, "lm": new_lm_caches}

        return beam_search(
            step_fn,
            init_caches,
            batch_size=B,
            beam_size=K,
            max_len=max_len,
            eos=self.eos,
            pad=self.pad,
            min_len=self.s.min_len,
            len_penalty=self.s.len_penalty,
            unk=self.unk,
            unk_penalty=self.s.unk_penalty,
            max_lens=max_lens,
            min_lens=min_lens,
            no_repeat_ngram_size=self.s.no_repeat_ngram_size,
            beam_minor_caches=True,  # [L, H, D, B*K] time-major caches
        )

    def _max_lens(self, src_lengths):
        # shared with SequenceGenerator so the length convention cannot
        # drift between the single-model and ensemble paths (review fix:
        # the formula was duplicated verbatim here)
        if src_lengths is None:
            return None
        from .generator import max_lens_from_settings

        return max_lens_from_settings(self.s, src_lengths)

    def _min_lens(self, src_lengths):
        """Per-sentence minimums (--min-len-a/b, --match-source-len) — the
        single-model generator honored these but the ensemble path silently
        dropped them (review fix)."""
        if src_lengths is None:
            return None
        from .generator import min_lens_from_settings

        return min_lens_from_settings(self.s, src_lengths)

    def generate_audio(self, source, padding_mask, src_lengths=None):
        encoder_outs = self.encode_audio(source, padding_mask)
        return self._jit_generate(
            encoder_outs, self._max_lens(src_lengths),
            beam_size=self.s.beam_size, min_lens=self._min_lens(src_lengths),
        )

    def generate_text(self, src_tokens, src_lengths=None):
        encoder_outs = self.encode_text(src_tokens)
        return self._jit_generate(
            encoder_outs, self._max_lens(src_lengths),
            beam_size=self.s.beam_size, min_lens=self._min_lens(src_lengths),
        )
