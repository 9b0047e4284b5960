"""Sequence generator: encoder once, jit beam-decode loop.

Replaces the reference SequenceGenerator/EnsembleModel stack
(reference: fairseq/sequence_generator.py:18-905). The split into
`encode` + `generate_from_encoder` mirrors the reference's
ControlledSequenceGenerator contract (_get_encoder_outs /
_generate_from_encoder_outs, reference: controlled_sequence_generator.py:14-423)
so callers can intercept/modify encoder outputs before decoding.

Encoder K/V for cross-attention is projected once per sentence and expanded
across beams OUTSIDE the decode loop (beams of one sentence share it, so beam
reorder never touches it — only the self-attention caches are gathered).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.interlingua import ChimeraInterlinguaModel
from .beam_search import beam_search


@dataclass
class GeneratorSettings:
    beam_size: int = 5
    max_len_a: float = 0.0
    max_len_b: int = 200
    min_len: int = 1
    # per-sentence length constraints from source-length ratios
    # (reference: search.py:526 LengthConstrainedBeamSearch — min/max =
    # a * src_len + b per sentence); enabled when min_len_a/b set
    min_len_a: float = 0.0
    min_len_b: int = 0
    len_penalty: float = 1.0
    unk_penalty: float = 0.0
    max_decode_len: int = 256  # static bound for the compiled loop
    temperature: float = 1.0
    no_repeat_ngram_size: int = 0
    diverse_beam_groups: int = 0
    diverse_beam_strength: float = 0.5
    # diverse siblings (reference: search.py:745, --diversity-rate)
    diversity_rate: float = -1.0
    # sampling mode (reference: --sampling --sampling-topk/--sampling-topp);
    # `seed` varies the sample stream across runs (reference --seed)
    sampling: bool = False
    seed: int = 1
    sampling_topk: int = -1
    sampling_topp: float = -1.0
    # KV caches grow in segments of this many positions (0 = preallocate
    # max_decode_len); cuts reorder/attention traffic for short hypotheses
    cache_segment: int = 16
    # lazy beam reorder: caches are never physically permuted; a [L, B*K]
    # ancestry map is permuted instead and the reorder is folded into the
    # attention read (see MultiheadAttention cache_ancestry). Removes the
    # O((B*K)^2) per-step gather matmul that made decode scale superlinearly
    # with batch (measured 326->745 ms decode from B=64->128 under eager).
    lazy_beam_reorder: bool = True
    # int8 KV cache: store decode self-attention K/V quantized (symmetric
    # per-row int8 + f32 scales) — halves the per-step cache HBM read.
    # Lazy-reorder path only; ignored for sampling / the Pallas decode cache.
    kv_cache_int8: bool = False
    # keep dropout ACTIVE through encode + the jitted decode loop
    # (--retain-dropout, reference sequence_generator.py retain_dropout):
    # seed-reproducible MC-sampled hypotheses; per-step keys are folded from
    # `seed` and the while_loop index inside the compiled program
    retain_dropout: bool = False


def max_lens_from_settings(s: "GeneratorSettings", src_lengths):
    """Per-sentence max REAL-token budgets: a*src_len + b, clamped to the
    decode buffer minus the eos slot (reference: sequence_generator.py:226-230
    min(a*src+b, max_positions - 1)). Shared by the single-model and
    ensemble generators so the length convention cannot drift between them."""
    ml = (s.max_len_a * src_lengths + s.max_len_b).astype(jnp.int32)
    return jnp.minimum(ml, s.max_decode_len - 1)


def min_lens_from_settings(s: "GeneratorSettings", src_lengths):
    """Per-sentence minimums (reference: search.py:526
    LengthConstrainedBeamSearch min_len_a/b); None when disabled."""
    if s.min_len_a == 0.0 and s.min_len_b == 0:
        return None
    ml = (s.min_len_a * src_lengths + s.min_len_b).astype(jnp.int32)
    return jnp.minimum(ml, s.max_decode_len - 1)


class SequenceGenerator:
    # --prefix-size plumbing marker: the generate CLI forces reference
    # hypotheses' first tokens only through generators that implement it
    supports_prefix = True

    def __init__(
        self,
        model: ChimeraInterlinguaModel,
        settings: GeneratorSettings,
        pad: int = 1,
        eos: int = 2,
        unk: int = 3,
        bos: Optional[int] = None,
        strategy=None,  # SearchStrategy (constrained / diverse-siblings / ...)
    ):
        self.model = model
        self.s = settings
        self.pad, self.eos, self.unk = pad, eos, unk
        self.bos = eos if bos is None else bos
        if settings.sampling:
            # mutually exclusive search modes raise like the reference
            # (search.py 'Provided Search parameters are mutually
            # exclusive'); review fix — sampling used to win silently
            conflicts = []
            if settings.diversity_rate > 0:
                conflicts.append("--diversity-rate")
            if settings.diverse_beam_groups > 0:
                conflicts.append("--diverse-beam-groups")
            if settings.no_repeat_ngram_size > 0:
                # the jit sampling loop has no n-gram ban (beam only)
                conflicts.append("--no-repeat-ngram-size")
            if strategy is not None:
                conflicts.append(f"search strategy {type(strategy).__name__}")
            if conflicts:
                raise ValueError(
                    "--sampling is mutually exclusive with: "
                    + ", ".join(conflicts))
        if settings.diversity_rate > 0 and settings.diverse_beam_groups > 0:
            raise ValueError(
                "--diversity-rate (diverse siblings) and "
                "--diverse-beam-groups are mutually exclusive search modes")
        if strategy is None and settings.diversity_rate > 0:
            from .search_strategies import DiverseSiblingsSearch

            strategy = DiverseSiblingsSearch(settings.diversity_rate)
        self.strategy = strategy
        self._jit_generate = jax.jit(
            self._generate_from_encoder, static_argnames=("beam_size",)
        )
        self._call_count = 0
        self._jit_encode_audio = jax.jit(self._encode_audio)
        self._jit_encode_text = jax.jit(self._encode_text)

    # -------------------------------------------------------------- encode

    def _encode_audio(self, params, source, padding_mask, rng=None):
        if rng is not None:  # retain_dropout: stochastic encoder
            return self.model.apply(
                params, source, padding_mask, rngs={"dropout": rng},
                method=lambda m, s, pm: m.encode_audio(
                    s, pm, deterministic=False),
            )
        return self.model.apply(
            params, source, padding_mask, method=type(self.model).encode_audio
        )

    def _encode_text(self, params, src_tokens, rng=None):
        if rng is not None:  # retain_dropout: stochastic encoder
            return self.model.apply(
                params, src_tokens, rngs={"dropout": rng},
                method=lambda m, t: m.encode_text(t, deterministic=False),
            )
        return self.model.apply(
            params, src_tokens, method=type(self.model).encode_text
        )

    # -------------------------------------------------------------- decode

    def _generate_from_encoder(
        self,
        params,
        encoder_out: jax.Array,  # [B, S, C]
        encoder_padding_mask: Optional[jax.Array],  # [B, S] or None
        max_lens: Optional[jax.Array],  # [B] or None
        beam_size: int,
        rng: Optional[jax.Array] = None,
        min_lens: Optional[jax.Array] = None,  # [B] or None
        prefix_tokens: Optional[jax.Array] = None,  # [B, P] forced prefix
    ):
        B, S, _ = encoder_out.shape
        K = beam_size
        max_len = self.s.max_decode_len
        c = self.model.cfg

        # per-sentence encoder K/V projected once; in lazy-reorder mode it
        # stays UN-repeated [B, S, H, D] (beams share it — grouped cross-attn
        # in MultiheadAttention reads it once per sentence, not once per
        # beam); the eager path keeps the repeated layout
        lazy_mode = self.s.lazy_beam_reorder and not self.s.sampling
        enc_kv = self.model.apply(
            params,
            encoder_out,
            method=lambda m, e: m.decoder.precompute_encoder_kv(e),
        )
        if not lazy_mode:
            enc_kv = jax.tree_util.tree_map(
                lambda x: jnp.repeat(x, K, axis=0), enc_kv
            )  # [B*K, S, H, D]
        if encoder_padding_mask is None:
            enc_mask = None
        elif lazy_mode:
            enc_mask = encoder_padding_mask  # [B, S]
        else:
            enc_mask = jnp.repeat(encoder_padding_mask, K, axis=0)

        head_dim = c.decoder_embed_dim // c.decoder_heads
        # time-major cache, beam dim minor (layout rationale: layers.py
        # MultiheadAttention cached branch); segmented decode starts with the
        # first segment's length and grows between while_loops
        seg = self.s.cache_segment
        init_len = seg if (seg and seg < max_len and not self.s.sampling) else max_len + 1
        import os as _os

        pallas_decode = (
            lazy_mode and _os.environ.get("CHIMERA_PALLAS_DECODE", "0") == "1"
        )
        if pallas_decode:
            # fused decode-step attention kernel: per-sentence column-major
            # cache [B, H, K, L, D] (ops/pallas_decode_attention.py); time
            # axis is 3 (segment growth pads it)
            kv_shape = (B, c.decoder_heads, K, init_len, head_dim)
        else:
            kv_shape = (init_len, c.decoder_heads, head_dim, B * K)
        int8_kv = self.s.kv_cache_int8 and lazy_mode and not pallas_decode
        if self.s.kv_cache_int8 and not int8_kv:
            # loud rejection over silent ignore (repo convention, same as
            # the ensemble decode): the int8 dequant is implemented in the
            # lazy-reorder cached-attention branch only
            blocker = ("--sampling" if self.s.sampling
                       else "CHIMERA_PALLAS_DECODE=1" if pallas_decode
                       else "lazy_beam_reorder=False")
            raise NotImplementedError(
                f"--kv-cache-int8 is only supported on the default "
                f"lazy-reorder beam decode path; incompatible with {blocker}")
        kv_dtype = jnp.int8 if int8_kv else self.model.dtype
        layer_caches = [
            {
                "k": jnp.zeros(kv_shape, kv_dtype),
                "v": jnp.zeros(kv_shape, kv_dtype),
                # unwritten positions keep scale 0 -> logits 0, masked off by
                # the `future` mask in MultiheadAttention anyway
                **(
                    {
                        "k_scale": jnp.zeros((init_len, B * K), jnp.float32),
                        "v_scale": jnp.zeros((init_len, B * K), jnp.float32),
                    }
                    if int8_kv
                    else {}
                ),
            }
            for _ in range(c.decoder_layers)
        ]
        lazy = lazy_mode  # single definition (review fix: was recomputed)
        reorder_fn = None
        if lazy:
            # ancestry rows cover one position past the kv length so the
            # row-(i+1) reset never clips at a segment boundary
            iota_cols = jnp.tile(
                jnp.arange(K, dtype=jnp.int32), (B,)
            )  # within-sentence column ids
            init_caches = {
                "kv": layer_caches,
                "anc": jnp.tile(iota_cols[None, :], (init_len + 1, 1)),
            }

            def reorder_fn(caches, picked_beam, i):
                flat_src = (
                    jnp.arange(B, dtype=picked_beam.dtype)[:, None] * K
                    + picked_beam
                ).reshape(-1)
                anc = jnp.take(caches["anc"], flat_src, axis=1)
                anc = jax.lax.dynamic_update_slice_in_dim(
                    anc, iota_cols[None, :], i + 1, axis=0
                )
                return {"kv": caches["kv"], "anc": anc}

        else:
            init_caches = layer_caches

        retain_dropout = self.s.retain_dropout
        if retain_dropout and rng is None:
            raise ValueError("retain_dropout decode requires an rng")

        def step_fn(tokens_t, index, caches):
            if lazy:
                kv = caches["kv"]
                k0 = kv[0]["k"]
                t_len = k0.shape[3] if k0.ndim == 5 else k0.shape[0]
                anc_view = caches["anc"][:t_len]
            else:
                kv, anc_view = caches, None
            # retain_dropout: a fresh per-step dropout key folded from the
            # loop index INSIDE the compiled program (seed-reproducible)
            rngs = (
                {"dropout": jax.random.fold_in(rng, 1_000_000 + index)}
                if retain_dropout else None
            )
            logits, new_kv = self.model.apply(
                params,
                tokens_t,
                index,
                kv,
                enc_kv,
                enc_mask,
                rngs=rngs,
                method=lambda m, t, i, c, ekv, em: m.decoder.step(
                    t, i, c, ekv, em,
                    cache_ancestry=anc_view,
                    ancestry_groups=K if lazy else 1,
                    deterministic=not retain_dropout,
                ),
            )
            if self.s.temperature != 1.0:
                logits = logits / self.s.temperature
            logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            new_caches = {"kv": new_kv, "anc": caches["anc"]} if lazy else new_kv
            return logprobs, new_caches

        if self.s.sampling:
            from .sampling import sample_decode

            if prefix_tokens is not None:
                raise NotImplementedError(
                    "--prefix-size with --sampling is not supported here "
                    "(prefix forcing is a beam-decode feature)")
            return sample_decode(
                step_fn,
                init_caches,
                batch_size=B,
                num_samples=K,
                max_len=max_len,
                eos=self.eos,
                pad=self.pad,
                rng=rng if rng is not None else jax.random.PRNGKey(0),
                bos=self.bos,
                top_k=max(self.s.sampling_topk, 0),
                top_p=max(self.s.sampling_topp, 0.0),
                min_len=self.s.min_len,
                max_lens=max_lens,
                min_lens=min_lens,
                len_penalty=self.s.len_penalty,
                unk=self.unk,
                unk_penalty=self.s.unk_penalty,
            )
        return beam_search(
            step_fn,
            init_caches,
            batch_size=B,
            beam_size=K,
            max_len=max_len,
            eos=self.eos,
            pad=self.pad,
            bos=self.bos,
            min_len=self.s.min_len,
            len_penalty=self.s.len_penalty,
            unk=self.unk,
            unk_penalty=self.s.unk_penalty,
            max_lens=max_lens,
            min_lens=min_lens,
            no_repeat_ngram_size=self.s.no_repeat_ngram_size,
            diverse_beam_groups=self.s.diverse_beam_groups,
            diverse_beam_strength=self.s.diverse_beam_strength,
            strategy=self.strategy,
            cache_segment=self.s.cache_segment,
            beam_minor_caches=True,  # [L, H, D, B*K] time-major caches
            reorder_fn=reorder_fn,
            prefix_tokens=prefix_tokens,
        )

    # ----------------------------------------------------------- public API

    def max_lens_for_src(self, src_lengths: jax.Array) -> jax.Array:
        return max_lens_from_settings(self.s, src_lengths)

    def min_lens_for_src(self, src_lengths: jax.Array) -> Optional[jax.Array]:
        return min_lens_from_settings(self.s, src_lengths)

    def generate_audio(
        self,
        params,
        source: jax.Array,  # [B, T] waveform
        padding_mask: jax.Array,
        src_lengths: Optional[jax.Array] = None,
        prefix_tokens: Optional[jax.Array] = None,
    ):
        self._call_count += 1
        rng = (
            jax.random.fold_in(jax.random.PRNGKey(self.s.seed), self._call_count)
            if self.s.sampling or self.s.retain_dropout else None
        )
        enc, enc_mask = self._jit_encode_audio(
            params, source, padding_mask,
            jax.random.fold_in(rng, 7) if self.s.retain_dropout else None,
        )
        max_lens = (
            self.max_lens_for_src(src_lengths) if src_lengths is not None else None
        )
        min_lens = (
            self.min_lens_for_src(src_lengths) if src_lengths is not None else None
        )
        return self._jit_generate(
            params, enc, enc_mask, max_lens, beam_size=self.s.beam_size, rng=rng,
            min_lens=min_lens, prefix_tokens=prefix_tokens,
        )

    def generate_text(
        self,
        params,
        src_tokens: jax.Array,
        src_lengths: Optional[jax.Array] = None,
        prefix_tokens: Optional[jax.Array] = None,
    ):
        self._call_count += 1
        rng = (
            jax.random.fold_in(jax.random.PRNGKey(self.s.seed), self._call_count)
            if self.s.sampling or self.s.retain_dropout else None
        )
        enc, enc_mask = self._jit_encode_text(
            params, src_tokens,
            jax.random.fold_in(rng, 7) if self.s.retain_dropout else None,
        )
        max_lens = (
            self.max_lens_for_src(src_lengths) if src_lengths is not None else None
        )
        min_lens = (
            self.min_lens_for_src(src_lengths) if src_lengths is not None else None
        )
        return self._jit_generate(
            params, enc, enc_mask, max_lens, beam_size=self.s.beam_size, rng=rng,
            min_lens=min_lens, prefix_tokens=prefix_tokens,
        )

    @staticmethod
    def to_hypotheses(
        tokens, scores, lens, nbest: int = 1
    ) -> List[List[Dict[str, Any]]]:
        """Host-side: [B, K, L] arrays -> fairseq-style hypo dicts."""
        tokens, scores, lens = map(np.asarray, (tokens, scores, lens))
        out = []
        for b in range(tokens.shape[0]):
            hyps = []
            for k in range(min(nbest, tokens.shape[1])):
                L = int(lens[b, k])
                hyps.append(
                    {
                        "tokens": tokens[b, k, :L],
                        "score": float(scores[b, k]),
                    }
                )
            out.append(hyps)
        return out
