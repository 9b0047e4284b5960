"""Sampling-based decoding (reference: fairseq/search.py:621-744 Sampling —
top-k / top-p (nucleus) filtering, temperature), jit-compiled like the beam
path: K independent samples per sentence via a lax.while_loop."""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e7


def _filter_topk(logprobs: jax.Array, k: int) -> jax.Array:
    if k <= 0:
        return logprobs
    kth = jax.lax.top_k(logprobs, k)[0][..., -1:]
    return jnp.where(logprobs < kth, NEG_INF, logprobs)


def _filter_topp(logprobs: jax.Array, p: float) -> jax.Array:
    if p <= 0 or p >= 1:
        return logprobs
    sorted_lp = jnp.sort(logprobs, axis=-1)[..., ::-1]
    cum = jnp.cumsum(jnp.exp(sorted_lp), axis=-1)
    # smallest set whose cumulative prob >= p: keep tokens with rank below cut
    keep_sorted = cum - jnp.exp(sorted_lp) < p
    # threshold = smallest kept logprob
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_lp, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logprobs < thresh, NEG_INF, logprobs)


def sample_decode(
    step_fn: Callable,  # (tokens [B*K, 1], index, caches) -> (logprobs, caches)
    init_caches: Any,
    batch_size: int,
    num_samples: int,
    max_len: int,
    eos: int,
    pad: int,
    rng: jax.Array,
    bos: Optional[int] = None,
    top_k: int = 0,
    top_p: float = 0.0,
    min_len: int = 1,
    max_lens: Optional[jax.Array] = None,
    min_lens: Optional[jax.Array] = None,  # [B] per-sentence eos floor
    len_penalty: float = 1.0,
    unk: Optional[int] = None,
    unk_penalty: float = 0.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (tokens [B, K, L], scores [B, K], lengths [B, K]).

    Temperature is NOT applied here — ``step_fn`` already returns tempered
    log-probs (generator.py step_fn divides logits by settings.temperature;
    applying it twice squared the effective temperature — review fix).
    Scores are length-normalized by len^len_penalty like the beam path
    (lenpen 0 == --unnormalized raw sums)."""
    B, K = batch_size, num_samples
    if bos is None:
        bos = eos
    if max_lens is None:
        max_lens = jnp.full((B,), max_len, jnp.int32)
    # reference convention: up to max_lens REAL tokens, eos forced at step
    # max_lens (matches the beam core; the -1 leaves the eos slot in the
    # fixed buffer)
    max_lens = jnp.minimum(max_lens, max_len - 1)

    seq = jnp.full((B * K, max_len + 1), pad, jnp.int32).at[:, 0].set(bos)
    scores = jnp.zeros((B * K,), jnp.float32)
    lens = jnp.zeros((B * K,), jnp.int32)
    done = jnp.zeros((B * K,), bool)

    def cond(state):
        i, seq, scores, lens, done, caches, rng = state
        return (i < jnp.max(max_lens) + 1) & jnp.logical_not(jnp.all(done))

    def body(state):
        i, seq, scores, lens, done, caches, rng = state
        tokens_t = jax.lax.dynamic_slice_in_dim(seq, i, 1, axis=1)
        logprobs, caches = step_fn(tokens_t, i, caches)
        logprobs = logprobs.astype(jnp.float32)
        gen_len = i + 1
        logprobs = logprobs.at[:, pad].set(NEG_INF)
        if unk is not None and unk_penalty != 0.0:
            # reference applies --unkpen before ANY search strategy,
            # sampling included (sequence_generator.py:324)
            logprobs = logprobs.at[:, unk].add(-unk_penalty)
        # per-sentence minimum wins over the scalar floor (--min-len-a/b,
        # --match-source-len)
        if min_lens is not None:
            eff_min = jnp.maximum(min_len, jnp.repeat(min_lens, K))
        else:
            eff_min = jnp.full((B * K,), min_len, jnp.int32)
        ban_eos = gen_len <= eff_min
        logprobs = jnp.where(
            ban_eos[:, None], logprobs.at[:, eos].set(NEG_INF), logprobs
        )
        at_max = gen_len > jnp.repeat(max_lens, K)
        eos_only = jnp.full_like(logprobs, NEG_INF).at[:, eos].set(logprobs[:, eos])
        logprobs = jnp.where(at_max[:, None], eos_only, logprobs)

        filtered = _filter_topp(_filter_topk(logprobs, top_k), top_p)
        rng, sub = jax.random.split(rng)
        tok = jax.random.categorical(sub, filtered, axis=-1)
        tok = jnp.where(done, pad, tok).astype(jnp.int32)

        step_lp = jnp.take_along_axis(logprobs, tok[:, None], axis=1)[:, 0]
        scores = scores + jnp.where(done, 0.0, step_lp)
        seq = jax.lax.dynamic_update_slice_in_dim(seq, tok[:, None], i + 1, axis=1)
        newly_done = (tok == eos) & ~done
        lens = jnp.where(newly_done, gen_len, lens)
        done = done | (tok == eos)
        return (i + 1, seq, scores, lens, done, caches, rng)

    i0 = jnp.asarray(0, jnp.int32)
    i, seq, scores, lens, done, caches, rng = jax.lax.while_loop(
        cond, body, (i0, seq, scores, lens, done, init_caches, rng)
    )
    lens = jnp.where(done, lens, jnp.repeat(max_lens, K) + 1)
    tokens = seq[:, 1:].reshape(B, K, max_len)
    lens = lens.reshape(B, K)
    divisor = jnp.power(
        jnp.maximum(lens.reshape(B * K), 1).astype(jnp.float32), len_penalty
    )
    scores = (scores / divisor).reshape(B, K)
    # sort samples by score desc
    order = jnp.argsort(-scores, axis=1)
    tokens = jnp.take_along_axis(tokens, order[:, :, None], axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)
    lens = jnp.take_along_axis(lens, order, axis=1)
    pos = jnp.arange(tokens.shape[-1])[None, None, :]
    tokens = jnp.where(pos < lens[:, :, None], tokens, pad)
    return tokens, scores, lens
