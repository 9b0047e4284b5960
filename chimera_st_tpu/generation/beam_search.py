"""jit-compiled batched beam search.

TPU-native replacement for the reference's dynamic beam loop
(reference: fairseq/sequence_generator.py:179-769). Design deltas, all forced
by XLA's static-shape compilation model:

- fixed decode length (`max_len` bound) with per-sentence stop via masking —
  no batch shrinking (the reference removes finished sentences from the batch,
  sequence_generator.py:303-338; we retire them with flags),
- the 2*beam candidate trick is kept (top-2k so that eos candidates cannot
  starve the alive set, reference: sequence_generator.py:272-284),
- KV caches are preallocated [B*K, max_len, H, D] in HBM; beam reorder is a
  gather over the cache pytree (replaces reorder_incremental_state),
- scoring matches the reference: hypothesis score = sum of token log-probs
  (incl. eos) / (generated_len ** lenpen) (sequence_generator.py:646),
- early termination matches the reference's stop criterion: a sentence stops
  when its worst finished score can no longer be beaten by any alive
  continuation at the maximum remaining length.

The search core is model-agnostic: it drives a ``step_fn`` closure
(tokens, index, caches) -> (log-probs, caches), so ensembles and LM fusion
compose outside.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1.0e7


class BeamState(NamedTuple):
    cur_index: jax.Array  # scalar int32: next position to write
    alive_seq: jax.Array  # [B, K, L] int32
    alive_scores: jax.Array  # [B, K] fp32 (sum of log-probs)
    finished_seq: jax.Array  # [B, K, L] int32
    finished_scores: jax.Array  # [B, K] fp32 (length-normalized)
    finished_lens: jax.Array  # [B, K] int32 (generated length incl. eos)
    finished_flags: jax.Array  # [B, K] bool
    caches: Any  # pytree with leading [B * K, ...] batch dim
    search_state: Any = None  # strategy-owned pytree (see SearchStrategy)


class SearchStrategy:
    """Candidate-selection hook for beam_search (the reference's Search
    subclass surface, fairseq/search.py:19-800, recast as traceable hooks).

    All methods run inside the jitted decode loop and must be jax-traceable.
    """

    def init_state(self, batch_size: int, beam_size: int):
        """Per-beam strategy state pytree (or None)."""
        return None

    def adjust(self, logprobs, state, step, alive_seq):
        """Modify log-probs before candidate scoring ([B, K, V] -> same)."""
        return logprobs

    def select(self, alive_scores, logprobs, state, step):
        """Pick 2K candidates; return (scores, beam_idx, token) each [B, 2K],
        or None to use the default flat top-2K."""
        return None

    def update(self, state, topk_beam, topk_tok, alive_pick, step):
        """Re-align per-beam state with the chosen alive set ([B, K])."""
        return state


def _flatten_beam(x):
    return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])


def _unflatten_beam(x, B, K):
    return x.reshape((B, K) + x.shape[1:])


def _gather_beams(tree, indices):
    """Gather along beam dim: leaves [B, K_src, ...], indices [B, K_out]."""

    def gather(x):
        idx = indices.reshape(indices.shape + (1,) * (x.ndim - 2))
        return jnp.take_along_axis(x, idx, axis=1)

    return jax.tree_util.tree_map(gather, tree)


def _gather_flat_beams(tree, indices, B, src_k, beam_minor=None):
    """Beam gather for flat cache leaves: [B*K_src, ...] (beam-major) or
    [..., B*K_src] (beam-MINOR, the decode KV-cache layout).

    ``beam_minor`` pins the layout for every leaf; None auto-detects per leaf
    (ambiguous only when another leaf dim equals B*K_src — generators that
    own their cache layout pass it explicitly via beam_search's
    ``beam_minor_caches``).

    Implemented as ONE block-diagonal one-hot matmul per leaf:
    take_along_axis lowers to a slow gather on TPU, and per-sentence batched
    einsums strangle the MXU with 10x10 tiles; folding batch and beam into
    the matmul M/K dims gives >=128-wide tiles and runs at memory speed.
    Correct because beam indices only ever point within the same sentence
    (the one-hot matrix is block-diagonal by construction).

    For beam-minor leaves the matmul is [F, B*K] x [B*K, B*K] with row-major
    operands and a row-major result — the output layout matches the while-loop
    carry, so XLA inserts no relayout copies (the beam-major form costs a full
    extra cache copy per step per leaf, ~1.7 ms/step at B=64 beam 10).
    """
    out_k = indices.shape[1]
    flat_src = (
        jnp.arange(B, dtype=indices.dtype)[:, None] * src_k + indices
    ).reshape(-1)  # [B*out_k] global source row per output row

    # NOTE: exploiting the block-diagonal structure with per-sentence-group
    # batched einsums was measured SLOWER end-to-end (743 ms vs 397 ms decode
    # at B=64) despite ~8x fewer FLOPs — narrow (<=256-wide) batched matmul
    # tiles lose to one dense MXU matmul. Keep the dense form.
    # one shared one-hot per call (building it inside the per-leaf closure
    # cost a measured ~0.3 ms/step of redundant broadcasts at B=64)
    onehot_minor = jax.nn.one_hot(flat_src, B * src_k, axis=0, dtype=jnp.bfloat16)
    onehot_major = onehot_minor.T

    def gather(x):
        is_minor = (
            beam_minor
            if beam_minor is not None
            else x.ndim >= 1
            and x.shape[-1] == B * src_k
            and (x.ndim == 1 or x.shape[0] != B * src_k)
        )
        if is_minor:
            # beam-minor leaf: out[..., i] = x[..., flat_src[i]]
            n = x.reshape(-1, B * src_k)
            g = jnp.matmul(
                n, onehot_minor.astype(x.dtype), preferred_element_type=x.dtype
            )
            return g.reshape(x.shape[:-1] + (B * out_k,))
        n = x.reshape(B * src_k, -1)
        g = jnp.matmul(
            onehot_major.astype(x.dtype), n, preferred_element_type=x.dtype
        )
        return g.reshape((B * out_k,) + x.shape[1:])

    return jax.tree_util.tree_map(gather, tree)


def _default_top2k(alive_scores, logprobs, B, K, V):
    """Flat top-2K over [B, K*V]: measured 3.5x faster than the two-stage
    per-beam shortlist on TPU at B=16 (0.56 vs 1.95 ms/step); module-level so
    benchmarks can A/B alternatives."""
    cand_scores = alive_scores[:, :, None] + logprobs  # [B, K, V]
    flat = cand_scores.reshape(B, K * V)
    topk_scores, topk_idx = jax.lax.top_k(flat, 2 * K)  # [B, 2K]
    return topk_scores, topk_idx // V, topk_idx % V


def beam_search(
    step_fn: Callable,  # (tokens [B*K, 1], index, caches) -> (logprobs [B*K, V] fp32, caches)
    init_caches: Any,  # pytree, leading dim B*K
    batch_size: int,
    beam_size: int,
    max_len: int,  # static decode-length bound (positions incl. eos)
    eos: int,
    pad: int,
    bos: Optional[int] = None,  # first input token; defaults to eos (fairseq)
    min_len: int = 1,
    len_penalty: float = 1.0,
    unk: Optional[int] = None,
    unk_penalty: float = 0.0,
    max_lens: Optional[jax.Array] = None,  # [B] per-sentence max generated len
    min_lens: Optional[jax.Array] = None,  # [B] per-sentence min generated len
    # (per-sentence min/max from source-length ratios = the reference's
    # LengthConstrainedBeamSearch, search.py:526)
    prefix_tokens: Optional[jax.Array] = None,  # [B, P] forced prefix (pad = none)
    no_repeat_ngram_size: int = 0,
    diverse_beam_groups: int = 0,  # >1: diverse beam search
    diverse_beam_strength: float = 0.5,
    strategy=None,  # SearchStrategy hook (constrained/diverse-siblings/...)
    cache_segment: int = 0,  # >0: grow KV caches in segments of this length
    beam_minor_caches=None,  # True/False pins the cache layout; None = auto
    reorder_fn: Optional[Callable] = None,  # (caches, picked_beam [B,K], i)
    # -> caches; replaces the default physical cache gather (used for lazy
    # ancestry-based reorder where only an index map is permuted)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run beam search; returns (tokens [B, K, L], scores [B, K], lengths [B, K]).

    Hypotheses are sorted best-first along K. `tokens` excludes the bos seed,
    includes eos; positions past the length are `pad`.
    """
    B, K = batch_size, beam_size
    if bos is None:
        bos = eos
    if max_lens is None:
        max_lens = jnp.full((B,), max_len, jnp.int32)
    # reference convention (sequence_generator.py:331 `step >= max_len`):
    # a hypothesis may carry max_lens REAL tokens, with eos forced at step
    # max_lens — so clamp to the buffer budget minus the eos slot (the
    # reference clamps to max_positions - 1 the same way, :228-230)
    max_lens = jnp.minimum(max_lens, max_len - 1).astype(jnp.int32)

    # only beam 0 live initially so the first expansion is not K duplicates;
    # with diverse groups, the first beam of EACH group is live (groups run
    # independent searches, reference: search.py:551)
    kp0 = K // diverse_beam_groups if diverse_beam_groups > 1 else K
    init_scores = [0.0 if j % kp0 == 0 else NEG_INF for j in range(K)]
    init = BeamState(
        cur_index=jnp.asarray(0, jnp.int32),
        alive_seq=jnp.full((B, K, max_len + 1), pad, jnp.int32).at[:, :, 0].set(bos),
        alive_scores=jnp.tile(
            jnp.array(init_scores, jnp.float32)[None, :], (B, 1)
        ),
        finished_seq=jnp.full((B, K, max_len + 1), pad, jnp.int32),
        finished_scores=jnp.full((B, K), NEG_INF, jnp.float32),
        finished_lens=jnp.zeros((B, K), jnp.int32),
        finished_flags=jnp.zeros((B, K), bool),
        caches=init_caches,
        search_state=strategy.init_state(B, K) if strategy is not None else None,
    )

    def length_norm(length):
        return jnp.power(jnp.maximum(length, 1).astype(jnp.float32), len_penalty)

    def cond(state: BeamState) -> jax.Array:
        not_at_end = state.cur_index < jnp.max(max_lens) + 1  # eos-forcing step
        # best possible score any alive hypo could still reach (max over
        # beams: strategy-ordered alive sets are not score-sorted)
        best_possible = jnp.max(state.alive_scores, axis=1) / length_norm(
            max_lens + 1  # longest achievable finished length (incl. eos)
        )
        worst_finished = jnp.min(
            jnp.where(state.finished_flags, state.finished_scores, NEG_INF), axis=1
        )
        all_done = jnp.all(state.finished_flags, axis=1)
        improvable = jnp.logical_not(all_done) | (best_possible > worst_finished)
        return not_at_end & jnp.any(improvable)

    def body(state: BeamState) -> BeamState:
        i = state.cur_index
        tokens_t = _flatten_beam(
            jax.lax.dynamic_slice_in_dim(state.alive_seq, i, 1, axis=2)
        )  # [B*K, 1]
        logprobs, new_caches = step_fn(tokens_t, i, state.caches)
        V = logprobs.shape[-1]
        logprobs = _unflatten_beam(logprobs.astype(jnp.float32), B, K)

        gen_len = i + 1  # length if we emit eos now (incl. eos)
        # min/max length and unk handling (reference: sequence_generator.py:352-366;
        # per-sentence minimums: search.py:526 LengthConstrainedBeamSearch)
        if min_lens is None:
            below_min = jnp.reshape(gen_len <= min_len, (1, 1, 1))
        else:
            below_min = (gen_len <= jnp.maximum(min_lens, min_len))[:, None, None]
        logprobs = jnp.where(
            below_min
            & (jax.lax.broadcasted_iota(jnp.int32, (1, 1, V), 2) == eos),
            NEG_INF,
            logprobs,
        )
        if unk is not None and unk_penalty != 0.0:
            logprobs = logprobs.at[:, :, unk].add(-unk_penalty)
        logprobs = logprobs.at[:, :, pad].set(NEG_INF)
        # force eos once max_lens REAL tokens were emitted, keeping the
        # model's true eos score (reference: sequence_generator.py:330-333
        # `step >= max_len` masks all-but-eos; review fix — `gen_len >=
        # max_lens` forced eos one token early, so --max-len-b N produced
        # at most N-1 real tokens)
        at_max = (gen_len > max_lens)[:, None, None]
        eos_only = jnp.full_like(logprobs, NEG_INF).at[:, :, eos].set(
            logprobs[:, :, eos]
        )
        logprobs = jnp.where(at_max, eos_only, logprobs)
        # forced prefix decoding (reference: sequence_generator.py:543-571)
        if prefix_tokens is not None:
            P = prefix_tokens.shape[1]
            in_prefix = i < P
            forced = jax.lax.dynamic_slice_in_dim(
                prefix_tokens, jnp.minimum(i, P - 1), 1, axis=1
            )[:, 0]  # [B]
            has_force = in_prefix & (forced != pad)
            # keep the MODEL's log-prob for the forced token (reference
            # _prefix_tokens gathers lprobs at the prefix index; review fix:
            # scoring forced steps 0.0 dropped the prefix mass from the
            # cumulative score, flipping length-normalized rankings)
            is_forced_tok = (
                jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
                == forced[:, None]
            )[:, None, :]  # [B, 1, V]
            forced_rows = jnp.where(is_forced_tok, logprobs, NEG_INF)
            logprobs = jnp.where(has_force[:, None, None], forced_rows, logprobs)

        if no_repeat_ngram_size > 0:
            # ban tokens completing an already-seen n-gram (reference:
            # sequence_generator.py:734 calc_banned_ngram_tokens) — static
            # formulation: compare the trailing (n-1)-gram against every
            # window of the sequence so far, scatter bans into the vocab
            n = no_repeat_ngram_size
            L = state.alive_seq.shape[-1]
            seq = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2) <= i,
                state.alive_seq,
                -1,
            )  # future positions neutralized
            # trailing (n-1) tokens ending at position i
            tail = jax.lax.dynamic_slice_in_dim(
                state.alive_seq, jnp.maximum(i - (n - 2), 0), n - 1, axis=2
            )  # [B, K, n-1]
            # windows starting at j: seq[..., j : j + n - 1]
            win_idx = (
                jax.lax.broadcasted_iota(jnp.int32, (L, n - 1), 0)
                + jax.lax.broadcasted_iota(jnp.int32, (L, n - 1), 1)
            )  # [L, n-1]
            win_idx = jnp.minimum(win_idx, L - 1)
            windows = seq[:, :, win_idx]  # [B, K, L, n-1]
            match = jnp.all(windows == tail[:, :, None, :], axis=-1)
            j_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, L), 2)
            valid_j = (j_iota + (n - 1) <= i) & (i >= n - 1)
            match = match & valid_j
            next_pos = jnp.minimum(win_idx[:, 0] + (n - 1), L - 1)
            banned_tok = state.alive_seq[:, :, next_pos]  # [B, K, L]
            bans = jnp.zeros((B, K, V), bool).at[
                jnp.arange(B)[:, None, None],
                jnp.arange(K)[None, :, None],
                banned_tok,
            ].max(match)
            logprobs = jnp.where(bans, NEG_INF, logprobs)

        if strategy is not None:
            logprobs = strategy.adjust(
                logprobs, state.search_state, i, state.alive_seq
            )

        selected = (
            strategy.select(state.alive_scores, logprobs, state.search_state, i)
            if strategy is not None
            else None
        )
        if selected is not None:
            topk_scores, topk_beam, topk_tok = selected
        elif diverse_beam_groups > 1:
            # diverse beam search (reference: search.py:551 DiverseBeamSearch):
            # beams split into G groups; group g's log-probs are penalized by
            # strength * counts of tokens already chosen by groups < g this
            # step; each group runs an independent 2k' candidate selection
            G = diverse_beam_groups
            assert K % G == 0, "beam size must be divisible by diverse groups"
            kp = K // G
            counts = jnp.zeros((B, V), jnp.float32)
            parts = []
            for g in range(G):
                lp_g = logprobs[:, g * kp : (g + 1) * kp, :]
                lp_g = lp_g - diverse_beam_strength * counts[:, None, :]
                cand_g = state.alive_scores[:, g * kp : (g + 1) * kp, None] + lp_g
                sc, idx = jax.lax.top_k(cand_g.reshape(B, kp * V), 2 * kp)
                beam_g = idx // V + g * kp  # global beam index
                tok_g = idx % V
                # penalize with ALL 2k' candidates of this group (reference
                # DiverseBeamSearch scatter_adds every index beam.step
                # returned; review fix: counting only the top k' weakened
                # the diversity pressure on later groups)
                counts = counts + jnp.sum(
                    jax.nn.one_hot(tok_g, V, dtype=jnp.float32), axis=1
                )
                parts.append((sc, beam_g, tok_g))
            topk_scores = jnp.concatenate([p[0] for p in parts], axis=1)
            topk_beam = jnp.concatenate([p[1] for p in parts], axis=1)
            topk_tok = jnp.concatenate([p[2] for p in parts], axis=1)
        else:
            topk_scores, topk_beam, topk_tok = _default_top2k(
                state.alive_scores, logprobs, B, K, V
            )

        # gather candidate sequences and write the new token
        cand_seq = _gather_beams(state.alive_seq, topk_beam)
        cand_seq = jax.lax.dynamic_update_slice_in_dim(
            cand_seq, topk_tok[:, :, None], i + 1, axis=2
        )
        # a candidate whose cumulative score carries a NEG_INF ban (eos banned
        # by min_len or a constraint strategy) is not a real hypothesis — do
        # not finalize it even at max_len (real scores never approach -1e6:
        # 256 steps x ~-70 nats max)
        is_eos = (topk_tok == eos) & (topk_scores > 0.5 * NEG_INF)

        # ---- alive set: best K non-eos candidates
        alive_rank = jnp.where(is_eos, NEG_INF, topk_scores)
        if selected is not None:
            # strategy-provided candidates are consumed IN ORDER (the order
            # encodes bank allocation for constrained search — reference:
            # sequence_generator picks active_hypos by candidate rank)
            n_cand = topk_scores.shape[1]
            order_rank = jnp.where(
                is_eos,
                NEG_INF,
                -jax.lax.broadcasted_iota(jnp.float32, (B, n_cand), 1),
            )
            _, alive_pick = jax.lax.top_k(order_rank, K)
            new_alive_scores = jnp.take_along_axis(topk_scores, alive_pick, axis=1)
        elif diverse_beam_groups > 1:
            # keep the group structure: top k' within each group's 2k' slice
            G = diverse_beam_groups
            kp = K // G
            picks, scores_g = [], []
            for g in range(G):
                sl = alive_rank[:, 2 * kp * g : 2 * kp * (g + 1)]
                sc, ix = jax.lax.top_k(sl, kp)
                picks.append(ix + 2 * kp * g)
                scores_g.append(sc)
            new_alive_scores = jnp.concatenate(scores_g, axis=1)
            alive_pick = jnp.concatenate(picks, axis=1)
        else:
            new_alive_scores, alive_pick = jax.lax.top_k(alive_rank, K)
        new_alive_seq = _gather_beams(cand_seq, alive_pick)
        picked_beam = jnp.take_along_axis(topk_beam, alive_pick, axis=1)
        if reorder_fn is not None:
            new_kv = reorder_fn(new_caches, picked_beam, i)
        else:
            new_kv = _gather_flat_beams(
                new_caches, picked_beam, B, K, beam_minor=beam_minor_caches
            )
        new_search_state = (
            strategy.update(state.search_state, topk_beam, topk_tok, alive_pick, i)
            if strategy is not None
            else None
        )

        # ---- finished set: eos candidates merged with previous finished
        norm = length_norm(gen_len)
        fin_cand_scores = jnp.where(is_eos, topk_scores / norm, NEG_INF)
        all_scores = jnp.concatenate([state.finished_scores, fin_cand_scores], axis=1)
        all_seq = jnp.concatenate([state.finished_seq, cand_seq], axis=1)
        all_lens = jnp.concatenate(
            [state.finished_lens, jnp.full((B, 2 * K), gen_len, jnp.int32)], axis=1
        )
        all_flags = jnp.concatenate([state.finished_flags, is_eos], axis=1)
        new_fin_scores, fin_pick = jax.lax.top_k(all_scores, K)
        new_fin_seq = _gather_beams(all_seq, fin_pick)
        new_fin_lens = jnp.take_along_axis(all_lens, fin_pick, axis=1)
        new_fin_flags = jnp.take_along_axis(all_flags, fin_pick, axis=1)

        return BeamState(
            cur_index=i + 1,
            alive_seq=new_alive_seq,
            alive_scores=new_alive_scores,
            finished_seq=new_fin_seq,
            finished_scores=new_fin_scores,
            finished_lens=new_fin_lens,
            finished_flags=new_fin_flags,
            caches=new_kv,
            search_state=new_search_state,
        )

    if cache_segment and cache_segment < max_len:
        # segmented decode: the KV caches (time-major leaves, axis 0) start
        # at cache_segment positions and grow between while_loops, so the
        # beam-reorder gather and attention reads scale with the CURRENT
        # decoded length rather than max_len (the average cache traffic over
        # a full decode drops ~40% with 4 segments). Each segment traces its
        # own program (shapes differ); a finished state exits later segments
        # immediately through the shared cond.
        seg_ends = list(range(cache_segment, max_len, cache_segment)) + [max_len]
        state = init
        for si, seg_end in enumerate(seg_ends):
            seg_cond = lambda s, e=seg_end: cond(s) & (s.cur_index < e)
            state = jax.lax.while_loop(seg_cond, body, state)
            if si + 1 < len(seg_ends):
                grow = seg_ends[si + 1] - seg_end
                def _grow_time(x, grow=grow):
                    # time axis: 0 for the time-major [L, H, D, B*K] caches
                    # and the [L, B*K] ancestry map; 3 for the Pallas decode
                    # kernel's per-sentence [B, H, C, L, D] caches
                    t_axis = 3 if x.ndim == 5 else 0
                    pads = [(0, 0)] * x.ndim
                    pads[t_axis] = (0, grow)
                    return jnp.pad(x, pads)

                state = state._replace(
                    caches=jax.tree_util.tree_map(_grow_time, state.caches)
                )
        final = state
    else:
        final = jax.lax.while_loop(cond, body, init)

    # fall back to alive hypos for sentences with no finished hypo (hit max_len
    # without eos — can only happen if eos was never forced; defensive)
    none_finished = jnp.logical_not(jnp.any(final.finished_flags, axis=1))
    # per-sentence max_lens, not the global max (review fix: short sentences
    # falling back were normalized/reported with the batch-wide maximum)
    own_max = (max_lens + 1).astype(jnp.int32)  # [B] incl. the eos slot
    alive_norm = final.alive_scores / length_norm(own_max)[:, None]
    out_seq = jnp.where(
        none_finished[:, None, None], final.alive_seq, final.finished_seq
    )
    out_scores = jnp.where(none_finished[:, None], alive_norm, final.finished_scores)
    out_lens = jnp.where(
        none_finished[:, None],
        jnp.broadcast_to(own_max[:, None], final.finished_lens.shape).astype(
            final.finished_lens.dtype
        ),
        final.finished_lens,
    )
    # strip the bos seed: hypotheses start at position 1
    tokens = out_seq[:, :, 1:]
    # mask positions beyond each hypothesis length back to pad
    pos = jnp.arange(tokens.shape[-1])[None, None, :]
    tokens = jnp.where(pos < out_lens[:, :, None], tokens, pad)
    return tokens, out_scores, out_lens
