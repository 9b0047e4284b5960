"""Core transformer building blocks (flax.linen, batch-major [B, T, C]).

TPU-native re-design of the reference modules
(reference: fairseq/modules/multihead_attention.py:20-488,
fairseq/modules/transformer_layer.py, fairseq/modules/sinusoidal_positional_embedding.py):

- batch-major layout (the reference is time-major TBC; BTC maps better onto
  XLA/MXU tiling and mesh sharding along batch),
- fp32 softmax/layernorm under bf16 compute,
- functional KV caches (explicit pytrees in/out) instead of the reference's
  UUID-keyed incremental-state dicts
  (reference: fairseq/incremental_decoding_utils.py:12-47),
- pre/post-LN switchable exactly like the reference's *_normalize_before.

Param-tree naming mirrors the reference state-dict names (q_proj/k_proj/...,
fc1/fc2, self_attn_layer_norm, ...) so the torch checkpoint importer is a
plain name map.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention


def _lazy_select_mode() -> str:
    """Lazy-beam-reorder attention variant. "crosscol" (default): cross-column
    logits + post-softmax one-hot select. "gather": one-hot K/V column select
    BEFORE the logits (CHIMERA_LAZY_SELECT=gather). Same math — exact-equal
    on CPU (tests/test_generate_golden.py), bf16 tie-flips on TPU.

    Measured dead end (benchmarks/ab_lazy_select.py, B=128 beam 10 on the
    real chip): gather = 779.8 ms/batch vs crosscol = 628.1 ms. On paper the
    gather bounds traffic at the bf16 cache size while crosscol names two
    [B,H,K,L,K] fp32 intermediates — but XLA fuses the select into the
    surrounding einsums (they never materialize), whereas the explicit
    k_sel/v_sel copies DO materialize, with transposed layouts. Read at
    trace time so benchmarks can flip it per-process."""
    import os

    return os.environ.get("CHIMERA_LAZY_SELECT", "crosscol")

Dtype = Any


def maybe_layer_drop(
    layer_fn: Callable,
    x: jax.Array,
    rate: float,
    rng: Optional[jax.Array],
    deterministic: bool = True,
):
    """LayerDrop (reference: fairseq/modules/layer_drop.py
    LayerDropModuleList): during training each layer is skipped with
    probability ``rate``; at inference all layers run. ``layer_fn`` must map
    x -> y of the same shape. lax.cond executes one branch under jit, so a
    dropped layer costs nothing."""
    if deterministic or rate <= 0.0 or rng is None:
        return layer_fn(x)
    keep = jax.random.bernoulli(rng, 1.0 - rate)
    return jax.lax.cond(keep, layer_fn, lambda v: v, x)


def xavier_uniform_gain(gain: float):
    base = nn.initializers.xavier_uniform()

    def init(key, shape, dtype):
        return base(key, shape, dtype) * gain

    return init


def fairseq_embed_init(key, shape, dtype):
    # reference: fairseq/models/transformer.py Embedding(): normal(0, d^-0.5)
    return jax.random.normal(key, shape, dtype) * (shape[-1] ** -0.5)


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics and params, output in compute dtype."""

    dim: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype)


def get_activation(name: str) -> Callable:
    if name == "relu":
        return jax.nn.relu
    if name == "gelu":
        # torch nn.GELU default = exact erf gelu (reference uses exact)
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "gelu_fast" or name == "gelu_accurate":
        return lambda x: jax.nn.gelu(x, approximate=True)
    if name == "tanh":
        return jnp.tanh
    if name == "linear":
        return lambda x: x
    raise ValueError(f"unknown activation {name!r}")


def sinusoidal_positions(num_embeddings: int, dim: int, padding_idx: int = 1):
    """fairseq-layout sinusoid table: [sin(all) | cos(all)] concatenated,
    row `padding_idx` zeroed, positions offset by padding_idx + 1
    (reference: fairseq/modules/sinusoidal_positional_embedding.py get_embedding).

    Returns [num_embeddings + padding_idx + 1, dim] table indexed by absolute
    position id (position id of timestep t is ``padding_idx + 1 + t``).
    """
    half = dim // 2
    n = num_embeddings + padding_idx + 1
    freq = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1)))
    angles = jnp.arange(n, dtype=jnp.float32)[:, None] * freq[None, :]
    table = jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=1)
    if dim % 2 == 1:
        table = jnp.concatenate([table, jnp.zeros((n, 1), jnp.float32)], axis=1)
    table = table.at[padding_idx].set(0.0)
    return table


def positional_embedding_from_mask(
    padding_mask: jax.Array,  # [B, T] True = pad
    dim: int,
    padding_idx: int = 1,
) -> jax.Array:
    """Sinusoidal positions for (possibly padded) sequences, [B, T, dim].

    Position ids follow the reference's make_positions
    (reference: fairseq/utils.py make_positions): non-pad position t gets id
    padding_idx + 1 + t, pads get id padding_idx (the zero row). Use
    :func:`position_at_step` for incremental decode.
    """
    _, T = padding_mask.shape
    table = sinusoidal_positions(T, dim, padding_idx)
    nonpad = ~padding_mask
    pos = (
        jnp.cumsum(nonpad.astype(jnp.int32), axis=1) * nonpad.astype(jnp.int32)
        + padding_idx
    )
    return table[pos]


def position_at_step(step: jax.Array, dim: int, padding_idx: int = 1, max_len: int = 4096):
    """Sinusoid vector for a scalar decode step (0-based), [dim]."""
    table = sinusoidal_positions(max_len, dim, padding_idx)
    return table[padding_idx + 1 + step]


class MultiheadAttention(nn.Module):
    """Multi-head attention with functional KV cache.

    reference: fairseq/modules/multihead_attention.py:20-488 (the incremental
    k/v buffer + static_kv branches become explicit `cache` pytrees here).
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    qkv_same_dim_init: bool = True

    def setup(self):
        d = self.embed_dim
        gain = 1.0 / math.sqrt(2) if self.qkv_same_dim_init else 1.0
        dense = lambda name, g: nn.Dense(
            d,
            use_bias=self.bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=xavier_uniform_gain(g),
            name=name,
        )
        self.q_proj = dense("q_proj", gain)
        self.k_proj = dense("k_proj", gain)
        self.v_proj = dense("v_proj", gain)
        self.out_proj = nn.Dense(
            d,
            use_bias=self.bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="out_proj",
        )

    def _split(self, x):
        B, T, _ = x.shape
        h = self.num_heads
        return x.reshape(B, T, h, self.embed_dim // h)

    def compute_kv(self, kv: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Project keys/values once (for static cross-attention caches)."""
        return self._split(self.k_proj(kv)), self._split(self.v_proj(kv))

    def __call__(
        self,
        query: jax.Array,  # [B, Tq, C]
        kv: Optional[jax.Array] = None,  # [B, Tk, C]; None = self-attention
        *,
        key_padding_mask: Optional[jax.Array] = None,  # [B, Tk] True = pad
        attn_bias: Optional[jax.Array] = None,  # additive [.., Tq, Tk]
        causal: bool = False,
        precomputed_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
        cache: Optional[Dict[str, jax.Array]] = None,
        cache_index: Optional[jax.Array] = None,
        cache_ancestry: Optional[jax.Array] = None,  # [L, B] lazy beam reorder
        ancestry_groups: int = 1,  # beam size K (cols per sentence group)
        deterministic: bool = True,
    ):
        """Returns (out [B, Tq, C], new_cache or None).

        Self-attn incremental decode: pass `cache` = {'k','v'} preallocated
        [B, Tmax, H, D] and scalar `cache_index`; query must be [B, 1, C].

        ``cache_ancestry`` enables LAZY beam reorder: the cache is never
        physically permuted by the beam search; instead ancestry[t, col] gives
        the cache column (within the same sentence's K-column group) holding
        this hypothesis's time-t entry, and the permutation is folded into the
        attention read (cross-column logits + a one-hot select over the K
        columns). This removes the O((B*K)^2) per-step gather matmul and its
        full-cache write traffic — the dominant decode cost at batch >= 32
        (measured: decode scales superlinearly with B under eager reorder).
        """
        q = self._split(self.q_proj(query))

        new_cache = None
        if precomputed_kv is not None and ancestry_groups > 1:
            # Grouped cross-attention for beam decode: kv stays UN-repeated
            # [B, S, H, D] while queries carry B*K rows — beams of one
            # sentence share the encoder K/V, so repeating it across beams
            # (reference: EnsembleModel reorder_encoder_out) multiplies the
            # per-step HBM reads by K for no information. Measured at B=128
            # beam 10: the repeated enc_kv slices were the top DMA occupancy
            # in the decode trace.
            k, v = precomputed_kv  # [B, S, H, D]
            K = ancestry_groups
            BK = q.shape[0]
            B = BK // K
            H, D = self.num_heads, self.embed_dim // self.num_heads
            assert query.shape[1] == 1, "grouped cross-attn is single-step"
            qg = q.reshape(B, K, H, D)
            scale = D**-0.5
            logits = jnp.einsum(
                "bkhd,bshd->bhks", qg, k, preferred_element_type=jnp.float32
            ) * jnp.float32(scale)
            if key_padding_mask is not None:
                logits = jnp.where(
                    key_padding_mask[:, None, None, :], -1e8, logits
                )
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum(
                "bhks,bshd->bkhd",
                probs.astype(query.dtype),
                v,
                preferred_element_type=jnp.float32,
            ).astype(query.dtype)
            out = out.reshape(BK, 1, self.embed_dim)
            return self.out_proj(out), None
        if precomputed_kv is not None:
            k, v = precomputed_kv
        elif (
            cache is not None
            and cache_ancestry is not None
            and cache["k"].ndim == 5
        ):
            # fused Pallas decode-step attention over a per-sentence
            # column-major cache [B, H, C, L, D] (CHIMERA_PALLAS_DECODE=1;
            # ops/pallas_decode_attention.py — the ancestry select collapses
            # into pre-softmax masking inside the kernel)
            from ..ops.pallas_decode_attention import decode_step_attention

            assert query.shape[1] == 1, "cached decode is single-step"
            BK = q.shape[0]
            B5, H, C, L, D = cache["k"].shape
            k_new = self._split(self.k_proj(query))  # [BK, 1, H, D]
            v_new = self._split(self.v_proj(query))

            def _to5(x):  # [BK, 1, H, D] -> [B, H, C, 1, D]
                return jnp.transpose(
                    x[:, 0].reshape(B5, C, H, D), (0, 2, 1, 3)
                )[:, :, :, None, :]

            kc = jax.lax.dynamic_update_slice(
                cache["k"], _to5(k_new), (0, 0, 0, cache_index, 0)
            )
            vc = jax.lax.dynamic_update_slice(
                cache["v"], _to5(v_new), (0, 0, 0, cache_index, 0)
            )
            new_cache = {"k": kc, "v": vc}
            out = decode_step_attention(
                q[:, 0].reshape(B5, C, H, D),
                kc.reshape(B5, H, C * L, D),
                vc.reshape(B5, H, C * L, D),
                cache_ancestry,
                cache_index,
                interpret=jax.default_backend() != "tpu",
            )
            out = out.reshape(BK, 1, self.embed_dim)
            return self.out_proj(out), new_cache
        elif cache is not None and cache_ancestry is not None:
            assert query.shape[1] == 1, "cached decode is single-step"
            k_new = self._split(self.k_proj(query))  # [B, 1, H, D]
            v_new = self._split(self.v_proj(query))
            k_row = jnp.transpose(k_new, (1, 2, 3, 0))  # [1, H, D, BK]
            v_row = jnp.transpose(v_new, (1, 2, 3, 0))
            int8_cache = "k_scale" in cache
            if int8_cache:
                # int8 KV cache (--kv-cache-int8): symmetric per-row
                # quantization — one f32 scale per cache column per position
                # (amax over this step's [H, D] vector). Halves the per-step
                # HBM cache read vs bf16; the dequant is folded into the
                # logits/probs (the scale is constant over the contracted
                # (H, D) dims), so the int8->compute-dtype convert happens
                # after the HBM read without materializing a dequantized
                # cache copy. int8 in [-127, 127] converts to bf16 exactly.
                def _quant(row):
                    r = row.astype(jnp.float32)
                    amax = jnp.max(jnp.abs(r), axis=(0, 1, 2))  # [BK]
                    s = jnp.maximum(amax, 1e-8) / 127.0
                    q8 = jnp.round(r / s).astype(jnp.int8)
                    return q8, s

                k_q, k_s = _quant(k_row)
                v_q, v_s = _quant(v_row)
                kc = jax.lax.dynamic_update_slice_in_dim(
                    cache["k"], k_q, cache_index, axis=0
                )
                vc = jax.lax.dynamic_update_slice_in_dim(
                    cache["v"], v_q, cache_index, axis=0
                )
                ks = jax.lax.dynamic_update_slice_in_dim(
                    cache["k_scale"], k_s[None], cache_index, axis=0
                )
                vs = jax.lax.dynamic_update_slice_in_dim(
                    cache["v_scale"], v_s[None], cache_index, axis=0
                )
                new_cache = {"k": kc, "v": vc, "k_scale": ks, "v_scale": vs}
            else:
                kc = jax.lax.dynamic_update_slice_in_dim(
                    cache["k"], k_row, cache_index, axis=0
                )
                vc = jax.lax.dynamic_update_slice_in_dim(
                    cache["v"], v_row, cache_index, axis=0
                )
                new_cache = {"k": kc, "v": vc}
            K = ancestry_groups
            BK = q.shape[0]
            B, L = BK // K, kc.shape[0]
            H, D = self.num_heads, self.embed_dim // self.num_heads
            scale = D**-0.5
            qg = q.reshape(B, K, 1, H, D)[:, :, 0]  # [B, K, H, D]
            kc_g = kc.reshape(L, H, D, B, K)
            vc_g = vc.reshape(L, H, D, B, K)
            if int8_cache:
                kc_g = kc_g.astype(query.dtype)
                vc_g = vc_g.astype(query.dtype)
                # [L, BK] -> [B, 1, 1, L, K] broadcast against [B,H,K,L,C]
                ks_b = jnp.transpose(ks.reshape(L, B, K), (1, 0, 2))[
                    :, None, None
                ]
                vs_b = jnp.transpose(vs.reshape(L, B, K), (1, 0, 2))[
                    :, None, None
                ]
            anc = cache_ancestry.reshape(L, B, K)  # within-group columns
            future = (
                jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, L), 3) > cache_index
            )
            if _lazy_select_mode() == "crosscol":
                # cross-column logits (DEFAULT — measured 628.1 vs the gather
                # mode's 779.8 ms/batch at B=128, benchmarks/ab_lazy_select):
                # every beam row vs every cache column of its sentence group
                # ([B,K,H] x [L,..,K] -> [B,H,K,L,K]). The nominal fp32
                # intermediates never materialize — XLA fuses the select into
                # the adjacent einsums (ARCHITECTURE.md §7).
                sel = jax.nn.one_hot(anc, K, dtype=jnp.float32)  # [L, B, K, K]
                logits_all = jnp.einsum(
                    "bkhd,lhdbc->bhklc", qg, kc_g,
                    preferred_element_type=jnp.float32,
                ) * jnp.float32(scale)
                if int8_cache:
                    logits_all = logits_all * ks_b
                sel_b = jnp.transpose(sel, (1, 2, 0, 3))  # [B, K, L, K]
                logits = jnp.sum(logits_all * sel_b[:, None], axis=-1)
                logits = jnp.where(future, -1e8, logits)
                probs = jax.nn.softmax(logits, axis=-1)
                probs_sel = probs[..., None] * sel_b[:, None]  # [B,H,K,L,K]
                if int8_cache:
                    probs_sel = probs_sel * vs_b
                out = jnp.einsum(
                    "bhklc,lhdbc->bkhd",
                    probs_sel.astype(query.dtype),
                    vc_g,
                    preferred_element_type=jnp.float32,
                ).astype(query.dtype)
            else:
                # ancestry-gather mode (CHIMERA_LAZY_SELECT=gather, measured
                # DEAD END: 779.8 ms/batch vs crosscol 628.1 at B=128 — the
                # explicit k_sel/v_sel copies materialize in transposed
                # layouts while crosscol fuses): select each hypothesis's K/V
                # columns FIRST via a one-hot contraction (identical math:
                # 1.0 * x is exact in bf16), then single-column attention.
                if int8_cache:
                    # dead-end A/B mode: dequantize the full cache upfront
                    # (materializes a copy — the crosscol path is the one
                    # that folds the scales in without one)
                    kc_g = kc_g * ks.reshape(L, B, K)[:, None, None].astype(
                        query.dtype
                    )
                    vc_g = vc_g * vs.reshape(L, B, K)[:, None, None].astype(
                        query.dtype
                    )
                sel = jax.nn.one_hot(anc, K, dtype=query.dtype)  # [L,B,K,Kc]
                k_sel = jnp.einsum(
                    "lhdbc,lbkc->lhdbk", kc_g, sel,
                    preferred_element_type=query.dtype,
                )
                v_sel = jnp.einsum(
                    "lhdbc,lbkc->lhdbk", vc_g, sel,
                    preferred_element_type=query.dtype,
                )
                logits = jnp.einsum(
                    "bkhd,lhdbk->bhkl", qg, k_sel,
                    preferred_element_type=jnp.float32,
                ) * jnp.float32(scale)
                logits = jnp.where(future, -1e8, logits)
                probs = jax.nn.softmax(logits, axis=-1)
                out = jnp.einsum(
                    "bhkl,lhdbk->bkhd",
                    probs.astype(query.dtype),
                    v_sel,
                    preferred_element_type=jnp.float32,
                ).astype(query.dtype)
            out = out.reshape(BK, 1, self.embed_dim)
            out = self.out_proj(out)
            return out, new_cache
        elif cache is not None:
            # Incremental decode against a TIME-MAJOR cache [L, H, D, B].
            # The beam dim is MINOR so the generator's beam-reorder gather is
            # one row-major [F, B] x [B, B] matmul whose output layout equals
            # the loop-carry layout — no per-step relayout copies (measured
            # ~1.7 ms/step of pure copies at B=64 with the [B, L, H, D]
            # batch-major layout the reference's incremental buffers imply).
            assert query.shape[1] == 1, "cached decode is single-step"
            k_new = self._split(self.k_proj(query))  # [B, 1, H, D]
            v_new = self._split(self.v_proj(query))
            kc = jax.lax.dynamic_update_slice_in_dim(
                cache["k"], jnp.transpose(k_new, (1, 2, 3, 0)), cache_index, axis=0
            )
            vc = jax.lax.dynamic_update_slice_in_dim(
                cache["v"], jnp.transpose(v_new, (1, 2, 3, 0)), cache_index, axis=0
            )
            new_cache = {"k": kc, "v": vc}
            scale = (self.embed_dim // self.num_heads) ** -0.5
            logits = jnp.einsum(
                "bqhd,lhdb->bhql", q, kc, preferred_element_type=jnp.float32
            ) * jnp.float32(scale)
            t_max = kc.shape[0]
            future = jnp.arange(t_max)[None, None, None, :] > cache_index
            logits = jnp.where(future, -1e8, logits)
            probs = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum(
                "bhql,lhdb->bqhd",
                probs.astype(query.dtype),
                vc,
                preferred_element_type=jnp.float32,
            ).astype(query.dtype)
            B, Tq = out.shape[0], out.shape[1]
            out = self.out_proj(out.reshape(B, Tq, self.embed_dim))
            return out, new_cache
        else:
            src = query if kv is None else kv
            k = self._split(self.k_proj(src))
            v = self._split(self.v_proj(src))

        dropout_rng = None
        if self.dropout > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")

        out = dot_product_attention(
            q,
            k,
            v,
            key_padding_mask=key_padding_mask,
            bias=attn_bias,
            causal=causal,
            dropout_rng=dropout_rng,
            dropout_rate=self.dropout if not deterministic else 0.0,
        )
        B, Tq = out.shape[0], out.shape[1]
        out = self.out_proj(out.reshape(B, Tq, self.embed_dim))
        return out, new_cache

    def attention_weights(
        self,
        query: jax.Array,  # [B, Tq, C]
        kv: jax.Array,  # [B, Tk, C]
        key_padding_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Head-averaged attention probabilities [B, Tq, Tk] (reference:
        MultiheadAttention need_weights=True — used for --print-alignment)."""
        q = self._split(self.q_proj(query))
        k = self._split(self.k_proj(kv))
        scale = (self.embed_dim // self.num_heads) ** -0.5
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * jnp.float32(scale)
        if key_padding_mask is not None:
            logits = jnp.where(key_padding_mask[:, None, None, :], -1e8, logits)
        return jnp.mean(jax.nn.softmax(logits, axis=-1), axis=1)


class TransformerEncoderLayer(nn.Module):
    """Pre/post-LN encoder layer (reference: fairseq/modules/transformer_layer.py:14-150)."""

    embed_dim: int
    ffn_dim: int
    num_heads: int
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.self_attn = MultiheadAttention(
            self.embed_dim,
            self.num_heads,
            dropout=self.attention_dropout,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="self_attn",
        )
        self.self_attn_layer_norm = LayerNorm(self.embed_dim, dtype=self.dtype)
        self.fc1 = nn.Dense(
            self.ffn_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="fc1",
        )
        self.fc2 = nn.Dense(
            self.embed_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="fc2",
        )
        self.final_layer_norm = LayerNorm(self.embed_dim, dtype=self.dtype)
        self.act = get_activation(self.activation)
        self.dropout_layer = nn.Dropout(self.dropout)
        self.activation_dropout_layer = nn.Dropout(self.activation_dropout)

    def __call__(
        self,
        x: jax.Array,  # [B, T, C]
        encoder_padding_mask: Optional[jax.Array] = None,  # [B, T] True = pad
        attn_bias: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        residual = x
        if self.normalize_before:
            x = self.self_attn_layer_norm(x)
        x, _ = self.self_attn(
            x,
            key_padding_mask=encoder_padding_mask,
            attn_bias=attn_bias,
            deterministic=deterministic,
        )
        x = self.dropout_layer(x, deterministic=deterministic)
        x = residual + x
        if not self.normalize_before:
            x = self.self_attn_layer_norm(x)

        residual = x
        if self.normalize_before:
            x = self.final_layer_norm(x)
        x = self.act(self.fc1(x))
        x = self.activation_dropout_layer(x, deterministic=deterministic)
        x = self.fc2(x)
        x = self.dropout_layer(x, deterministic=deterministic)
        x = residual + x
        if not self.normalize_before:
            x = self.final_layer_norm(x)
        return x

    def cross_only(
        self,
        queries: jax.Array,  # [B, M, C] (memory slots)
        keys: jax.Array,  # [B, T, C] (encoder states)
        key_padding_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """Interlingua-layer fast path.

        The reference runs full self-attention over [h; mem] with a column mask
        that blocks everyone from attending to the mem columns
        (reference: fairseq/models/chimera/w2v2_transformer_interlingua.py:284-298),
        then keeps only the mem rows. For mem queries that reduces *exactly* to
        cross-attention mem -> h with this layer's self-attn parameters, so we
        compute only the M memory rows: O(M*T) instead of O((T+M)^2).
        """
        residual = queries
        if self.normalize_before:
            q = self.self_attn_layer_norm(queries)
            k = self.self_attn_layer_norm(keys)
        else:
            q, k = queries, keys
        x, _ = self.self_attn(
            q, kv=k, key_padding_mask=key_padding_mask, deterministic=deterministic
        )
        x = self.dropout_layer(x, deterministic=deterministic)
        x = residual + x
        if not self.normalize_before:
            x = self.self_attn_layer_norm(x)

        residual = x
        if self.normalize_before:
            x = self.final_layer_norm(x)
        x = self.act(self.fc1(x))
        x = self.activation_dropout_layer(x, deterministic=deterministic)
        x = self.fc2(x)
        x = self.dropout_layer(x, deterministic=deterministic)
        x = residual + x
        if not self.normalize_before:
            x = self.final_layer_norm(x)
        return x


class TransformerDecoderLayer(nn.Module):
    """Pre/post-LN decoder layer with functional caches
    (reference: fairseq/modules/transformer_layer.py:152-423).
    ``causal=False`` gives the bidirectional decoder used by CMLM-style
    non-autoregressive models."""

    embed_dim: int
    ffn_dim: int
    num_heads: int
    causal: bool = True
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        mk_attn = lambda name: MultiheadAttention(
            self.embed_dim,
            self.num_heads,
            dropout=self.attention_dropout,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )
        self.self_attn = mk_attn("self_attn")
        self.encoder_attn = mk_attn("encoder_attn")
        self.self_attn_layer_norm = LayerNorm(self.embed_dim, dtype=self.dtype)
        self.encoder_attn_layer_norm = LayerNorm(self.embed_dim, dtype=self.dtype)
        self.fc1 = nn.Dense(
            self.ffn_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="fc1",
        )
        self.fc2 = nn.Dense(
            self.embed_dim,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="fc2",
        )
        self.final_layer_norm = LayerNorm(self.embed_dim, dtype=self.dtype)
        self.act = get_activation(self.activation)
        self.dropout_layer = nn.Dropout(self.dropout)
        self.activation_dropout_layer = nn.Dropout(self.activation_dropout)

    def compute_encoder_kv(self, encoder_out: jax.Array):
        return self.encoder_attn.compute_kv(encoder_out)

    def __call__(
        self,
        x: jax.Array,  # [B, T, C]
        encoder_out: Optional[jax.Array] = None,  # [B, S, C]
        encoder_padding_mask: Optional[jax.Array] = None,  # [B, S]
        self_attn_padding_mask: Optional[jax.Array] = None,  # [B, T]
        encoder_kv: Optional[Tuple[jax.Array, jax.Array]] = None,
        self_cache: Optional[Dict[str, jax.Array]] = None,
        cache_index: Optional[jax.Array] = None,
        cache_ancestry: Optional[jax.Array] = None,
        ancestry_groups: int = 1,
        deterministic: bool = True,
    ):
        """Returns (y, new_self_cache)."""
        residual = x
        if self.normalize_before:
            x = self.self_attn_layer_norm(x)
        x, new_cache = self.self_attn(
            x,
            key_padding_mask=self_attn_padding_mask if self_cache is None else None,
            causal=self.causal and self_cache is None,
            cache=self_cache,
            cache_index=cache_index,
            cache_ancestry=cache_ancestry,
            ancestry_groups=ancestry_groups,
            deterministic=deterministic,
        )
        x = self.dropout_layer(x, deterministic=deterministic)
        x = residual + x
        if not self.normalize_before:
            x = self.self_attn_layer_norm(x)

        if encoder_out is not None or encoder_kv is not None:
            residual = x
            if self.normalize_before:
                x = self.encoder_attn_layer_norm(x)
            # un-repeated encoder K/V (grouped beam cross-attn) only when the
            # kv batch is actually smaller than the query batch
            kv_groups = 1
            if (
                encoder_kv is not None
                and ancestry_groups > 1
                and encoder_kv[0].shape[0] != x.shape[0]
            ):
                kv_groups = ancestry_groups
            x, _ = self.encoder_attn(
                x,
                kv=encoder_out,
                precomputed_kv=encoder_kv,
                key_padding_mask=encoder_padding_mask,
                ancestry_groups=kv_groups,
                deterministic=deterministic,
            )
            x = self.dropout_layer(x, deterministic=deterministic)
            x = residual + x
            if not self.normalize_before:
                x = self.encoder_attn_layer_norm(x)

        residual = x
        if self.normalize_before:
            x = self.final_layer_norm(x)
        x = self.act(self.fc1(x))
        x = self.activation_dropout_layer(x, deterministic=deterministic)
        x = self.fc2(x)
        x = self.dropout_layer(x, deterministic=deterministic)
        x = residual + x
        if not self.normalize_before:
            x = self.final_layer_norm(x)
        return x, new_cache

    def encoder_attn_weights(
        self,
        x: jax.Array,  # [B, T, C] input to this layer
        encoder_out: jax.Array,
        encoder_padding_mask: Optional[jax.Array] = None,
        self_attn_padding_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Head-averaged cross-attention probabilities [B, T, S] of this
        layer (for --print-alignment; reference: need_weights path)."""
        residual = x
        if self.normalize_before:
            x = self.self_attn_layer_norm(x)
        x, _ = self.self_attn(
            x, key_padding_mask=self_attn_padding_mask, causal=self.causal
        )
        x = residual + x
        if not self.normalize_before:
            x = self.self_attn_layer_norm(x)
        q = self.encoder_attn_layer_norm(x) if self.normalize_before else x
        return self.encoder_attn.attention_weights(
            q, encoder_out, encoder_padding_mask
        )
