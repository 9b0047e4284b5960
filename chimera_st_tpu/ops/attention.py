"""Attention compute ops.

TPU-native replacement for the reference's MultiheadAttention inner loop
(reference: fairseq/modules/multihead_attention.py:20-488). Layout is
batch-major [B, T, H, D] so XLA tiles the two matmuls onto the MXU; softmax
runs in fp32 regardless of compute dtype (bf16-safe). Masks follow the
reference convention: ``key_padding_mask`` True = padded (ignored), additive
``bias`` uses large-negative (not -inf, to avoid NaN rows for fully-masked
queries — the reference uses -1e8, see fairseq/modules/transformer_layer.py:127).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e8

# fused Pallas encoder attention (north star "fused attention") — MEASURED
# DEAD END at flagship shapes, default OFF: on-chip A/B at B=128/T=600/H=8
# (benchmarks/ab_flash_attention.py) reads 242 ms XLA vs 263 ms (per-head
# grid) / 273 ms (head-batched) Pallas for the full encoder. XLA's own
# attention lowering keeps the probs tensor in a fused loop at these sizes,
# so the kernel only adds transposes + pipeline overhead. Kept in-tree
# (correct + parity/grad-tested) for larger-T regimes; opt in with
# CHIMERA_FLASH_ATTENTION=1.
_FLASH_ENABLED = os.environ.get("CHIMERA_FLASH_ATTENTION", "0") == "1"


def dot_product_attention(
    q: jax.Array,  # [B, Tq, H, D] (pre-scaled or not; see scale)
    k: jax.Array,  # [B, Tk, H, D]
    v: jax.Array,  # [B, Tk, H, D]
    key_padding_mask: Optional[jax.Array] = None,  # [B, Tk] True = pad
    bias: Optional[jax.Array] = None,  # additive, broadcastable to [B, H, Tq, Tk]
    causal: bool = False,
    scale: Optional[float] = None,
    dropout_rng: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
) -> jax.Array:
    """Returns [B, Tq, H, D]."""
    orig_dtype = q.dtype
    if scale is None:
        scale = q.shape[-1] ** -0.5

    if _FLASH_ENABLED:
        from .pallas_attention import (
            flash_attention_applicable,
            fused_encoder_attention,
        )

        eff_dropout = dropout_rate if dropout_rng is not None else 0.0
        if flash_attention_applicable(q, k, bias, causal, eff_dropout):
            return fused_encoder_attention(
                q, k, v, key_padding_mask, float(scale)
            )

    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * jnp.float32(scale)

    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if causal:
        tq, tk = logits.shape[-2], logits.shape[-1]
        # offset so the last query attends to all keys (supports cached decode)
        qi = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0) + (tk - tq)
        ki = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
        logits = jnp.where(ki > qi, NEG_INF, logits)
    if key_padding_mask is not None:
        logits = jnp.where(
            key_padding_mask[:, None, None, :], NEG_INF, logits
        )

    # softmax in f32, result immediately back in the compute dtype — the
    # reference's exact semantics (fairseq utils.softmax: F.softmax(x.float())
    # .type_as(x) under fp16). The cast matters for training throughput: the
    # probs tensor is what autodiff saves for the backward pass, and at
    # [B, H, T, T] (137 MB per w2v2-trunk layer at B=48/T=299) keeping it
    # f32 doubled the dominant HBM stream in the train-step trace
    # (benchmarks/trace_train.py: twelve 2.3 ms f32[48,8,299,299] softmax
    # fusions + twelve 2.2 ms bf16 converts per step before this change).
    probs = jax.nn.softmax(logits, axis=-1).astype(orig_dtype)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), jnp.zeros((), orig_dtype))

    out = jnp.einsum(
        "bhqk,bkhd->bqhd",
        probs,
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(orig_dtype)
