"""Fused encoder self-attention Pallas kernel (the north star's "fused
attention").

The XLA lowering of softmax(QK^T)V materializes the [B, H, T, T] probability
tensor in HBM (at B=128, T=600, H=8 that is ~590 MB per layer per direction
of traffic, x12 w2v2 layers). This kernel computes logits -> masked softmax
-> PV entirely in VMEM per (batch, head) grid step, so only Q/K/V/O ever
touch HBM.

Scope: bidirectional attention with an optional key padding mask — exactly
the encoder stacks (wav2vec2 trunk, shared/interlingua encoder). Lengths are
bounded by VMEM (T^2 fp32 logits): T <= MAX_T. Causal/cached/biased paths
keep the XLA implementation. fp32 softmax like the XLA path, so parity is
bit-tolerant (tests/test_pallas_attention.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_T = 1024  # T^2 fp32 logits must fit VMEM comfortably (1024^2*4 = 4 MB)
NEG_INF = -1e8


def _attn_kernel(scale, n_heads, q_ref, k_ref, v_ref, mask_ref, o_ref):
    # q/k/v: [1, H, T, D] (one batch row, ALL heads — one head per grid step
    # was measured overhead-bound: +11% vs XLA at B=128/T=600/H=8); heads
    # unroll statically inside the step. mask block: [1, 1, T] (block dims
    # equal to the trailing array dims satisfy the tiling rule; a dynamic
    # row slice would need provable sublane alignment). Reads stay >= 2-D.
    pad = mask_ref[0] != 0  # [1, T]
    for h in range(n_heads):
        q = q_ref[0, h].astype(jnp.float32)
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [T, T]
        logits = jnp.where(pad, NEG_INF, logits)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jax.lax.dot_general(
            probs, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, h] = out.astype(o_ref.dtype)


def _fused_forward(q, k, v, mask, scale: float, interpret: bool):
    B, T0, H, D = q.shape
    # lane-align T (the [T, T] logits and all blocks tile on 128); padded key
    # rows are masked out, padded query rows are sliced off the output
    T = ((T0 + 127) // 128) * 128
    if T != T0:
        pad = ((0, 0), (0, T - T0), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        mask = jnp.pad(mask, ((0, 0), (0, T - T0)), constant_values=1)
    # head-major [B, H, T, D] so each grid step's block has (T, D) minor dims
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    qkv_spec = pl.BlockSpec((1, H, T, D), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale, H),
        grid=(B,),
        in_specs=[qkv_spec, qkv_spec, qkv_spec,
                  pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        interpret=interpret,
    )(qt, kt, vt, mask[:, None, :])
    return jnp.transpose(out, (0, 2, 1, 3))[:, :T0]


def fused_encoder_attention(
    q: jax.Array,  # [B, T, H, D]
    k: jax.Array,
    v: jax.Array,
    key_padding_mask: Optional[jax.Array],  # [B, T] True = pad, or None
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    """Differentiable wrapper: pallas_call has no automatic transpose rule,
    so the backward pass recomputes the attention in plain XLA (standard
    softmax-attention VJP; training-path gradients match the XLA forward)."""
    B, T, H, D = q.shape
    if key_padding_mask is None:
        mask = jnp.zeros((B, T), jnp.int8)
    else:
        mask = key_padding_mask.astype(jnp.int8)

    @jax.custom_vjp
    def inner(q, k, v):
        return _fused_forward(q, k, v, mask, scale, interpret)

    def fwd(q, k, v):
        return inner(q, k, v), (q, k, v)

    def bwd(res, g):
        q, k, v = res
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        vf = v.astype(jnp.float32)
        gf = g.astype(jnp.float32)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * scale
        logits = jnp.where(
            (mask != 0)[:, None, None, :], NEG_INF, logits
        )
        p = jax.nn.softmax(logits, axis=-1)
        dv = jnp.einsum("bhqk,bqhd->bkhd", p, gf)
        dp = jnp.einsum("bqhd,bkhd->bhqk", gf, vf)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kf) * scale
        dk = jnp.einsum("bhqk,bqhd->bkhd", ds, qf) * scale
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)

    inner.defvjp(fwd, bwd)
    return inner(q, k, v)


def flash_attention_applicable(q, k, bias, causal, dropout_rate) -> bool:
    """True when the fused kernel covers this attention call: bidirectional
    self/cross attention with only a key padding mask, bounded length, on a
    TPU backend."""
    return (
        bias is None
        and not causal
        and dropout_rate == 0.0
        and q.shape[1] == k.shape[1]  # self-attention shape (enc stacks)
        and q.shape[1] <= MAX_T
        and q.shape[1] >= 8
        and jax.default_backend() == "tpu"
    )
