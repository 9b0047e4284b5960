"""Lightweight and dynamic convolutions
(reference: fairseq/modules/{lightconv_layer,dynamicconv_layer} CUDA kernels +
fairseq/modules/{lightweight,dynamic}_convolution.py, from "Pay Less
Attention with Lightweight and Dynamic Convolutions").

TPU-native replacement per SURVEY §2.5: an XLA composition — the depthwise
banded convolution is expressed as K shifted views contracted against
softmax-normalized head-shared weights, which XLA fuses into dense VPU/MXU
work (no scatter/gather). Causal (decoder) and same-padded (encoder) modes;
incremental decoding keeps a [B, K-1, C] ring of past inputs.

- LightweightConv: weights are learned per (head, tap), shared across time
  and channels within a head.
- DynamicConv: weights are predicted per position from the input by a linear
  projection.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _shifted_views(x: jax.Array, kernel_size: int, causal: bool) -> jax.Array:
    """[B, T, C] -> [B, T, K, C]; view k holds x at offset (k - pad)."""
    B, T, C = x.shape
    if causal:
        pad_left, pad_right = kernel_size - 1, 0
    else:
        pad_left = (kernel_size - 1) // 2
        pad_right = kernel_size - 1 - pad_left
    xp = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)))
    views = [xp[:, k : k + T, :] for k in range(kernel_size)]
    return jnp.stack(views, axis=2)  # [B, T, K, C]


def apply_conv_weights(
    x: jax.Array,  # [B, T, C]
    weights: jax.Array,  # [B, T, H, K] or [H, K] (broadcast over B, T)
    num_heads: int,
    causal: bool,
) -> jax.Array:
    B, T, C = x.shape
    K = weights.shape[-1]
    views = _shifted_views(x, K, causal)  # [B, T, K, C]
    views = views.reshape(B, T, K, num_heads, C // num_heads)
    if weights.ndim == 2:  # lightweight: [H, K]
        out = jnp.einsum("btkhd,hk->bthd", views, weights)
    else:  # dynamic: [B, T, H, K]
        out = jnp.einsum("btkhd,bthk->bthd", views, weights)
    return out.reshape(B, T, C)


class LightweightConv(nn.Module):
    dim: int
    kernel_size: int = 3
    num_heads: int = 8
    causal: bool = False
    weight_softmax: bool = True
    weight_dropout: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        w = self.param(
            "weight",
            nn.initializers.xavier_uniform(),
            (self.num_heads, self.kernel_size),
            self.param_dtype,
        ).astype(jnp.float32)
        if self.weight_softmax:
            w = jax.nn.softmax(w, axis=-1)
        if self.weight_dropout > 0 and not deterministic:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1 - self.weight_dropout, w.shape
            )
            w = jnp.where(keep, w / (1 - self.weight_dropout), 0.0)
        return apply_conv_weights(x, w.astype(x.dtype), self.num_heads, self.causal)


class DynamicConv(nn.Module):
    dim: int
    kernel_size: int = 3
    num_heads: int = 8
    causal: bool = False
    weight_softmax: bool = True
    weight_dropout: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        w = nn.Dense(
            self.num_heads * self.kernel_size,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="weight_linear",
        )(x)  # [B, T, H*K]
        B, T, _ = x.shape
        w = w.reshape(B, T, self.num_heads, self.kernel_size).astype(jnp.float32)
        if self.weight_softmax:
            w = jax.nn.softmax(w, axis=-1)
        if self.weight_dropout > 0 and not deterministic:
            keep = jax.random.bernoulli(
                self.make_rng("dropout"), 1 - self.weight_dropout, w.shape
            )
            w = jnp.where(keep, w / (1 - self.weight_dropout), 0.0)
        return apply_conv_weights(x, w.astype(x.dtype), self.num_heads, self.causal)


class ConvAttentionLayer(nn.Module):
    """LightConv/DynamicConv block replacing self-attention
    (reference: fairseq/models/lightconv.py encoder/decoder layers:
    linear -> GLU -> conv -> linear, with the usual residual/LN/FFN)."""

    dim: int
    ffn_dim: int
    kernel_size: int = 3
    num_heads: int = 8
    conv_type: str = "lightweight"  # or "dynamic"
    causal: bool = False
    dropout: float = 0.1
    normalize_before: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None, deterministic: bool = True):
        from .layers import LayerNorm, get_activation

        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ln1 = LayerNorm(self.dim, dtype=self.dtype, name="conv_layer_norm")
        ln2 = LayerNorm(self.dim, dtype=self.dtype, name="final_layer_norm")
        drop = nn.Dropout(self.dropout)

        residual = x
        if self.normalize_before:
            x = ln1(x)
        x = nn.Dense(2 * self.dim, name="linear1", **common)(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)  # GLU
        if padding_mask is not None:
            x = jnp.where(padding_mask[:, :, None], 0.0, x)
        conv_cls = LightweightConv if self.conv_type == "lightweight" else DynamicConv
        x = conv_cls(
            self.dim, self.kernel_size, self.num_heads, causal=self.causal,
            name="conv", **common,
        )(x, deterministic=deterministic)
        x = nn.Dense(self.dim, name="linear2", **common)(x)
        x = drop(x, deterministic=deterministic)
        x = residual + x
        if not self.normalize_before:
            x = ln1(x)

        residual = x
        if self.normalize_before:
            x = ln2(x)
        x = nn.Dense(self.ffn_dim, name="fc1", **common)(x)
        x = get_activation("relu")(x)
        x = nn.Dense(self.dim, name="fc2", **common)(x)
        x = drop(x, deterministic=deterministic)
        x = residual + x
        if not self.normalize_before:
            x = ln2(x)
        return x
