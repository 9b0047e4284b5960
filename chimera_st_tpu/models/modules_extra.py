"""Auxiliary modules: VGG conv blocks, adaptive input embeddings, sparse
attention masks.

TPU-native rebuilds of the remaining reference module surface
(reference: fairseq/modules/vggblock.py, adaptive_input.py,
sparse_multihead_attention.py). The sparse attention pattern is expressed as
a precomputed additive mask fed to the standard MultiheadAttention — under
XLA a static mask fuses into the attention softmax, so no bespoke attention
module is needed (the reference subclasses MultiheadAttention and mutates
attn weights in-loop)."""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class VGGBlock(nn.Module):
    """Conv2D x N + optional max-pool over (time, freq) feature maps
    (reference: fairseq/modules/vggblock.py — the vggtransformer speech
    frontend). Input/output [B, T, F, C]."""

    out_channels: int
    conv_kernel_size: int = 3
    num_conv_layers: int = 2
    pooling_kernel_size: int = 2
    layer_norm: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.conv_kernel_size
        for i in range(self.num_conv_layers):
            x = nn.Conv(
                self.out_channels, (k, k), padding="SAME",
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"conv_{i}",
            )(x)
            if self.layer_norm:
                x = nn.LayerNorm(dtype=self.dtype, name=f"ln_{i}")(x)
            x = jax.nn.relu(x)
        p = self.pooling_kernel_size
        if p and p > 1:
            x = nn.max_pool(x, (p, p), strides=(p, p))
        return x

    @staticmethod
    def output_length(t: int, pooling_kernel_size: int, num_blocks: int) -> int:
        for _ in range(num_blocks):
            t = t // pooling_kernel_size
        return t


class AdaptiveInput(nn.Module):
    """Clustered input embeddings: frequent tokens get full-dim embeddings,
    rare clusters get progressively smaller ones projected up
    (reference: fairseq/modules/adaptive_input.py; Baevski & Auli 2018).

    Static-shape formulation: every cluster embeds ALL positions (ids
    remapped into the cluster range, clamped), and a per-position one-hot
    cluster selector mixes the projected results — no boolean gathers, fully
    dense XLA ops."""

    vocab_size: int
    initial_dim: int
    output_dim: int
    factor: float = 4.0
    cutoff: Sequence[int] = (5000, 20000)
    padding_idx: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        cutoff = list(self.cutoff)
        if self.vocab_size > cutoff[-1]:
            cutoff = cutoff + [self.vocab_size]
        assert self.vocab_size == cutoff[-1], "cutoff must end at vocab size"
        self._cutoff = cutoff
        embeds = []
        projs = []
        for i in range(len(cutoff)):
            prev = cutoff[i - 1] if i > 0 else 0
            size = cutoff[i] - prev
            dim = int(self.initial_dim // (self.factor ** i))
            embeds.append(
                nn.Embed(size, dim, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"embed_{i}")
            )
            projs.append(
                nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"proj_{i}")
            )
        self.embeds = embeds
        self.projs = projs

    def __call__(self, ids: jax.Array) -> jax.Array:
        out = None
        prev = 0
        for i, (emb, proj) in enumerate(zip(self.embeds, self.projs)):
            hi = self._cutoff[i]
            in_cluster = (ids >= prev) & (ids < hi)
            local = jnp.clip(ids - prev, 0, hi - prev - 1)
            vec = proj(emb(local))
            vec = jnp.where(in_cluster[..., None], vec, 0.0)
            out = vec if out is None else out + vec
            prev = hi
        pad = (ids == self.padding_idx)[..., None]
        return jnp.where(pad, 0.0, out)


def sparse_attention_mask(
    seq_len: int,
    stride: int = 32,
    expressivity: int = 8,
    bidirectional: bool = True,
) -> jnp.ndarray:
    """Additive [T, T] mask for fixed factorized sparse attention
    (reference: fairseq/modules/sparse_multihead_attention.py; "Generating
    Long Sequences with Sparse Transformers": A(1) attends within the stride
    window, A(2) to the last `expressivity` summary positions of every
    window). Feed as ``attn_bias`` to MultiheadAttention."""
    q = jnp.arange(seq_len)[:, None]
    k = jnp.arange(seq_len)[None, :]
    same_window = (q // stride) == (k // stride)
    is_summary = (k % stride) >= (stride - expressivity)
    earlier_window = (k // stride) < (q // stride)
    later_window = (k // stride) > (q // stride)
    allowed = same_window | (earlier_window & is_summary)
    if bidirectional:
        allowed = allowed | (later_window & is_summary)
    else:
        allowed = allowed & (k <= q)
    return jnp.where(allowed, 0.0, -1e8).astype(jnp.float32)
