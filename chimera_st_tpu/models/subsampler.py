"""Conv1d subsampler with GLU (reference:
fairseq/models/speech_to_text/s2t_transformer.py:31-80 Conv1dSubsampler).

Stride-2 conv stack along time; each layer outputs 2x channels consumed by a
GLU. Length formula per layer: floor((L - 1) / 2) + 1 (torch Conv1d with
padding = k // 2, stride 2). Layout is BTC (the reference emits TBC)."""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def glu(x: jax.Array, axis: int = -1) -> jax.Array:
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def subsampled_length(length, n_layers: int):
    for _ in range(n_layers):
        length = (length - 1) // 2 + 1
    return length


class Conv1dSubsampler(nn.Module):
    in_channels: int
    mid_channels: int
    out_channels: int
    kernel_sizes: Tuple[int, ...] = (5, 5)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, C_in] -> [B, T', C_out]
        n = len(self.kernel_sizes)
        for i, k in enumerate(self.kernel_sizes):
            out_ch = self.mid_channels if i < n - 1 else self.out_channels * 2
            x = nn.Conv(
                features=out_ch,
                kernel_size=(k,),
                strides=(2,),
                padding=[(k // 2, k // 2)],
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"conv_layers_{i}",
            )(x)
            x = glu(x, axis=-1)
        return x
