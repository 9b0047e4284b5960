"""Token embedding with a frozen-zero padding row.

Matches the reference Embedding helper (reference:
fairseq/models/transformer.py Embedding(): init normal(0, d^-0.5), the
padding_idx row zeroed AND gradient-frozen — torch nn.Embedding zeroes the
padding row's gradient, so that row stays exactly 0 through training; we
replicate by re-zeroing the row at lookup time, which also kills its grad).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import fairseq_embed_init

Dtype = Any


class Embed(nn.Module):
    num_embeddings: int
    features: int
    padding_idx: Optional[int] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.embedding = self.param(
            "embedding",
            fairseq_embed_init,
            (self.num_embeddings, self.features),
            self.param_dtype,
        )

    def table(self) -> jax.Array:
        emb = self.embedding
        if self.padding_idx is not None:
            emb = emb.at[self.padding_idx].set(0.0)
        return emb.astype(self.dtype)

    def __call__(self, ids: jax.Array) -> jax.Array:
        return jnp.take(self.table(), ids, axis=0)

    def attend(self, x: jax.Array) -> jax.Array:
        """Output projection with tied weights: x @ E^T."""
        return jnp.einsum(
            "...d,vd->...v", x, self.table(), preferred_element_type=jnp.float32
        )
