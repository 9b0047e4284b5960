"""Adaptive softmax (reference: fairseq/modules/adaptive_softmax.py, after
Grave et al. "Efficient softmax approximation for GPUs").

Vocabulary split at `cutoffs` into a frequent head plus tail clusters; the
head predicts head words + one logit per cluster, each tail predicts its
words from a factor^i down-projected representation. Static-shape design:
per-position NLL computes every cluster's logits for all positions (the
savings come from the low-rank tail projections, which is also where the
FLOP reduction is on TPU — no ragged gathers needed)."""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class AdaptiveSoftmax(nn.Module):
    vocab_size: int
    input_dim: int
    cutoffs: Tuple[int, ...] = (2000, 10000)
    factor: float = 4.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        cuts = [c for c in self.cutoffs if c < self.vocab_size]
        self.bounds = tuple(cuts) + (self.vocab_size,)
        self.n_clusters = len(self.bounds) - 1
        head_size = self.bounds[0] + self.n_clusters
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.head = nn.Dense(head_size, use_bias=False, name="head", **common)
        tails_proj, tails_out = [], []
        for i in range(self.n_clusters):
            dim = max(int(self.input_dim // (self.factor ** (i + 1))), 8)
            size = self.bounds[i + 1] - self.bounds[i]
            tails_proj.append(
                nn.Dense(dim, use_bias=False, name=f"tail_{i}_proj", **common)
            )
            tails_out.append(
                nn.Dense(size, use_bias=False, name=f"tail_{i}_out", **common)
            )
        self.tails_proj = tails_proj
        self.tails_out = tails_out

    def log_prob(self, x: jax.Array) -> jax.Array:
        """[..., D] -> full log-probabilities [..., V] (eval path)."""
        head_lp = jax.nn.log_softmax(
            self.head(x).astype(jnp.float32), axis=-1
        )
        parts = [head_lp[..., : self.bounds[0]]]
        for i in range(self.n_clusters):
            tail_lp = jax.nn.log_softmax(
                self.tails_out[i](self.tails_proj[i](x)).astype(jnp.float32),
                axis=-1,
            )
            gate = head_lp[..., self.bounds[0] + i : self.bounds[0] + i + 1]
            parts.append(gate + tail_lp)
        return jnp.concatenate(parts, axis=-1)

    def nll(self, x: jax.Array, target: jax.Array) -> jax.Array:
        """Per-position negative log-likelihood [...], clustered evaluation."""
        head_lp = jax.nn.log_softmax(self.head(x).astype(jnp.float32), axis=-1)
        in_head = target < self.bounds[0]
        head_tgt = jnp.clip(target, 0, self.bounds[0] - 1)
        nll = -jnp.take_along_axis(head_lp, head_tgt[..., None], axis=-1)[..., 0]
        for i in range(self.n_clusters):
            lo, hi = self.bounds[i], self.bounds[i + 1]
            in_cluster = (target >= lo) & (target < hi)
            tail_lp = jax.nn.log_softmax(
                self.tails_out[i](self.tails_proj[i](x)).astype(jnp.float32),
                axis=-1,
            )
            local = jnp.clip(target - lo, 0, hi - lo - 1)
            cluster_nll = (
                -head_lp[..., self.bounds[0] + i]
                - jnp.take_along_axis(tail_lp, local[..., None], axis=-1)[..., 0]
            )
            nll = jnp.where(in_cluster, cluster_nll, nll)
        return jnp.where(in_head, nll, nll)  # head case already in nll
