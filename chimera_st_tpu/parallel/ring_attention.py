"""Ring attention: exact self-attention with the sequence axis sharded over
a device mesh.

The reference has NO sequence/context parallelism (SURVEY.md §2.6 — its
long-audio answer is the interlingua bottleneck + ~1280x downsampling), so
this is a TPU-native EXTENSION for long-audio encoder configs: each device
holds a [B, T/P, H, D] shard of Q/K/V; K/V (and the key padding mask) rotate
around the ICI ring via ``ppermute`` while a numerically-stable running
softmax (flash-attention style m/l/o accumulators) folds in one block per
tick. P ticks see every key exactly once — the result is EXACT attention,
with O(T/P) activation memory per device and compute/communication overlap
left to XLA's latency-hiding scheduler.

Differentiable as-is: autodiff through ``lax.scan`` + ``ppermute`` (the
transpose of a ring rotation is the reverse rotation) — no custom VJP.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def _ring_attention_local(q, k, v, kv_valid, axis_name: str, scale: float):
    """Per-device body (runs inside shard_map).

    q/k/v: [B, Tl, H, D] local blocks; kv_valid: [B, Tl] True = real token.
    Returns [B, Tl, H, D]."""
    n_dev = jax.lax.psum(1, axis_name)
    ix = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    B, Tl, H, D = q.shape
    # derive the accumulators from q so they carry q's varying-over-`seq`
    # type (shard_map tracks varying manual axes through the scan carry)
    m0 = jnp.full_like(q[:, :, :, 0], -jnp.inf, dtype=jnp.float32)
    l0 = jnp.zeros_like(m0)
    o0 = jnp.zeros_like(q, dtype=jnp.float32)

    def tick(carry, _):
        k_blk, v_blk, valid_blk, m, l, o = carry
        # scores over the CURRENT resident key block, fp32 for stability
        s = jnp.einsum(
            "bqhd,bkhd->bqkh", q.astype(jnp.float32),
            k_blk.astype(jnp.float32),
        ) * scale
        s = jnp.where(valid_blk[:, None, :, None], s, -jnp.inf)
        blk_max = jnp.max(s, axis=2)  # [B, Tq, H]
        m_new = jnp.maximum(m, blk_max)
        # all-pad blocks keep m at -inf; exp(-inf - -inf) guards below
        safe_m = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(jnp.where(jnp.isfinite(s), s - safe_m[:, :, None, :], -jnp.inf))
        p = jnp.where(jnp.isfinite(s), p, 0.0)
        corr = jnp.where(jnp.isfinite(m), jnp.exp(m - safe_m), 0.0)
        l = l * corr + jnp.sum(p, axis=2)
        o = o * corr[..., None] + jnp.einsum(
            "bqkh,bkhd->bqhd", p, v_blk.astype(jnp.float32)
        )
        # rotate K/V/mask one step around the ring
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        valid_blk = jax.lax.ppermute(valid_blk, axis_name, perm)
        return (k_blk, v_blk, valid_blk, m_new, l, o), None

    (k_f, v_f, valid_f, m, l, o), _ = jax.lax.scan(
        tick, (k, v, kv_valid, m0, l0, o0), None, length=n_dev
    )
    del ix, k_f, v_f, valid_f
    out = o / jnp.maximum(l[..., None], 1e-9)
    return out.astype(q.dtype)


def ring_self_attention(
    q: jax.Array,  # [B, T, H, D], T divisible by mesh[axis]
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    padding_mask: Optional[jax.Array] = None,  # [B, T] True = PAD
    axis: str = "seq",
) -> jax.Array:
    """Exact multi-head self-attention with T sharded over ``mesh[axis]``.

    Inputs may be unsharded (XLA inserts the scatter) or already carry a
    ``P(None, axis)`` sharding; output shape/sharding mirrors q."""
    B, T, H, D = q.shape
    n = mesh.shape[axis]
    assert T % n == 0, f"sequence length {T} must divide the {axis} axis {n}"
    valid = (
        jnp.ones((B, T), bool) if padding_mask is None else ~padding_mask
    )
    scale = 1.0 / float(D) ** 0.5
    spec = P(None, axis, None, None)
    fn = shard_map(
        partial(_ring_attention_local, axis_name=axis, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec, P(None, axis)),
        out_specs=spec,
    )
    return fn(q, k, v, valid)
