"""Ring attention (sequence-parallel exact attention over a mesh `seq`
axis; TPU-native extension — the reference has no SP/CP, SURVEY.md §2.6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from chimera_st_tpu.parallel.ring_attention import ring_self_attention


def _reference_attention(q, k, v, padding_mask=None):
    s = jnp.einsum("bqhd,bkhd->bqkh", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / np.sqrt(q.shape[-1])
    if padding_mask is not None:
        s = jnp.where(padding_mask[:, None, :, None], -jnp.inf, s)
    p = jax.nn.softmax(s, axis=2)
    return jnp.einsum("bqkh,bkhd->bqhd", p, v.astype(jnp.float32)).astype(q.dtype)


def _mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]).reshape(n), ("seq",))


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    B, T, H, D = 2, 32, 4, 8
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    return q, k, v


@pytest.mark.quick
def test_ring_attention_matches_dense(qkv):
    """8-way sequence sharding must be EXACT attention (running-softmax
    algebra), not an approximation."""
    q, k, v = qkv
    mesh = _mesh(8)
    out = ring_self_attention(q, k, v, mesh)
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.quick
def test_ring_attention_padding_mask(qkv):
    """Key padding is honored across shard boundaries, including a shard
    whose keys are ALL pad (the -inf/correction guards)."""
    q, k, v = qkv
    B, T = q.shape[:2]
    pad = np.zeros((B, T), bool)
    pad[0, T // 2:] = True   # second half of sentence 0 (entire shards) padded
    pad[1, -3:] = True
    pad = jnp.asarray(pad)
    mesh = _mesh(8)
    out = ring_self_attention(q, k, v, mesh, padding_mask=pad)
    ref = _reference_attention(q, k, v, padding_mask=pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.quick
def test_ring_attention_differentiable(qkv):
    """Grads flow through the scan + ppermute ring and match the dense
    attention's grads."""
    q, k, v = qkv
    mesh = _mesh(4)

    def loss_ring(q, k, v):
        return jnp.sum(ring_self_attention(q, k, v, mesh) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.quick
def test_ring_attention_rejects_ragged_split(qkv):
    q, k, v = qkv
    mesh = _mesh(8)
    with pytest.raises(AssertionError):
        ring_self_attention(q[:, :30], k[:, :30], v[:, :30], mesh)
