"""Fused encoder attention kernel parity vs the XLA softmax(QK^T)V path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_st_tpu.ops.attention import dot_product_attention
from chimera_st_tpu.ops.pallas_attention import (
    flash_attention_applicable,
    fused_encoder_attention,
)


@pytest.mark.parametrize("T,H,D", [(64, 2, 32), (96, 4, 64)])
def test_fused_attention_matches_xla(T, H, D):
    rng = np.random.default_rng(0)
    B = 3
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    mask = np.zeros((B, T), bool)
    mask[1, T // 2 :] = True
    mask_j = jnp.asarray(mask)
    ref = dot_product_attention(q, k, v, key_padding_mask=mask_j)
    got = fused_encoder_attention(q, k, v, mask_j, float(D**-0.5),
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_attention_no_mask():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(2, 40, 2, 16)), jnp.float32)
    ref = dot_product_attention(q, q, q)
    got = fused_encoder_attention(q, q, q, None, float(16**-0.5),
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_applicability_gating():
    q = jnp.zeros((2, 64, 2, 16))
    k_cross = jnp.zeros((2, 16, 2, 16))
    # never on CPU backend
    assert not flash_attention_applicable(q, q, None, False, 0.0) or (
        jax.default_backend() == "tpu"
    )
    # causal / biased / dropout / cross-shape are excluded regardless
    assert not flash_attention_applicable(q, q, None, True, 0.0)
    assert not flash_attention_applicable(q, q, jnp.zeros(()), False, 0.0)
    assert not flash_attention_applicable(q, q, None, False, 0.1)
    assert not flash_attention_applicable(q, k_cross, None, False, 0.0)


def test_fused_attention_gradients_match_xla():
    """custom_vjp backward (XLA recompute) must match grads of the plain
    XLA attention — the training path runs through this when flash engages."""
    rng = np.random.default_rng(2)
    B, T, H, D = 2, 32, 2, 16
    q = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
    mask = np.zeros((B, T), bool)
    mask[0, 20:] = True
    mask_j = jnp.asarray(mask)
    scale = float(D**-0.5)

    def loss_flash(q, k, v):
        out = fused_encoder_attention(q, k, v, mask_j, scale, interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_xla(q, k, v):
        out = dot_product_attention(q, k, v, key_padding_mask=mask_j)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
