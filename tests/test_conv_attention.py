import jax
import jax.numpy as jnp
import numpy as np

from chimera_st_tpu.models.conv_attention import (
    ConvAttentionLayer,
    DynamicConv,
    LightweightConv,
    apply_conv_weights,
)


def test_lightweight_conv_matches_manual():
    B, T, C, H, K = 1, 6, 4, 2, 3
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, T, C)), jnp.float32)
    conv = LightweightConv(C, K, H, causal=False, weight_softmax=False)
    params = conv.init(jax.random.PRNGKey(0), x)
    w = np.asarray(params["params"]["weight"])  # [H, K]
    out = np.asarray(conv.apply(params, x))
    # manual banded conv, same padding (pad_left = 1)
    xp = np.pad(np.asarray(x), ((0, 0), (1, 1), (0, 0)))
    expect = np.zeros((B, T, C))
    for t in range(T):
        for c in range(C):
            h = c // (C // H)
            for k in range(K):
                expect[0, t, c] += w[h, k] * xp[0, t + k, c]
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_causal_mode_no_future_leak():
    B, T, C = 1, 8, 8
    x = jnp.asarray(np.random.default_rng(1).normal(size=(B, T, C)), jnp.float32)
    conv = DynamicConv(C, kernel_size=3, num_heads=2, causal=True)
    params = conv.init(jax.random.PRNGKey(0), x)
    y1 = np.asarray(conv.apply(params, x))
    x2 = x.at[:, 5:, :].set(99.0)
    y2 = np.asarray(conv.apply(params, x2))
    np.testing.assert_allclose(y1[:, :5], y2[:, :5], atol=1e-5)


def test_dynamic_weights_softmax_normalized():
    B, T, C = 2, 5, 8
    x = jnp.asarray(np.random.default_rng(2).normal(size=(B, T, C)), jnp.float32)
    conv = DynamicConv(C, kernel_size=3, num_heads=2, weight_softmax=True)
    params = conv.init(jax.random.PRNGKey(0), x)
    # constant input => softmax weights sum to 1 => output equals input value
    ones = jnp.ones((1, 5, 8))
    y = np.asarray(conv.apply(params, ones))
    inner = y[0, 2:3]  # positions with full kernel support
    np.testing.assert_allclose(inner, 1.0, atol=1e-5)


def test_conv_attention_layer_shapes():
    layer = ConvAttentionLayer(16, 32, kernel_size=3, num_heads=4, conv_type="dynamic")
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 7, 16)), jnp.float32)
    mask = jnp.zeros((2, 7), bool).at[1, 5:].set(True)
    params = layer.init(jax.random.PRNGKey(0), x, mask)
    y = layer.apply(params, x, mask)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
