"""Fused conv-tail Pallas kernel parity vs the XLA composition
(reference: wav2vec2.py:685 ConvFeatureExtractionModel layers 1-6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_st_tpu.ops.pallas_conv import (
    CH,
    TAIL_SPEC,
    conv_tail_fused_windows,
    conv_tail_reference,
)


def _weights(rng):
    return [
        jnp.asarray(rng.normal(scale=0.05, size=(k, CH, CH)), jnp.float32)
        for k, _ in TAIL_SPEC
    ]


@pytest.mark.parametrize("t1", [2100, 4200])
def test_fused_tail_matches_xla(t1):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, t1, CH)) * 0.5, jnp.float32)
    ws = _weights(rng)
    ref = conv_tail_reference(x, ws)
    got = conv_tail_fused_windows(x, ws, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_fused_tail_output_lengths():
    rng = np.random.default_rng(1)
    for t1 in (2063, 3000):
        x = jnp.asarray(rng.normal(size=(1, t1, CH)), jnp.float32)
        ws = _weights(rng)
        ref = conv_tail_reference(x, ws)
        got = conv_tail_fused_windows(x, ws, interpret=True)
        assert got.shape == ref.shape


def test_fused_tail_grad_matches_xla():
    """Differentiable wrapper: Pallas forward, XLA-composition backward."""
    from chimera_st_tpu.ops.pallas_conv import fused_conv_tail

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 700, CH)) * 0.5, jnp.float32)
    ws = _weights(rng)

    def loss_fused(x, ws):
        return jnp.mean(fused_conv_tail(x, ws, interpret=True) ** 2)

    def loss_ref(x, ws):
        return jnp.mean(conv_tail_reference(x, ws) ** 2)

    gx, gw = jax.grad(loss_fused, argnums=(0, 1))(x, ws)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, ws)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-4)
    for a, b in zip(gw, rw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_extractor_pallas_tail_checkpoint_compatible():
    """Flag on/off: identical param trees, matching features (the fused tail
    is an execution-schedule change behind CHIMERA_PALLAS_CONV)."""
    from chimera_st_tpu.models.wav2vec2 import ConvFeatureExtractor

    rng = np.random.default_rng(3)
    audio = jnp.asarray(rng.normal(size=(2, 4000)), jnp.float32)
    off = ConvFeatureExtractor(use_pallas_tail=False)
    on = ConvFeatureExtractor(use_pallas_tail=True)
    v_off = off.init(jax.random.PRNGKey(0), audio)
    v_on = on.init(jax.random.PRNGKey(0), audio)

    paths_off = {jax.tree_util.keystr(p): l.shape
                 for p, l in jax.tree_util.tree_leaves_with_path(v_off)}
    paths_on = {jax.tree_util.keystr(p): l.shape
                for p, l in jax.tree_util.tree_leaves_with_path(v_on)}
    assert paths_off == paths_on

    y_off = off.apply(v_off, audio)
    y_on = on.apply(v_off, audio)  # same params through the fused path
    assert y_on.shape == y_off.shape
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                               atol=2e-3, rtol=2e-3)
