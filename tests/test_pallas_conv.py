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
