import jax
import jax.numpy as jnp
import numpy as np

import chimera_st_tpu.criterions  # noqa: F401
from chimera_st_tpu.config.registry import CRITERIONS
from chimera_st_tpu.models.adaptive_softmax import AdaptiveSoftmax
from chimera_st_tpu.models.transformer_mt import TransformerLM, TransformerLMConfig


def test_log_prob_normalizes():
    m = AdaptiveSoftmax(vocab_size=50, input_dim=16, cutoffs=(10, 30))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 16)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, method=AdaptiveSoftmax.log_prob)
    lp = m.apply(params, x, method=AdaptiveSoftmax.log_prob)
    assert lp.shape == (2, 5, 50)
    np.testing.assert_allclose(
        np.asarray(jax.nn.logsumexp(lp, axis=-1)), 0.0, atol=1e-5
    )


def test_nll_matches_log_prob():
    m = AdaptiveSoftmax(vocab_size=50, input_dim=16, cutoffs=(10, 30))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 4, 16)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, 50, size=(3, 4)), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), x, method=AdaptiveSoftmax.log_prob)
    lp = np.asarray(m.apply(params, x, method=AdaptiveSoftmax.log_prob))
    nll = np.asarray(m.apply(params, x, tgt, method=AdaptiveSoftmax.nll))
    expect = -np.take_along_axis(lp, np.asarray(tgt)[..., None], axis=-1)[..., 0]
    np.testing.assert_allclose(nll, expect, atol=1e-5)


def test_adaptive_lm_trains():
    cfg = TransformerLMConfig(vocab_size=40, embed_dim=16, ffn_dim=32, layers=1,
                              heads=2, adaptive_softmax_cutoffs=(10, 25))
    lm = TransformerLM(cfg)
    rng = np.random.default_rng(2)
    net = jnp.asarray(rng.integers(4, 40, size=(2, 6)), jnp.int32)
    tgt = jnp.asarray(rng.integers(4, 40, size=(2, 6)), jnp.int32)
    params = lm.init(jax.random.PRNGKey(0), net)
    crit = CRITERIONS.get("adaptive_loss")({"padding_idx": 1})
    batch = {"net_tokens": net, "target": tgt, "ntokens": 12.0}
    loss, ss, logging = crit(lm, params, batch, train=False)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: crit(lm, p, batch, train=False)[0])(params)
    # gradient reaches the adaptive tail projections
    gt = g["params"]["adaptive_softmax"]["tail_0_proj"]["kernel"]
    assert float(jnp.abs(gt).sum()) > 0
