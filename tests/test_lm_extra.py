"""lstm_lm / lightconv_lm / simple_lstm / rnn_classifier — the model-zoo tail
(reference: models/lstm_lm.py, lightconv_lm.py, simple_lstm.py,
rnn_classifier.py). Each test trains/evaluates through the real criterion
surface, not just a forward shape check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import chimera_st_tpu.criterions  # noqa: F401
import chimera_st_tpu.tasks  # noqa: F401 — lm_cross_entropy lives in the LM task module
import chimera_st_tpu.models  # noqa: F401 — registration
from chimera_st_tpu.config.registry import ARCHITECTURES, CRITERIONS
from chimera_st_tpu.models import build_model_from_arch

V = 20


def _lm_batch(rng, B=4, T=12):
    tgt = rng.integers(4, V, size=(B, T)).astype(np.int32)
    src = np.concatenate([np.full((B, 1), 2, np.int32), tgt[:, :-1]], axis=1)
    return {
        "net_tokens": jnp.asarray(src),
        "target": jnp.asarray(tgt),
        "ntokens": jnp.asarray(float(B * T)),
    }


@pytest.mark.parametrize("arch,extra", [
    ("lstm_lm", {"embed_dim": 16, "hidden_size": 16, "layers": 2}),
    ("lightconv_lm", {"embed_dim": 16, "ffn_dim": 32, "layers": 2,
                      "heads": 2, "kernel_sizes": (3, 5)}),
    ("dynamicconv_lm", {"embed_dim": 16, "ffn_dim": 32, "layers": 1,
                        "heads": 2, "kernel_sizes": (3,)}),
])
def test_lm_variants_train_step(arch, extra):
    rng = np.random.default_rng(0)
    model = build_model_from_arch(arch, {"vocab_size": V, **extra})
    batch = _lm_batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch["net_tokens"])
    crit = CRITERIONS.get("lm_cross_entropy")({"padding_idx": 1})
    loss, ss, logging = crit(model, params, batch, train=False)
    assert np.isfinite(float(loss)) and float(ss) > 0
    g = jax.grad(lambda p: crit(model, p, batch, train=False)[0])(params)
    assert all(
        np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g)
    )


def test_lm_causality():
    """Changing a future token must not change past logits (both conv/LSTM)."""
    for arch, extra in [
        ("lstm_lm", {"embed_dim": 16, "hidden_size": 16, "layers": 1}),
        ("lightconv_lm", {"embed_dim": 16, "ffn_dim": 32, "layers": 1,
                          "heads": 2, "kernel_sizes": (5,)}),
    ]:
        model = build_model_from_arch(arch, {"vocab_size": V, **extra})
        t1 = jnp.asarray([[2, 4, 5, 6, 7, 8]], jnp.int32)
        t2 = t1.at[0, 4].set(9)
        params = model.init(jax.random.PRNGKey(0), t1)
        l1 = np.asarray(model.apply(params, t1))
        l2 = np.asarray(model.apply(params, t2))
        np.testing.assert_allclose(l1[0, :4], l2[0, :4], atol=1e-5, err_msg=arch)
        assert not np.allclose(l1[0, 4:], l2[0, 4:])


def test_simple_lstm_seq2seq():
    model = build_model_from_arch("simple_lstm", {
        "src_vocab_size": V, "tgt_vocab_size": V,
        "embed_dim": 16, "hidden_size": 16,
    })
    assert model.cfg.attention is False
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.integers(4, V, size=(2, 5)), jnp.int32)
    prev = jnp.asarray(rng.integers(4, V, size=(2, 4)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, prev)
    logits = model.apply(params, src, prev)
    assert logits.shape == (2, 4, V)
    assert np.isfinite(np.asarray(logits)).all()


def test_rnn_classifier_learns_parity_of_first_token():
    """Train the toy classifier on a separable rule: class = (first token
    is even). A few dozen steps must push accuracy to 1.0 on train data."""
    import optax

    model = build_model_from_arch("rnn_classifier", {
        "vocab_size": V, "num_classes": 2,
        "embed_dim": 16, "hidden_size": 16,
    })
    rng = np.random.default_rng(2)
    toks = rng.integers(4, V, size=(32, 6)).astype(np.int32)
    labels = (toks[:, 0] % 2 == 0).astype(np.int64)
    toks_j, labels_j = jnp.asarray(toks), jnp.asarray(labels)
    params = model.init(jax.random.PRNGKey(0), toks_j)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            lp = model.apply(p, toks_j)
            return -jnp.mean(jnp.take_along_axis(lp, labels_j[:, None], -1))

        g = jax.grad(loss_fn)(params)
        updates, opt = tx.update(g, opt, params)
        return jax.tree_util.tree_map(
            lambda p, u: p + u, params, updates
        ), opt

    for _ in range(60):
        params, opt = step(params, opt)
    pred = np.asarray(jnp.argmax(model.apply(params, toks_j), -1))
    assert (pred == labels).mean() == 1.0


def test_archs_registered():
    for arch in ("lstm_lm", "lightconv_lm", "dynamicconv_lm", "simple_lstm",
                 "rnn_classifier"):
        assert arch in ARCHITECTURES, arch
