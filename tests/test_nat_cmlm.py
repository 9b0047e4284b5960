import jax
import jax.numpy as jnp
import numpy as np
import pytest

import chimera_st_tpu.criterions  # noqa: F401
from chimera_st_tpu.config.registry import CRITERIONS
from chimera_st_tpu.criterions.nat_loss import cmlm_mask_target
from chimera_st_tpu.models import build_model_from_arch
from chimera_st_tpu.models.nat_cmlm import CMLMConfig, CMLMTransformer

TINY = CMLMConfig(
    src_vocab_size=20, tgt_vocab_size=20,
    encoder_embed_dim=16, encoder_ffn_dim=32, encoder_layers=1, encoder_heads=2,
    decoder_embed_dim=16, decoder_ffn_dim=32, decoder_layers=1, decoder_heads=2,
    max_predicted_length=16,
)


@pytest.fixture(scope="module")
def setup():
    model = CMLMTransformer(TINY)
    src = jnp.asarray([[4, 5, 6, 2], [7, 8, 2, 1]], jnp.int32)
    masked = jnp.asarray([[3, 5, 3, 2], [3, 3, 2, 1]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, masked)
    return model, params, src


def test_bidirectional_decoder(setup):
    """Non-causal: changing a LATER target token must change EARLIER logits."""
    model, params, src = setup
    t1 = jnp.asarray([[3, 5, 6, 2]], jnp.int32)
    t2 = jnp.asarray([[3, 5, 9, 2]], jnp.int32)
    l1, _ = model.apply(params, src[:1], t1)
    l2, _ = model.apply(params, src[:1], t2)
    assert not np.allclose(np.asarray(l1[0, 0]), np.asarray(l2[0, 0]), atol=1e-6)


def test_cmlm_mask_target():
    rng = np.random.default_rng(0)
    tgt = np.asarray([4, 5, 6, 7, 2, 1, 1], np.int32)
    m = cmlm_mask_target(tgt, mask_idx=3, rng=rng)
    assert (m[tgt == 1] == 1).all()  # pads untouched
    assert (m == 3).sum() >= 1
    kept = m != 3
    assert (m[kept] == tgt[kept]).all()


def test_nat_loss_and_grads(setup):
    model, params, src = setup
    rng = np.random.default_rng(1)
    tgt = np.asarray([[4, 5, 6, 2], [7, 8, 2, 1]], np.int32)
    masked = np.stack([cmlm_mask_target(t, 3, rng=rng) for t in tgt])
    batch = {
        "src_tokens": src,
        "target": jnp.asarray(tgt),
        "masked_target": jnp.asarray(masked),
        "target_lengths": jnp.asarray([4, 3], jnp.int32),
        "ntokens": 7.0,
    }
    crit = CRITERIONS.get("nat_loss")({"mask_idx": 3})
    loss, ss, logging = crit(model, params, batch, train=False)
    assert np.isfinite(float(loss)) and float(ss) >= 1
    g = jax.grad(lambda p: crit(model, p, batch, train=False)[0])(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree_util.tree_leaves(g))


def test_mask_predict_decode(setup):
    model, params, src = setup
    tokens, lengths = model.apply(
        params, src, 4, 8, method=CMLMTransformer.mask_predict
    )
    t, l = np.asarray(tokens), np.asarray(lengths)
    assert t.shape == (2, 8)
    assert (l >= 1).all() and (l <= 8).all()
    # no mask tokens survive; padding beyond length
    for b in range(2):
        assert (t[b, : l[b]] != 3).all()
        assert (t[b, l[b]:] == 1).all()


def test_cmlm_arch_registry():
    m = build_model_from_arch(
        "cmlm_transformer",
        {"src_vocab_size": 10, "tgt_vocab_size": 10, "encoder_layers": 1,
         "decoder_layers": 1},
    )
    assert m.cfg.decoder_causal is False or True  # built via CMLMConfig
    assert m.cfg.encoder_embed_dim == 512
