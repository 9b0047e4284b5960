"""Model-zoo breadth: bart / lstm / fconv / lightconv MT assemblies
(VERDICT r1 missing #5; references: fairseq/models/{bart/model,lstm,fconv,
lightconv}.py). Each arch registers, builds, produces finite teacher-forced
logits of the right shape, and trains one step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_st_tpu.models import build_model_from_arch

V_SRC, V_TGT = 20, 22
B, S, T = 2, 7, 5

TINY = {
    "src_vocab_size": V_SRC,
    "tgt_vocab_size": V_TGT,
}


def _data(rng):
    src = jnp.asarray(rng.integers(4, V_SRC, size=(B, S)), jnp.int32)
    prev = jnp.asarray(rng.integers(4, V_TGT, size=(B, T)), jnp.int32)
    return src, prev


ARCHS = [
    ("bart_base", {**TINY, "encoder_embed_dim": 16, "encoder_ffn_dim": 32,
                   "encoder_layers": 1, "encoder_heads": 2,
                   "decoder_embed_dim": 16, "decoder_ffn_dim": 32,
                   "decoder_layers": 1, "decoder_heads": 2}),
    ("lstm", {**TINY, "embed_dim": 16, "hidden_size": 16,
              "bidirectional": True}),
    ("fconv_iwslt_de_en", {**TINY, "embed_dim": 16,
                           "encoder_layers": ((16, 3), (16, 3)),
                           "decoder_layers": ((16, 3),),
                           "decoder_out_embed_dim": 16}),
    ("lightconv_iwslt_de_en", {**TINY, "embed_dim": 16, "ffn_dim": 32,
                               "encoder_layers": 2, "decoder_layers": 2,
                               "heads": 2}),
    ("dynamicconv_iwslt_de_en", {**TINY, "embed_dim": 16, "ffn_dim": 32,
                                 "encoder_layers": 2, "decoder_layers": 2,
                                 "heads": 2}),
]


@pytest.mark.parametrize("arch,cfg", ARCHS, ids=[a for a, _ in ARCHS])
def test_zoo_forward_and_grad(arch, cfg):
    rng = np.random.default_rng(0)
    model = build_model_from_arch(arch, cfg)
    src, prev = _data(rng)
    params = model.init(jax.random.PRNGKey(0), src, prev)
    logits = model.apply(params, src, prev)
    assert logits.shape == (B, T, V_TGT)
    assert np.isfinite(np.asarray(logits)).all()

    # one grad step through the standard criterion surface
    def loss_fn(p):
        lg = model.apply(p, src, prev, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(1)})
        lp = jax.nn.log_softmax(lg.astype(jnp.float32), -1)
        return -jnp.mean(jnp.take_along_axis(lp, prev[..., None], -1))

    g = jax.grad(loss_fn)(params)
    gn = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_causality_of_conv_decoders():
    """fconv/lightconv decoders must be causal: logits at position t do not
    change when future target tokens change."""
    rng = np.random.default_rng(1)
    for arch, cfg in (ARCHS[2], ARCHS[3]):
        model = build_model_from_arch(arch, cfg)
        src, prev = _data(rng)
        params = model.init(jax.random.PRNGKey(0), src, prev)
        out1 = np.asarray(model.apply(params, src, prev))
        prev2 = prev.at[:, -1].set(5)
        out2 = np.asarray(model.apply(params, src, prev2))
        np.testing.assert_allclose(out1[:, :-1], out2[:, :-1], atol=1e-5,
                                   err_msg=arch)


def test_bart_classification_head():
    cfg = dict(ARCHS[0][1])
    cfg["num_classes"] = 3
    model = build_model_from_arch("bart_base", cfg)
    rng = np.random.default_rng(2)
    src, prev = _data(rng)
    prev = prev.at[:, -1].set(2)  # eos pooling position
    params = model.init(jax.random.PRNGKey(0), src, prev, method=type(model).classify)
    logits = model.apply(params, src, prev, method=type(model).classify)
    assert logits.shape == (B, 3)
    assert np.isfinite(np.asarray(logits)).all()


def test_bart_uses_learned_positions():
    model = build_model_from_arch("bart_base", ARCHS[0][1])
    rng = np.random.default_rng(3)
    src, prev = _data(rng)
    params = model.init(jax.random.PRNGKey(0), src, prev)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = ["/".join(str(getattr(k, "key", k)) for k in path) for path, _ in flat]
    assert any("embed_positions" in n for n in names)
    assert any("layernorm_embedding" in n for n in names)


def test_fconv_lm():
    """Decoder-only conv LM: causal, finite logits, next-token-shaped
    (reference: fairseq/models/fconv_lm.py)."""
    model = build_model_from_arch("fconv_lm", {
        "vocab_size": 20, "embed_dim": 16,
        "layers": ((16, 3), (16, 3)), "out_embed_dim": 16,
    })
    rng = np.random.default_rng(9)
    toks = jnp.asarray(rng.integers(4, 20, size=(2, 7)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), toks)
    out = np.asarray(model.apply(params, toks))
    assert out.shape == (2, 7, 20)
    # causal: perturbing the last token leaves earlier logits unchanged
    out2 = np.asarray(model.apply(params, toks.at[:, -1].set(5)))
    np.testing.assert_allclose(out[:, :-1], out2[:, :-1], atol=1e-5)
