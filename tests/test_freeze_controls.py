"""Fine-tune freeze controls: frozen subtrees stay bit-identical across
updates; feature_grad_mult scales extractor gradients exactly
(reference: w2v2_transformer_interlingua.py:106-124, wav2vec2.py:529-532)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_st_tpu.config.registry import CRITERIONS
from chimera_st_tpu.models.interlingua import ChimeraInterlinguaModel
from chimera_st_tpu.models.wav2vec2 import grad_multiply
from chimera_st_tpu.optim import build_lr_schedule, build_optimizer
from chimera_st_tpu.optim.freeze import (
    freeze_labels,
    frozen_fraction,
    reset_encoder_subtrees,
    wrap_freeze,
)
from chimera_st_tpu.train import make_train_step
from chimera_st_tpu.train.train_step import create_train_state
from tests.test_interlingua_model import TINY
from tests.test_train_step import _make_batch


def _leaves_under(params, pred):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    picked = {}
    for path, leaf in flat:
        keys = tuple(
            str(getattr(e, "key", getattr(e, "idx", e))) for e in path
        )
        if keys and keys[0] == "params":
            keys = keys[1:]
        if pred(keys):
            picked["/".join(keys)] = np.asarray(leaf)
    return picked


def _train_n_steps(model, params, batch, fixes, n=3):
    crit = CRITERIONS.get("triplet_st_mt_contrastive")(
        {"label_smoothing": 0.1, "loss_ratio": (1.0, 1.0, 1.0)}
    )
    tx = build_optimizer(
        {"_name": "adam"}, build_lr_schedule({"_name": "fixed", "lr": 1e-2})
    )
    tx = wrap_freeze(tx, params, fixes)
    step = make_train_step(model, crit, tx, donate=False)
    state = create_train_state(params, tx)
    for i in range(n):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        assert float(metrics["nonfinite_grad"]) == 0.0
    return state


@pytest.mark.parametrize(
    "fix,pred,anti",
    [
        (
            "fix_wav2vec",
            lambda p: p and p[0] == "wav2vec_model",
            lambda p: p and p[0] == "decoder",
        ),
        (
            "fix_decoder",
            lambda p: p and p[0] == "decoder",
            lambda p: p and p[0] == "wav2vec_model",
        ),
        (
            "fix_interlingua",
            lambda p: p
            and (
                p[0].startswith("interlingua_layers_")
                or p[0] == "interlingua_embedding"
            ),
            lambda p: p and p[0] == "decoder",
        ),
    ],
)
def test_frozen_subtree_is_bit_identical(fix, pred, anti):
    model = ChimeraInterlinguaModel(TINY)
    rng = np.random.default_rng(0)
    batch = _make_batch(rng)
    params = model.init(
        jax.random.PRNGKey(0),
        batch["audio"][:1],
        batch["audio_padding_mask"][:1],
        batch["src_text"][:1],
        batch["prev_output_tokens"][:1],
        method=ChimeraInterlinguaModel.init_everything,
    )
    before_frozen = _leaves_under(params, pred)
    before_live = _leaves_under(params, anti)
    assert before_frozen and before_live
    state = _train_n_steps(model, params, batch, [fix])
    after_frozen = _leaves_under(state.params, pred)
    after_live = _leaves_under(state.params, anti)
    for k in before_frozen:
        np.testing.assert_array_equal(before_frozen[k], after_frozen[k])
    moved = any(
        not np.array_equal(before_live[k], after_live[k]) for k in before_live
    )
    assert moved, "non-frozen subtree did not train"


def test_fix_decoder_transformers_spares_embeddings():
    model = ChimeraInterlinguaModel(TINY)
    rng = np.random.default_rng(0)
    batch = _make_batch(rng)
    params = model.init(
        jax.random.PRNGKey(0),
        batch["audio"][:1],
        batch["audio_padding_mask"][:1],
        batch["src_text"][:1],
        batch["prev_output_tokens"][:1],
        method=ChimeraInterlinguaModel.init_everything,
    )
    layer_pred = lambda p: (
        len(p) >= 2 and p[0] == "decoder" and p[1].startswith("layers_")
    )
    embed_pred = lambda p: (
        len(p) >= 2 and p[0] == "decoder" and p[1] == "embed_tokens"
    )
    before_layers = _leaves_under(params, layer_pred)
    before_embed = _leaves_under(params, embed_pred)
    state = _train_n_steps(model, params, batch, ["fix_decoder_transformers"])
    after_layers = _leaves_under(state.params, layer_pred)
    after_embed = _leaves_under(state.params, embed_pred)
    for k in before_layers:
        np.testing.assert_array_equal(before_layers[k], after_layers[k])
    # decoder embeddings (outside .layers) keep training
    moved = any(
        not np.array_equal(before_embed[k], after_embed[k])
        for k in before_embed
    )
    assert moved


def test_frozen_fraction_and_labels():
    model = ChimeraInterlinguaModel(TINY)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 400), jnp.float32),
        jnp.zeros((1, 400), bool),
        jnp.full((1, 4), 2, jnp.int32),
        jnp.full((1, 4), 2, jnp.int32),
        method=ChimeraInterlinguaModel.init_everything,
    )
    frac = frozen_fraction(params, ["fix_wav2vec"])
    assert 0.0 < frac < 1.0
    labels = freeze_labels(params, ["fix_wav2vec"])
    vals = set(jax.tree_util.tree_leaves(labels))
    assert vals == {"train", "freeze"}


def test_feature_grad_mult_scales_gradients():
    scale = 0.1

    def loss_at(s):
        def f(x):
            y = grad_multiply(x, s)
            return jnp.sum(y**2)

        return jax.grad(f)(jnp.arange(4.0))

    np.testing.assert_allclose(loss_at(scale), scale * loss_at(1.0), rtol=1e-6)
    np.testing.assert_array_equal(loss_at(0.0), np.zeros(4))


def test_feature_grad_mult_zero_freezes_extractor_only():
    import dataclasses

    cfg = dataclasses.replace(TINY, feature_grad_mult=0.0)
    model = ChimeraInterlinguaModel(cfg)
    rng = np.random.default_rng(0)
    batch = _make_batch(rng)
    params = model.init(
        jax.random.PRNGKey(0),
        batch["audio"][:1],
        batch["audio_padding_mask"][:1],
        batch["src_text"][:1],
        batch["prev_output_tokens"][:1],
        method=ChimeraInterlinguaModel.init_everything,
    )
    extractor_pred = lambda p: (
        len(p) >= 2 and p[0] == "wav2vec_model" and p[1] == "feature_extractor"
    )
    trunk_pred = lambda p: (
        len(p) >= 2 and p[0] == "wav2vec_model" and p[1].startswith("layers_")
    )
    before_ext = _leaves_under(params, extractor_pred)
    before_trunk = _leaves_under(params, trunk_pred)
    state = _train_n_steps(model, params, batch, [])
    after_ext = _leaves_under(state.params, extractor_pred)
    after_trunk = _leaves_under(state.params, trunk_pred)
    for k in before_ext:
        np.testing.assert_array_equal(before_ext[k], after_ext[k])
    moved = any(
        not np.array_equal(before_trunk[k], after_trunk[k])
        for k in before_trunk
    )
    assert moved, "w2v2 transformer trunk should still train"


def test_reset_encoder_subtrees():
    model = ChimeraInterlinguaModel(TINY)
    mk = lambda seed: model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, 400), jnp.float32),
        jnp.zeros((1, 400), bool),
        jnp.full((1, 4), 2, jnp.int32),
        jnp.full((1, 4), 2, jnp.int32),
        method=ChimeraInterlinguaModel.init_everything,
    )
    restored, fresh = mk(0), mk(1)
    merged = reset_encoder_subtrees(restored, fresh)
    enc_pred = lambda p: p and p[0].startswith("transformer_layers_")
    other_pred = lambda p: p and p[0] == "decoder"
    m_enc = _leaves_under(merged, enc_pred)
    f_enc = _leaves_under(fresh, enc_pred)
    for k in m_enc:
        np.testing.assert_array_equal(m_enc[k], f_enc[k])
    m_dec = _leaves_under(merged, other_pred)
    r_dec = _leaves_under(restored, other_pred)
    for k in m_dec:
        np.testing.assert_array_equal(m_dec[k], r_dec[k])


def test_prune_layer_params_renumbers():
    """reference: checkpoint_utils.py:479 prune_state_dict — load a
    LayerDrop-trained deep stack into a shallower model by keeping the
    listed layers, renumbered consecutively."""
    from chimera_st_tpu.checkpoint.store import prune_layer_params

    tree = {f"layers_{i}": {"w": np.full((2,), i)} for i in range(6)}
    tree["embed_tokens"] = {"embedding": np.zeros((4, 2))}
    pruned = prune_layer_params(tree, "0,2,4")
    assert sorted(k for k in pruned if k.startswith("layers_")) == [
        "layers_0", "layers_1", "layers_2"
    ]
    np.testing.assert_array_equal(pruned["layers_1"]["w"], np.full((2,), 2))
    np.testing.assert_array_equal(pruned["layers_2"]["w"], np.full((2,), 4))
    assert "embed_tokens" in pruned
    with pytest.raises(KeyError):
        prune_layer_params(tree, [7])


def test_layerdrop_trains_and_infers():
    """LayerDrop (reference: fairseq/modules/layer_drop.py): training with
    rate>0 stays finite and stochastic across rngs; inference ignores it."""
    import dataclasses

    from chimera_st_tpu.models.transformer_decoder import TransformerDecoder

    dec = TransformerDecoder(vocab_size=12, embed_dim=16, ffn_dim=32,
                             num_layers=3, num_heads=2, layerdrop=0.5,
                             dropout=0.0, attention_dropout=0.0,
                             activation_dropout=0.0)
    prev = jnp.full((2, 5), 2, jnp.int32)
    enc = jnp.zeros((2, 4, 16))
    params = dec.init(jax.random.PRNGKey(0), prev, enc)
    # inference deterministic: layerdrop off
    a = dec.apply(params, prev, enc, deterministic=True)
    b = dec.apply(params, prev, enc, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training: different rngs give different layer subsets
    outs = [
        np.asarray(dec.apply(params, prev, enc, deterministic=False,
                             rngs={"dropout": jax.random.PRNGKey(s)}))
        for s in range(6)
    ]
    assert all(np.isfinite(o).all() for o in outs)
    assert any(not np.allclose(outs[0], o) for o in outs[1:])


def test_text_only_task_masks_audio_trunk_out_of_adam():
    """Torch-parity grad-None skip for the MT pre-train stage: the
    reference's Adam never materializes optimizer state for parameters
    whose .grad is None (fairseq/optim/adam.py:100-115 skips them), and in
    `--task translation` over the interlingua arch the audio trunk never
    receives gradients. auto_text_only_fixes must (a) fire only for
    text-only tasks on audio-trunk-bearing params, (b) keep the trunk
    bit-identical through text-batch updates while the text branch trains,
    and (c) carry NO moment arrays for the trunk in the adam state (the
    ~2.3 GB/update HBM saving is real, not notional)."""
    from chimera_st_tpu.optim.freeze import auto_text_only_fixes

    model = ChimeraInterlinguaModel(TINY)
    rng = np.random.default_rng(0)
    batch = _make_batch(rng)
    params = model.init(
        jax.random.PRNGKey(0),
        batch["audio"][:1],
        batch["audio_padding_mask"][:1],
        batch["src_text"][:1],
        batch["prev_output_tokens"][:1],
        method=ChimeraInterlinguaModel.init_everything,
    )

    class _TextTask:
        text_only = True

    class _AudioTask:
        text_only = False

    assert auto_text_only_fixes(_TextTask(), params) == ("fix_audio_trunk",)
    assert auto_text_only_fixes(_AudioTask(), params) == ()
    # a pure-text model (no trunk subtrees) must not get the mask
    assert auto_text_only_fixes(
        _TextTask(), {"params": {"decoder": {}, "text_embed_tokens": {}}}
    ) == ()

    trunk = lambda p: p and (  # noqa: E731
        p[0] in ("wav2vec_model", "subsample")
        or p[0].startswith("audio_exclusive_layers_")
    )
    text_side = lambda p: p and p[0] in (  # noqa: E731
        "decoder", "text_embed_tokens"
    )
    before_trunk = _leaves_under(params, trunk)
    before_text = _leaves_under(params, text_side)
    assert before_trunk and before_text

    # text-only MT step (label-smoothed CE over the text branch)
    crit = CRITERIONS.get("label_smoothed_cross_entropy")(
        {"label_smoothing": 0.1}
    )
    tx = build_optimizer(
        {"_name": "adam"}, build_lr_schedule({"_name": "fixed", "lr": 1e-2})
    )
    tx = wrap_freeze(tx, params, ["fix_audio_trunk"])
    step = make_train_step(model, crit, tx, donate=False)
    state = create_train_state(params, tx)
    text_batch = {
        "src_tokens": batch["src_text"],
        "prev_output_tokens": batch["prev_output_tokens"],
        "target": batch["target"],
        "ntokens": batch["ntokens"],
    }
    for i in range(2):
        state, metrics = step(state, text_batch, jax.random.PRNGKey(i))
        assert float(metrics["nonfinite_grad"]) == 0.0

    after_trunk = _leaves_under(state.params, trunk)
    after_text = _leaves_under(state.params, text_side)
    for k in before_trunk:
        np.testing.assert_array_equal(before_trunk[k], after_trunk[k])
    assert any(
        not np.array_equal(before_text[k], after_text[k]) for k in before_text
    ), "text branch did not train under the trunk mask"

    # (c): no adam moment ARRAYS exist for trunk params — count leaf arrays
    # in the optimizer state matching trunk param shapes; the masked
    # multi_transform must hold strictly fewer moment leaves than params
    n_params = len(jax.tree_util.tree_leaves(params))
    n_trunk = len(before_trunk)
    opt_leaf_shapes = [
        tuple(x.shape)
        for x in jax.tree_util.tree_leaves(state.opt_state)
        if hasattr(x, "shape") and x.ndim > 0
    ]
    n_trainable = n_params - n_trunk
    # adam holds mu+nu per trainable leaf; trunk leaves contribute nothing
    assert len(opt_leaf_shapes) <= 2 * n_trainable + 4, (
        f"opt state carries {len(opt_leaf_shapes)} arrays for "
        f"{n_trainable} trainable / {n_params} total param leaves — "
        "trunk moments were materialized"
    )
