"""Quantization (scalar int8 QAT + product quantization + quant-noise) and
the auxiliary modules (VGGBlock, AdaptiveInput, sparse attention mask)
(VERDICT r1 missing #7 + modules tail; references:
fairseq/modules/quantization/{scalar,pq}, quant_noise.py, vggblock.py,
adaptive_input.py, sparse_multihead_attention.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_st_tpu.ops.quantization import (
    fake_quant,
    int8_params,
    pq_dequantize,
    pq_quantize,
    quant_noise,
    quantize_params_pq,
    quantize_params_scalar,
)


def test_fake_quant_roundtrip_and_ste():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 32)) * 0.1, jnp.float32)
    scale, zero = int8_params(x)
    q = fake_quant(x, scale, zero)
    # 8-bit error bound: half a quantization step
    assert float(jnp.max(jnp.abs(q - x))) <= float(scale) * 0.51
    # straight-through gradient: d(sum(fake_quant(x)))/dx == 1
    g = jax.grad(lambda v: jnp.sum(fake_quant(v, scale, zero)))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_quantize_params_scalar_tree():
    rng = np.random.default_rng(1)
    params = {
        "dense": {"kernel": jnp.asarray(rng.normal(size=(32, 32)), jnp.float32),
                  "bias": jnp.asarray(rng.normal(size=(32,)), jnp.float32)},
    }
    q = quantize_params_scalar(params, bits=8)
    assert not np.allclose(np.asarray(q["dense"]["kernel"]),
                           np.asarray(params["dense"]["kernel"]))
    # small vectors untouched
    np.testing.assert_array_equal(np.asarray(q["dense"]["bias"]),
                                  np.asarray(params["dense"]["bias"]))
    err = np.abs(np.asarray(q["dense"]["kernel"] - params["dense"]["kernel"]))
    assert err.max() < 0.05


def test_quant_noise_blocks():
    rng = np.random.default_rng(2)
    w = jnp.ones((32, 16))
    out = np.asarray(quant_noise(w, jax.random.PRNGKey(0), p=0.5, block_size=8))
    # entire 8-row blocks are zeroed together
    blocks = out.reshape(4, 8, 16)
    for b in range(4):
        for c in range(16):
            col = blocks[b, :, c]
            assert (col == 0).all() or (col != 0).all()
    # scaling keeps the expectation
    assert 1.0 <= out[out != 0].mean() <= 2.01


def test_pq_roundtrip_compresses():
    rng = np.random.default_rng(3)
    # weights drawn from few clusters -> PQ reconstructs well
    protos = rng.normal(size=(4, 8)).astype(np.float32)
    w = protos[rng.integers(0, 4, size=512)].reshape(64, 64)
    w = w + rng.normal(size=w.shape).astype(np.float32) * 0.01
    pq = pq_quantize(w, block_size=8, n_centroids=8, seed=0)
    rec = np.asarray(pq_dequantize(pq))
    assert rec.shape == w.shape
    assert np.abs(rec - w).mean() < 0.05
    # centroids are trainable: grads flow through dequantize
    g = jax.grad(lambda c: jnp.sum(pq_dequantize(pq._replace(centroids=c)) ** 2))(
        pq.centroids
    )
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0


def test_quantize_params_pq_tree():
    rng = np.random.default_rng(4)
    params = {"k": jnp.asarray(rng.normal(size=(128, 64)), jnp.float32),
              "b": jnp.asarray(rng.normal(size=(64,)), jnp.float32)}
    out, books = quantize_params_pq(params, block_size=8, n_centroids=32,
                                    min_size=1024)
    assert "k" in books and "b" not in books
    assert out["k"].shape == (128, 64)


def test_vggblock():
    from chimera_st_tpu.models.modules_extra import VGGBlock

    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 20, 16, 1)),
                    jnp.float32)
    blk = VGGBlock(out_channels=8, pooling_kernel_size=2)
    params = blk.init(jax.random.PRNGKey(0), x)
    y = blk.apply(params, x)
    assert y.shape == (2, 10, 8, 8)
    assert VGGBlock.output_length(20, 2, 1) == 10


def test_adaptive_input():
    from chimera_st_tpu.models.modules_extra import AdaptiveInput

    mod = AdaptiveInput(vocab_size=100, initial_dim=16, output_dim=16,
                        factor=2.0, cutoff=(10, 50, 100))
    ids = jnp.asarray([[1, 5, 30, 99]], jnp.int32)
    params = mod.init(jax.random.PRNGKey(0), ids)
    out = mod.apply(params, ids)
    assert out.shape == (1, 4, 16)
    np.testing.assert_allclose(np.asarray(out)[0, 0], 0.0)  # pad row zeroed
    assert not np.allclose(np.asarray(out)[0, 1], 0.0)
    # cluster embedding tables have shrinking dims
    flat = {"/".join(str(getattr(k, "key", k)) for k in p): v.shape
            for p, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    dims = [flat[f"params/embed_{i}/embedding"][1] for i in range(3)]
    assert dims == [16, 8, 4]


def test_sparse_attention_mask():
    from chimera_st_tpu.models.modules_extra import sparse_attention_mask

    m = np.asarray(sparse_attention_mask(64, stride=16, expressivity=4,
                                         bidirectional=False))
    # within-window causal positions allowed
    assert m[10, 5] == 0.0
    # non-summary earlier-window position banned
    assert m[40, 3] < 0
    # summary position (last 4 of the first window) allowed
    assert m[40, 14] == 0.0
    # causal: future banned even inside the window
    assert m[5, 10] < 0


def test_sentence_prediction_criterion():
    import chimera_st_tpu.criterions  # noqa: F401
    from chimera_st_tpu.config.registry import CRITERIONS
    from chimera_st_tpu.models import build_model_from_arch

    cfg = {"src_vocab_size": 20, "tgt_vocab_size": 20,
           "encoder_embed_dim": 16, "encoder_ffn_dim": 32,
           "encoder_layers": 1, "encoder_heads": 2,
           "decoder_embed_dim": 16, "decoder_ffn_dim": 32,
           "decoder_layers": 1, "decoder_heads": 2, "num_classes": 3}
    model = build_model_from_arch("bart_base", cfg)
    rng = np.random.default_rng(7)
    src = jnp.asarray(rng.integers(4, 20, size=(4, 6)), jnp.int32)
    prev = jnp.asarray(rng.integers(4, 20, size=(4, 5)), jnp.int32).at[:, -1].set(2)
    params = model.init(jax.random.PRNGKey(0), src, prev,
                        method=type(model).classify)
    batch = {"src_tokens": src, "prev_output_tokens": prev,
             "target_labels": jnp.asarray([0, 1, 2, 1]), "ntokens": 4.0}
    crit = CRITERIONS.get("sentence_prediction")({})
    loss, ss, lg = crit(model, params, batch, train=False)
    assert np.isfinite(float(loss)) and float(ss) == 4.0
    assert 0 <= float(lg["ncorrect"]) <= 4


def test_composite_loss():
    import chimera_st_tpu.criterions  # noqa: F401
    from chimera_st_tpu.config.registry import CRITERIONS
    from chimera_st_tpu.models import build_model_from_arch

    cfg = {"src_vocab_size": 20, "tgt_vocab_size": 20,
           "encoder_embed_dim": 16, "encoder_ffn_dim": 32,
           "encoder_layers": 1, "encoder_heads": 2,
           "decoder_embed_dim": 16, "decoder_ffn_dim": 32,
           "decoder_layers": 1, "decoder_heads": 2}
    model = build_model_from_arch("transformer_iwslt_de_en", cfg)
    rng = np.random.default_rng(8)
    src = jnp.asarray(rng.integers(4, 20, size=(2, 6)), jnp.int32)
    prev = jnp.asarray(rng.integers(4, 20, size=(2, 5)), jnp.int32)
    tgt = jnp.asarray(rng.integers(4, 20, size=(2, 5)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, prev)
    batch = {"src_tokens": src, "prev_output_tokens": prev, "target": tgt,
             "ntokens": 10.0}
    comp = CRITERIONS.get("composite_loss")({
        "padding_idx": 1,
        "underlying": [
            {"_name": "cross_entropy", "weight": 1.0},
            {"_name": "label_smoothed_cross_entropy", "weight": 0.5,
             "label_smoothing": 0.1},
        ],
    })
    loss, ss, lg = comp(model, params, batch, train=False)
    single = CRITERIONS.get("cross_entropy")({"padding_idx": 1})(
        model, params, batch, train=False)[0]
    assert float(loss) > float(single)  # weighted sum exceeds one part
    assert "sub0_loss" in lg and "sub1_loss" in lg
