import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_st_tpu.models.layers import (
    LayerNorm,
    MultiheadAttention,
    TransformerDecoderLayer,
    TransformerEncoderLayer,
    position_at_step,
    positional_embedding_from_mask,
    sinusoidal_positions,
)


def test_layernorm_matches_torch():
    import torch

    x = np.random.default_rng(0).normal(size=(2, 5, 16)).astype(np.float32)
    ln = LayerNorm(16)
    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = ln.apply(params, jnp.asarray(x))
    yt = torch.nn.functional.layer_norm(torch.tensor(x), (16,)).numpy()
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-5)


def test_sinusoidal_matches_fairseq_layout():
    # independent reimplementation of the documented fairseq formula
    import math

    dim, n, pad = 8, 6, 1
    table = np.asarray(sinusoidal_positions(n, dim, pad))
    half = dim // 2
    emb = np.exp(np.arange(half) * -(math.log(10000.0) / (half - 1)))
    for p in range(n + pad + 1):
        if p == pad:
            np.testing.assert_allclose(table[p], 0.0)
            continue
        expect = np.concatenate([np.sin(p * emb), np.cos(p * emb)])
        np.testing.assert_allclose(table[p], expect, atol=1e-6)


def test_positional_embedding_padding():
    mask = jnp.array([[False, False, True], [False, False, False]])
    pos = positional_embedding_from_mask(mask, 8)
    # padded position gets the zero row
    np.testing.assert_allclose(np.asarray(pos[0, 2]), 0.0)
    # first token of both rows identical (position id 2)
    np.testing.assert_allclose(np.asarray(pos[0, 0]), np.asarray(pos[1, 0]))
    # matches single-step lookup used in incremental decode
    np.testing.assert_allclose(
        np.asarray(pos[1, 2]), np.asarray(position_at_step(2, 8)), atol=1e-6
    )


def test_mha_matches_torch():
    import torch

    d, h, B, T = 16, 4, 2, 5
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, d)).astype(np.float32)

    mha = MultiheadAttention(embed_dim=d, num_heads=h)
    params = mha.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out, _ = mha.apply(params, jnp.asarray(x))

    tm = torch.nn.MultiheadAttention(d, h, batch_first=True)
    p = params["params"]
    with torch.no_grad():
        w_q = torch.tensor(np.asarray(p["q_proj"]["kernel"]).T)
        w_k = torch.tensor(np.asarray(p["k_proj"]["kernel"]).T)
        w_v = torch.tensor(np.asarray(p["v_proj"]["kernel"]).T)
        tm.in_proj_weight.copy_(torch.cat([w_q, w_k, w_v], dim=0))
        tm.in_proj_bias.copy_(
            torch.cat(
                [
                    torch.tensor(np.asarray(p[k]["bias"]))
                    for k in ("q_proj", "k_proj", "v_proj")
                ]
            )
        )
        tm.out_proj.weight.copy_(torch.tensor(np.asarray(p["out_proj"]["kernel"]).T))
        tm.out_proj.bias.copy_(torch.tensor(np.asarray(p["out_proj"]["bias"])))
        ref, _ = tm(torch.tensor(x), torch.tensor(x), torch.tensor(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5)


def test_mha_key_padding_mask():
    d, h, B, T = 16, 4, 2, 6
    x = jnp.asarray(np.random.default_rng(1).normal(size=(B, T, d)), jnp.float32)
    mha = MultiheadAttention(embed_dim=d, num_heads=h)
    params = mha.init(jax.random.PRNGKey(0), x)
    mask = jnp.zeros((B, T), bool).at[:, 4:].set(True)
    out_masked, _ = mha.apply(params, x, key_padding_mask=mask)
    # changing padded keys must not change outputs of valid queries
    x2 = x.at[:, 4:, :].set(99.0)
    out_masked2, _ = mha.apply(params, x2, key_padding_mask=mask)
    np.testing.assert_allclose(
        np.asarray(out_masked[:, :4]), np.asarray(out_masked2[:, :4]), atol=1e-5
    )


def test_mha_causal():
    d, h, B, T = 16, 4, 1, 5
    x = jnp.asarray(np.random.default_rng(2).normal(size=(B, T, d)), jnp.float32)
    mha = MultiheadAttention(embed_dim=d, num_heads=h)
    params = mha.init(jax.random.PRNGKey(0), x)
    out, _ = mha.apply(params, x, causal=True)
    # output at t=0 must not depend on later inputs
    x2 = x.at[:, 3:, :].set(-5.0)
    out2, _ = mha.apply(params, x2, causal=True)
    np.testing.assert_allclose(np.asarray(out[:, :3]), np.asarray(out2[:, :3]), atol=1e-5)


def test_mha_incremental_cache_matches_full():
    d, h, B, T = 16, 4, 2, 5
    x = jnp.asarray(np.random.default_rng(3).normal(size=(B, T, d)), jnp.float32)
    mha = MultiheadAttention(embed_dim=d, num_heads=h)
    params = mha.init(jax.random.PRNGKey(0), x)
    full, _ = mha.apply(params, x, causal=True)

    cache = {  # time-major, batch-minor decode cache layout
        "k": jnp.zeros((T, h, d // h, B), jnp.float32),
        "v": jnp.zeros((T, h, d // h, B), jnp.float32),
    }
    outs = []
    for t in range(T):
        o, cache = mha.apply(
            params, x[:, t : t + 1], cache=cache, cache_index=jnp.int32(t)
        )
        outs.append(o)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc), atol=1e-5)


def test_encoder_layer_pre_post_ln_shapes():
    d = 16
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 7, d)), jnp.float32)
    for pre in (True, False):
        layer = TransformerEncoderLayer(d, 4 * d, 4, normalize_before=pre)
        params = layer.init(jax.random.PRNGKey(0), x)
        y = layer.apply(params, x)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()


def test_cross_only_equals_masked_concat_self_attention():
    """The interlingua fast path must equal the reference's masked self-attn
    over [h; mem] restricted to the mem rows."""
    d, M, T, B = 16, 3, 6, 2
    rng = np.random.default_rng(5)
    h = jnp.asarray(rng.normal(size=(B, T, d)), jnp.float32)
    mem = jnp.asarray(rng.normal(size=(B, M, d)), jnp.float32)
    layer = TransformerEncoderLayer(d, 4 * d, 4, normalize_before=True)
    params = layer.init(jax.random.PRNGKey(0), h)

    fast = layer.apply(params, mem, h, method=TransformerEncoderLayer.cross_only)

    # reference formulation: self-attn over concat with columns [T:] masked out
    concat = jnp.concatenate([h, mem], axis=1)
    bias = jnp.zeros((T + M, T + M), jnp.float32).at[:, T:].set(-1e8)
    ref = layer.apply(params, concat, attn_bias=bias)[:, T:]
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=2e-5)


def test_decoder_layer_cache_matches_full():
    d, h, B, T, S = 16, 4, 2, 4, 5
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(B, T, d)), jnp.float32)
    enc = jnp.asarray(rng.normal(size=(B, S, d)), jnp.float32)
    layer = TransformerDecoderLayer(d, 4 * d, 4)
    params = layer.init(jax.random.PRNGKey(0), x, enc)
    full, _ = layer.apply(params, x, enc)

    ekv = layer.apply(params, enc, method=TransformerDecoderLayer.compute_encoder_kv)
    cache = {  # time-major, batch-minor decode cache layout
        "k": jnp.zeros((T, h, d // h, B), jnp.float32),
        "v": jnp.zeros((T, h, d // h, B), jnp.float32),
    }
    outs = []
    for t in range(T):
        o, cache = layer.apply(
            params,
            x[:, t : t + 1],
            encoder_kv=ekv,
            self_cache=cache,
            cache_index=jnp.int32(t),
        )
        outs.append(o)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(full), np.asarray(inc), atol=1e-5)
