import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_st_tpu.generation.ensemble import EnsembleSequenceGenerator
from chimera_st_tpu.generation.generator import GeneratorSettings, SequenceGenerator
from chimera_st_tpu.models.interlingua import ChimeraInterlinguaModel
from tests.test_interlingua_model import TINY


def _init(seed):
    model = ChimeraInterlinguaModel(TINY)
    params = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 400), jnp.float32),
        jnp.zeros((1, 400), bool), jnp.zeros((1, 3), jnp.int32),
        jnp.zeros((1, 4), jnp.int32),
        method=ChimeraInterlinguaModel.init_everything,
    )
    return model, params


def test_single_model_ensemble_matches_plain_generator():
    model, params = _init(0)
    settings = GeneratorSettings(beam_size=2, max_decode_len=8)
    wav = jnp.asarray(np.random.default_rng(0).normal(size=(2, 400)), jnp.float32)
    mask = jnp.zeros((2, 400), bool)

    plain = SequenceGenerator(model, settings)
    t1, s1, l1 = plain.generate_audio(params, wav, mask)

    ens = EnsembleSequenceGenerator([model], [params], settings)
    t2, s2, l2 = ens.generate_audio(wav, mask)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)


def test_two_model_ensemble_runs_and_differs():
    m1, p1 = _init(0)
    m2, p2 = _init(1)
    settings = GeneratorSettings(beam_size=2, max_decode_len=8)
    wav = jnp.asarray(np.random.default_rng(1).normal(size=(1, 400)), jnp.float32)
    mask = jnp.zeros((1, 400), bool)
    ens = EnsembleSequenceGenerator([m1, m2], [p1, p2], settings)
    t, s, l = ens.generate_audio(wav, mask)
    assert np.isfinite(np.asarray(s)).all()
    assert int(np.asarray(l)[0, 0]) >= 1


def test_lm_fusion_changes_scores():
    from chimera_st_tpu.models.transformer_mt import TransformerLM, TransformerLMConfig

    model, params = _init(0)
    lm = TransformerLM(TransformerLMConfig(
        vocab_size=TINY.tgt_vocab_size, embed_dim=16, ffn_dim=32, layers=1, heads=2
    ))
    lm_params = lm.init(jax.random.PRNGKey(3), jnp.zeros((1, 4), jnp.int32))
    settings = GeneratorSettings(beam_size=2, max_decode_len=8)
    wav = jnp.asarray(np.random.default_rng(2).normal(size=(1, 400)), jnp.float32)
    mask = jnp.zeros((1, 400), bool)

    base = EnsembleSequenceGenerator([model], [params], settings)
    fused = EnsembleSequenceGenerator(
        [model], [params], settings, lm=(lm, lm_params, 0.5)
    )
    _, s0, _ = base.generate_audio(wav, mask)
    _, s1, _ = fused.generate_audio(wav, mask)
    assert not np.allclose(np.asarray(s0), np.asarray(s1))
