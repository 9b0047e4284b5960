"""Data-parallel decode over the device mesh: sharded-batch beam search must
produce outputs identical to single-device decode (the generate CLI shards
batches on `data` when >1 device is visible)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from chimera_st_tpu.generation.generator import GeneratorSettings, SequenceGenerator
from chimera_st_tpu.models.interlingua import ChimeraInterlinguaModel
from chimera_st_tpu.parallel import make_mesh
from tests.test_interlingua_model import TINY


def test_sharded_decode_matches_single_device():
    model = ChimeraInterlinguaModel(TINY)
    rng = np.random.default_rng(0)
    B = 8
    wav = jnp.asarray(rng.normal(size=(B, 500)), jnp.float32)
    mask = jnp.zeros((B, 500), bool)
    params = model.init(
        jax.random.PRNGKey(0), wav, mask,
        jnp.zeros((1, 3), jnp.int32), jnp.zeros((1, 4), jnp.int32),
        method=ChimeraInterlinguaModel.init_everything,
    )
    settings = GeneratorSettings(beam_size=3, max_decode_len=12, min_len=3)
    gen = SequenceGenerator(model, settings)
    t0, s0, l0 = map(np.asarray, gen.generate_audio(params, wav, mask))

    mesh = make_mesh(data_parallel=8, model_parallel=1)
    shard = lambda x: jax.device_put(x, NamedSharding(mesh, P("data")))
    params_r = jax.device_put(params, NamedSharding(mesh, P()))
    gen2 = SequenceGenerator(model, settings)
    t1, s1, l1 = map(
        np.asarray, gen2.generate_audio(params_r, shard(wav), shard(mask))
    )
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_allclose(s0, s1, atol=1e-4)
    np.testing.assert_array_equal(l0, l1)


def test_sharded_decode_int8_cache():
    """int8 KV caches (+ their [L, B*K] scale rows) compose with the data
    mesh: sharded int8 decode == single-device int8 decode."""
    model = ChimeraInterlinguaModel(TINY)
    rng = np.random.default_rng(1)
    B = 8
    wav = jnp.asarray(rng.normal(size=(B, 500)), jnp.float32)
    mask = jnp.zeros((B, 500), bool)
    params = model.init(
        jax.random.PRNGKey(0), wav, mask,
        jnp.zeros((1, 3), jnp.int32), jnp.zeros((1, 4), jnp.int32),
        method=ChimeraInterlinguaModel.init_everything,
    )
    settings = GeneratorSettings(
        beam_size=3, max_decode_len=12, min_len=3, kv_cache_int8=True
    )
    gen = SequenceGenerator(model, settings)
    t0, s0, l0 = map(np.asarray, gen.generate_audio(params, wav, mask))

    mesh = make_mesh(data_parallel=8, model_parallel=1)
    shard = lambda x: jax.device_put(x, NamedSharding(mesh, P("data")))
    params_r = jax.device_put(params, NamedSharding(mesh, P()))
    gen2 = SequenceGenerator(model, settings)
    t1, s1, l1 = map(
        np.asarray, gen2.generate_audio(params_r, shard(wav), shard(mask))
    )
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_allclose(s0, s1, atol=1e-4)
    np.testing.assert_array_equal(l0, l1)
