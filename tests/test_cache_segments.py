"""Segmented (growing) KV-cache decode must match the preallocated path
exactly (perf feature: generation/beam_search.py cache_segment)."""

import jax
import jax.numpy as jnp
import numpy as np

from chimera_st_tpu.generation.generator import GeneratorSettings, SequenceGenerator
from chimera_st_tpu.models.interlingua import ChimeraInterlinguaModel
from tests.test_interlingua_model import TINY


def test_segmented_matches_preallocated():
    model = ChimeraInterlinguaModel(TINY)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(2, 500)), jnp.float32)
    mask = jnp.zeros((2, 500), bool)
    params = model.init(
        jax.random.PRNGKey(0), wav, mask,
        jnp.zeros((1, 3), jnp.int32), jnp.zeros((1, 4), jnp.int32),
        method=ChimeraInterlinguaModel.init_everything,
    )
    outs = []
    for seg in (0, 16):
        gen = SequenceGenerator(
            model,
            GeneratorSettings(beam_size=3, max_decode_len=40, min_len=25,
                              len_penalty=1.2, cache_segment=seg),
        )
        t, s, l = map(np.asarray, gen.generate_audio(params, wav, mask))
        outs.append((t, s, l))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-4)
    np.testing.assert_array_equal(outs[0][2], outs[1][2])
