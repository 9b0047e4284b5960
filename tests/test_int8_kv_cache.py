"""int8 KV cache (--kv-cache-int8): quantized decode must track the bf16/f32
cache path closely (near-lossless per-row symmetric quantization) and work
through segmented cache growth.

reference capability: none (TPU-native perf extension — halves decode cache
HBM traffic; see models/layers.py MultiheadAttention int8 branch).
"""

import jax
import jax.numpy as jnp
import numpy as np

from chimera_st_tpu.generation.generator import GeneratorSettings, SequenceGenerator
from chimera_st_tpu.models.interlingua import ChimeraInterlinguaModel
from tests.test_interlingua_model import TINY


def _decode(params, model, wav, mask, **kw):
    gen = SequenceGenerator(
        model,
        GeneratorSettings(beam_size=3, max_decode_len=40, min_len=25,
                          len_penalty=1.2, **kw),
    )
    t, s, l = map(np.asarray, gen.generate_audio(params, wav, mask))
    return t, s, l


def _tiny_setup():
    model = ChimeraInterlinguaModel(TINY)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(2, 500)), jnp.float32)
    mask = jnp.zeros((2, 500), bool)
    params = model.init(
        jax.random.PRNGKey(0), wav, mask,
        jnp.zeros((1, 3), jnp.int32), jnp.zeros((1, 4), jnp.int32),
        method=ChimeraInterlinguaModel.init_everything,
    )
    return model, params, wav, mask


def test_int8_matches_full_precision_decode():
    model, params, wav, mask = _tiny_setup()
    t_fp, s_fp, l_fp = _decode(params, model, wav, mask, kv_cache_int8=False)
    t_q, s_q, l_q = _decode(params, model, wav, mask, kv_cache_int8=True)
    # per-row int8 K/V quantization is near-lossless: on this seeded tiny
    # model the decoded tokens are identical and scores agree to ~1e-3
    np.testing.assert_array_equal(t_fp, t_q)
    np.testing.assert_array_equal(l_fp, l_q)
    np.testing.assert_allclose(s_fp, s_q, atol=5e-3)


def test_int8_segmented_matches_preallocated():
    model, params, wav, mask = _tiny_setup()
    outs = [
        _decode(params, model, wav, mask, kv_cache_int8=True, cache_segment=seg)
        for seg in (0, 16)
    ]
    # segment growth pads the int8 leaves AND their [L, B*K] scale rows on
    # the time axis; both paths quantize identically -> exact match
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-4)
    np.testing.assert_array_equal(outs[0][2], outs[1][2])


def test_int8_gather_mode_matches_crosscol(monkeypatch):
    # the dead-end A/B lazy-select mode must stay correct with int8 too
    model, params, wav, mask = _tiny_setup()
    t_c, s_c, l_c = _decode(params, model, wav, mask, kv_cache_int8=True)
    monkeypatch.setenv("CHIMERA_LAZY_SELECT", "gather")
    t_g, s_g, l_g = _decode(params, model, wav, mask, kv_cache_int8=True)
    np.testing.assert_array_equal(t_c, t_g)
    np.testing.assert_allclose(s_c, s_g, atol=1e-3)


def test_ensemble_rejects_int8():
    import pytest

    from chimera_st_tpu.generation.ensemble import EnsembleSequenceGenerator

    model, params, _, _ = _tiny_setup()
    with pytest.raises(NotImplementedError, match="kv-cache-int8"):
        EnsembleSequenceGenerator(
            [model], [params],
            GeneratorSettings(beam_size=2, kv_cache_int8=True),
        )


def test_unsupported_paths_reject_int8_loudly():
    """--kv-cache-int8 off the lazy-reorder beam path must raise, not
    silently fall back to full precision (review finding: a user A/B-timing
    sampling decode would otherwise record a bogus no-effect result)."""
    import pytest

    model, params, wav, mask = _tiny_setup()
    with pytest.raises(NotImplementedError, match="sampling"):
        _decode(params, model, wav, mask, kv_cache_int8=True, sampling=True)
    with pytest.raises(NotImplementedError, match="lazy"):
        _decode(params, model, wav, mask, kv_cache_int8=True,
                lazy_beam_reorder=False)


def test_quantization_roundtrip_error_bound():
    # unit check on the quantization scheme itself: per-row symmetric int8
    # keeps worst-case relative error <= 1/254 of the row amax
    rng = np.random.default_rng(1)
    row = rng.normal(size=(1, 4, 8, 6)).astype(np.float32)  # [1, H, D, BK]
    amax = np.abs(row).max(axis=(0, 1, 2))
    s = np.maximum(amax, 1e-8) / 127.0
    q = np.round(row / s).astype(np.int8)
    deq = q.astype(np.float32) * s
    err = np.abs(deq - row).max(axis=(0, 1, 2))
    assert np.all(err <= s / 2 + 1e-7)
