"""Generation-layer review fixes: reference max-length convention, search-mode
mutual exclusivity, sampling unk penalty, and --prefix-size plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_st_tpu.generation.generator import (
    GeneratorSettings,
    SequenceGenerator,
    max_lens_from_settings,
)

PAD, EOS, UNK = 1, 2, 3


def _tiny():
    from chimera_st_tpu.models.interlingua import ChimeraInterlinguaModel
    from tests.test_interlingua_model import TINY

    model = ChimeraInterlinguaModel(TINY)
    src = jnp.asarray([[4, 5, 6, 2], [7, 8, 2, 1]], jnp.int32)
    prev = jnp.asarray([[2, 4, 5], [2, 6, 7]], jnp.int32)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.normal(size=(1, 400)), jnp.float32)
    mask = jnp.zeros((1, 400), bool)
    params = model.init(
        jax.random.PRNGKey(0), wav, mask, src[:1], prev[:1],
        method=ChimeraInterlinguaModel.init_everything,
    )
    return model, params, src


@pytest.mark.quick
def test_search_mode_mutual_exclusivity():
    """Conflicting search modes raise like the reference instead of one
    silently winning (review fix)."""
    model, params, _ = _tiny()
    with pytest.raises(ValueError, match="mutually exclusive"):
        SequenceGenerator(model, GeneratorSettings(
            beam_size=2, sampling=True, diversity_rate=0.5))
    with pytest.raises(ValueError, match="mutually exclusive"):
        SequenceGenerator(model, GeneratorSettings(
            beam_size=2, sampling=True, diverse_beam_groups=2))
    with pytest.raises(ValueError, match="mutually exclusive"):
        SequenceGenerator(model, GeneratorSettings(
            beam_size=2, sampling=True, no_repeat_ngram_size=2))
    with pytest.raises(ValueError, match="mutually exclusive"):
        SequenceGenerator(model, GeneratorSettings(
            beam_size=4, diversity_rate=0.5, diverse_beam_groups=2))


@pytest.mark.quick
def test_sampling_respects_unk_penalty():
    """--unkpen applies under --sampling like the reference (review fix: it
    was silently dropped). A huge penalty must remove unk from samples that
    otherwise emit it almost surely."""
    from chimera_st_tpu.generation.sampling import sample_decode

    V = 6
    probs = np.full(V, 1e-4)
    probs[UNK] = 1.0  # unk dominates
    probs[EOS] = 0.05
    row = np.log(probs / probs.sum()).astype(np.float32)

    def step_fn(tokens_t, index, caches):
        return jnp.tile(jnp.asarray(row)[None, :],
                        (tokens_t.shape[0], 1)), caches

    common = dict(batch_size=2, num_samples=3, max_len=8, eos=EOS, pad=PAD,
                  rng=jax.random.PRNGKey(0))
    t_pen, _, _ = sample_decode(step_fn, {}, unk=UNK, unk_penalty=1e9,
                                **common)
    assert not (np.asarray(t_pen) == UNK).any()
    t_free, _, _ = sample_decode(step_fn, {}, unk=UNK, unk_penalty=0.0,
                                 **common)
    assert (np.asarray(t_free) == UNK).any()


@pytest.mark.quick
def test_generator_prefix_tokens_forced():
    """prefix_tokens through the PUBLIC generate_text API (the CLI's
    --prefix-size path; review fix: the flag was parsed but never
    forwarded)."""
    model, params, src = _tiny()
    gen = SequenceGenerator(model, GeneratorSettings(
        beam_size=2, max_decode_len=12, min_len=1))
    assert gen.supports_prefix
    prefix = jnp.asarray([[7, 8], [PAD, PAD]], jnp.int32)
    tokens, scores, lens = gen.generate_text(
        params, src, src_lengths=jnp.asarray([4, 3]), prefix_tokens=prefix)
    toks = np.asarray(tokens)
    # row 0: every beam starts with the forced prefix
    assert (toks[0, :, 0] == 7).all() and (toks[0, :, 1] == 8).all()
    # pad rows force nothing: row 1 decodes freely (only invariant: valid)
    assert (np.asarray(lens) >= 1).all()


@pytest.mark.quick
def test_shared_length_helpers_reference_convention():
    """max_lens budget REAL tokens and clamp to max_decode_len - 1 (the eos
    slot), shared by single-model and ensemble paths."""
    s = GeneratorSettings(beam_size=2, max_len_a=1.0, max_len_b=0,
                          max_decode_len=10)
    src = jnp.asarray([4, 50])
    ml = np.asarray(max_lens_from_settings(s, src))
    assert ml.tolist() == [4, 9]

    from chimera_st_tpu.generation import ensemble as ens_mod

    # the ensemble path resolves through the same helper (no duplicate)
    assert "max_lens_from_settings" in open(ens_mod.__file__).read()
