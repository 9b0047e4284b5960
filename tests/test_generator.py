import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_st_tpu.generation.generator import GeneratorSettings, SequenceGenerator
from chimera_st_tpu.models.interlingua import ChimeraInterlinguaModel
from tests.test_interlingua_model import TINY


@pytest.fixture(scope="module")
def setup():
    model = ChimeraInterlinguaModel(TINY)
    wav = jnp.zeros((2, 400), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(1),
        wav,
        jnp.zeros((2, 400), bool),
        jnp.zeros((2, 4), jnp.int32),
        jnp.zeros((2, 5), jnp.int32),
        method=ChimeraInterlinguaModel.init_everything,
    )
    gen = SequenceGenerator(
        model,
        GeneratorSettings(beam_size=3, max_decode_len=12, min_len=1),
    )
    return model, params, gen


def test_generate_audio_shapes(setup):
    model, params, gen = setup
    wav = jnp.asarray(np.random.default_rng(0).normal(size=(2, 400)), jnp.float32)
    mask = jnp.zeros((2, 400), bool).at[1, 300:].set(True)
    tokens, scores, lens = gen.generate_audio(params, wav, mask)
    assert tokens.shape == (2, 3, 12)
    assert (np.asarray(lens) <= 12).all() and (np.asarray(lens) >= 1).all()
    # every hypothesis ends with eos at position len-1
    t, l = np.asarray(tokens), np.asarray(lens)
    for b in range(2):
        for k in range(3):
            assert t[b, k, l[b, k] - 1] == gen.eos


def test_hypothesis_score_matches_teacher_forcing(setup):
    """Beam hypothesis score must equal the length-normalized sum of
    teacher-forced log-probs for the same token sequence — validates the
    incremental cache path end-to-end against the full forward."""
    model, params, gen = setup
    wav = jnp.asarray(np.random.default_rng(1).normal(size=(1, 400)), jnp.float32)
    mask = jnp.zeros((1, 400), bool)
    tokens, scores, lens = gen.generate_audio(params, wav, mask)
    t, L = np.asarray(tokens)[0, 0], int(np.asarray(lens)[0, 0])
    hyp = t[:L]  # ends with eos

    prev = np.concatenate([[gen.eos], hyp[:-1]])[None, :]  # shift right
    enc, enc_mask = model.apply(
        params, wav, mask, method=ChimeraInterlinguaModel.encode_audio
    )
    logits = model.apply(
        params,
        jnp.asarray(prev, jnp.int32),
        enc,
        enc_mask,
        method=ChimeraInterlinguaModel.decode,
    )
    lp = jax.nn.log_softmax(np.asarray(logits, np.float32), axis=-1)
    tf_score = sum(float(lp[0, i, tok]) for i, tok in enumerate(hyp)) / L
    np.testing.assert_allclose(float(np.asarray(scores)[0, 0]), tf_score, atol=1e-4)


def test_generate_text_path(setup):
    model, params, gen = setup
    src = jnp.asarray([[4, 5, 6, 2], [7, 8, 2, 1]], jnp.int32)
    tokens, scores, lens = gen.generate_text(params, src)
    assert tokens.shape[0] == 2


def test_batch_independence(setup):
    """Masked/finished sentences must not affect others (no dynamic shrink)."""
    model, params, gen = setup
    rng = np.random.default_rng(2)
    wav1 = jnp.asarray(rng.normal(size=(1, 400)), jnp.float32)
    wav2 = jnp.asarray(rng.normal(size=(1, 400)), jnp.float32)
    m = jnp.zeros((1, 400), bool)
    t1, s1, l1 = gen.generate_audio(params, wav1, m)
    both = jnp.concatenate([wav1, wav2], axis=0)
    tb, sb, lb = gen.generate_audio(params, both, jnp.zeros((2, 400), bool))
    np.testing.assert_allclose(np.asarray(s1)[0], np.asarray(sb)[0], atol=1e-4)
    assert (np.asarray(t1)[0] == np.asarray(tb)[0]).all()


def test_retain_dropout_stochastic_and_seed_reproducible(setup):
    """--retain-dropout in the jitted beam loop (reference
    sequence_generator.py retain_dropout): same seed -> identical
    hypotheses; different seeds -> different score streams; deterministic
    decode unchanged."""
    model, params, gen = setup
    rng = np.random.default_rng(5)
    wav = jnp.asarray(rng.normal(size=(2, 400)), jnp.float32)
    mask = jnp.zeros((2, 400), bool)

    def make(seed):
        return SequenceGenerator(
            model,
            GeneratorSettings(beam_size=3, max_decode_len=12, min_len=1,
                              retain_dropout=True, seed=seed),
        )

    t1, s1, l1 = map(np.asarray, make(7).generate_audio(params, wav, mask))
    t2, s2, l2 = map(np.asarray, make(7).generate_audio(params, wav, mask))
    np.testing.assert_array_equal(t1, t2)  # seed-reproducible
    np.testing.assert_allclose(s1, s2, atol=1e-5)

    s3 = np.asarray(make(8).generate_audio(params, wav, mask)[1])
    assert not np.allclose(s1, s3)  # dropout stream actually differs

    # deterministic decode is NOT affected by the flag's existence
    t0a = np.asarray(gen.generate_audio(params, wav, mask)[0])
    t0b = np.asarray(gen.generate_audio(params, wav, mask)[0])
    np.testing.assert_array_equal(t0a, t0b)


def test_retain_dropout_text_path(setup):
    model, params, _ = setup
    toks = jnp.asarray([[5, 6, 7, 1], [8, 9, 1, 1]], jnp.int32)
    g = SequenceGenerator(
        model,
        GeneratorSettings(beam_size=2, max_decode_len=8, min_len=1,
                          retain_dropout=True, seed=3),
    )
    ta = np.asarray(g.generate_text(params, toks)[0])
    g2 = SequenceGenerator(
        model,
        GeneratorSettings(beam_size=2, max_decode_len=8, min_len=1,
                          retain_dropout=True, seed=3),
    )
    np.testing.assert_array_equal(ta, np.asarray(g2.generate_text(params, toks)[0]))
