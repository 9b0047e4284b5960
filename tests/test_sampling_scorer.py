import jax
import jax.numpy as jnp
import numpy as np

from chimera_st_tpu.generation.sampling import (
    _filter_topk,
    _filter_topp,
    sample_decode,
)

PAD, EOS = 1, 2


def test_topk_filter():
    lp = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    out = np.asarray(_filter_topk(lp, 2))
    assert np.isfinite(out[0, :2]).all()
    assert (out[0, 2:] < -1e6).all()


def test_topp_filter():
    lp = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    out = np.asarray(_filter_topp(lp, 0.7))
    # 0.5 + 0.3 >= 0.7 -> keep top-2
    assert np.isfinite(out[0, :2]).all()
    assert (out[0, 2:] < -1e6).all()


def _const_step(rows):
    table = jnp.asarray(rows, jnp.float32)

    def step_fn(tokens_t, index, caches):
        row = table[jnp.minimum(index, table.shape[0] - 1)]
        return jnp.tile(row[None, :], (tokens_t.shape[0], 1)), caches

    return step_fn


def test_sample_decode_respects_filter():
    # distribution: token 4 dominates; with top_k=1 all samples must pick it
    probs = np.asarray([0.01, 0.0, 0.01, 0.01, 0.9, 0.07])
    rows = np.log(probs / probs.sum())[None, :].repeat(6, 0)
    tokens, scores, lens = sample_decode(
        _const_step(rows), {}, batch_size=2, num_samples=3, max_len=4,
        eos=EOS, pad=PAD, rng=jax.random.PRNGKey(0), top_k=1, min_len=1,
        max_lens=jnp.asarray([3, 3]),
    )
    t = np.asarray(tokens)
    # all non-eos generated tokens are 4 (argmax), eos forced at max_len
    for b in range(2):
        for k in range(3):
            L = int(lens[b, k])
            assert t[b, k, L - 1] == EOS
            assert all(tok == 4 for tok in t[b, k, : L - 1])


def test_sample_decode_distribution_spread():
    # near-uniform over 3 tokens: different samples should differ
    probs = np.asarray([0.0, 0.0, 0.02, 0.32, 0.33, 0.33])
    rows = np.log(probs / probs.sum() + 1e-9)[None, :].repeat(8, 0)
    tokens, scores, lens = sample_decode(
        _const_step(rows), {}, batch_size=1, num_samples=8, max_len=6,
        eos=EOS, pad=PAD, rng=jax.random.PRNGKey(42), min_len=2,
    )
    t = np.asarray(tokens)[0]
    assert len({tuple(row) for row in t}) > 1


def test_sequence_scorer_matches_teacher_forcing():
    from chimera_st_tpu.generation.scorer import SequenceScorer
    from chimera_st_tpu.models.interlingua import ChimeraInterlinguaModel
    from tests.test_interlingua_model import TINY

    model = ChimeraInterlinguaModel(TINY)
    wav = jnp.asarray(np.random.default_rng(0).normal(size=(1, 400)), jnp.float32)
    mask = jnp.zeros((1, 400), bool)
    params = model.init(
        jax.random.PRNGKey(0), wav, mask, jnp.zeros((1, 3), jnp.int32),
        jnp.zeros((1, 4), jnp.int32),
        method=ChimeraInterlinguaModel.init_everything,
    )
    target = jnp.asarray([[5, 7, 9, EOS]], jnp.int32)
    scorer = SequenceScorer(model)
    out = scorer.score_audio(params, wav, mask, target)
    assert out["positional_scores"].shape == (1, 4)
    assert float(out["length"][0]) == 4
    # manual teacher-forced check
    enc, em = model.apply(params, wav, mask, method=ChimeraInterlinguaModel.encode_audio)
    prev = jnp.asarray([[EOS, 5, 7, 9]], jnp.int32)
    logits = model.apply(params, prev, enc, em, method=ChimeraInterlinguaModel.decode)
    lp = jax.nn.log_softmax(np.asarray(logits, np.float32), -1)
    expect = sum(lp[0, i, int(t)] for i, t in enumerate(np.asarray(target)[0]))
    np.testing.assert_allclose(float(out["total_logprob"][0]), expect, rtol=1e-5)


def test_sequence_scorer_text_path():
    """score_text: same scorer over the text encoder (the generic
    type(model).encode_text dispatch)."""
    from chimera_st_tpu.generation.scorer import SequenceScorer
    from chimera_st_tpu.models.interlingua import ChimeraInterlinguaModel
    from tests.test_interlingua_model import TINY

    model = ChimeraInterlinguaModel(TINY)
    wav = jnp.asarray(np.random.default_rng(0).normal(size=(1, 400)), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), wav, jnp.zeros((1, 400), bool),
        jnp.zeros((1, 3), jnp.int32), jnp.zeros((1, 4), jnp.int32),
        method=ChimeraInterlinguaModel.init_everything,
    )
    src = jnp.asarray([[4, 6, 8, EOS]], jnp.int32)
    target = jnp.asarray([[5, 7, EOS, PAD]], jnp.int32)
    out = SequenceScorer(model).score_text(params, src, target)
    assert float(out["length"][0]) == 3  # pad excluded
    assert np.isfinite(float(out["score"][0]))
    # padded position contributes nothing
    assert float(out["positional_scores"][0, 3]) == 0.0


def test_replace_unk_tokens():
    """unk copy + lexicon mapping + clamped out-of-range alignment
    (reference utils.replace_unk)."""
    from chimera_st_tpu.generation.unk_replace import (
        load_align_dict,
        replace_unk_tokens,
    )

    src = ["Haus", "und", "Garten"]
    hyp = ["the", "<unk>", "and", "<unk>"]
    align = [0, 0, 1, 9]  # last alignment past the source edge -> clamp
    out = replace_unk_tokens(hyp, src, align, {"Haus": "house"}, "<unk>")
    assert out == ["the", "house", "and", "Garten"]
    assert load_align_dict(None) == {}
    assert load_align_dict(True) == {}


def test_sequence_scorer_retain_dropout():
    """--retain-dropout (reference sequence_generator.py retain_dropout):
    scoring with dropout active is stochastic across calls; the default
    scorer stays deterministic."""
    from chimera_st_tpu.generation.scorer import SequenceScorer
    from chimera_st_tpu.models.interlingua import ChimeraInterlinguaModel
    from tests.test_interlingua_model import TINY

    model = ChimeraInterlinguaModel(TINY)  # dropout 0.1 (default)
    wav = jnp.asarray(np.random.default_rng(0).normal(size=(1, 400)), jnp.float32)
    mask = jnp.zeros((1, 400), bool)
    params = model.init(
        jax.random.PRNGKey(0), wav, mask, jnp.zeros((1, 3), jnp.int32),
        jnp.zeros((1, 4), jnp.int32),
        method=ChimeraInterlinguaModel.init_everything,
    )
    target = jnp.asarray([[5, 7, 9, EOS]], jnp.int32)

    det = SequenceScorer(model)
    s1 = float(det.score_audio(params, wav, mask, target)["score"][0])
    s2 = float(det.score_audio(params, wav, mask, target)["score"][0])
    assert s1 == s2  # deterministic by default

    mc = SequenceScorer(model, retain_dropout=True, seed=7)
    m1 = float(mc.score_audio(params, wav, mask, target)["score"][0])
    m2 = float(mc.score_audio(params, wav, mask, target)["score"][0])
    assert m1 != m2  # fresh dropout rng per call
    # same seed -> same MC sequence (reproducible eval)
    mc2 = SequenceScorer(model, retain_dropout=True, seed=7)
    assert float(mc2.score_audio(params, wav, mask, target)["score"][0]) == m1
