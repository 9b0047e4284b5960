"""NAT decode introspection + external reranking (reference:
iterative_refinement_generator.py retain_history / rerank,
fairseq_cli/generate.py:325-344 I-/E- lines):

- ``return_history`` on every NAT family's whole-decode method must not
  change the decode result (the scan variant runs the full bound; rounds are
  deterministic so terminated canvases are fixpoints) and must expose the
  per-round canvases + per-sentence step counts.
- ``--iter-decode-with-external-reranker``: the AR model's teacher-forced
  mean token log-prob replaces the NAT model's own candidate ranking.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_st_tpu.generation.nat_generator import build_nat_generator
from chimera_st_tpu.models import build_model_from_arch
from chimera_st_tpu.models.nat_levenshtein import (
    LevenshteinConfig,
    LevenshteinTransformer,
)

PAD, BOS, EOS, UNK = 1, 0, 2, 3

TINY_DIMS = dict(
    src_vocab_size=24, tgt_vocab_size=24,
    encoder_embed_dim=16, encoder_ffn_dim=32, encoder_layers=1,
    encoder_heads=2, decoder_embed_dim=16, decoder_ffn_dim=32,
    decoder_layers=1, decoder_heads=2,
)


class D:
    def pad(self): return PAD
    def eos(self): return EOS
    def bos(self): return BOS
    def unk(self): return UNK


def _cfg(**kw):
    class Cfg:
        max_decode_len = 12
    for k, v in kw.items():
        setattr(Cfg, k, v)
    return Cfg


@pytest.fixture(scope="module")
def lev():
    model = LevenshteinTransformer(LevenshteinConfig(**TINY_DIMS, max_ins=8))
    src = jnp.asarray([[BOS, 10, 11, 12, EOS], [BOS, 13, 14, EOS, PAD]],
                      jnp.int32)
    canvas = jnp.asarray([[BOS, UNK, UNK, EOS, PAD]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src[:1], canvas, canvas, canvas)
    return model, params, src


@pytest.fixture(scope="module")
def vanilla():
    model = build_model_from_arch("nonautoregressive_transformer", dict(
        **TINY_DIMS, max_predicted_length=16,
    ))
    src = jnp.asarray([[4, 5, 6, 2], [7, 8, 2, 1]], jnp.int32)
    unk_fill = jnp.asarray([[3, 3, 3, 2]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src[:1], unk_fill)
    return model, params, src


@pytest.mark.quick
def test_levenshtein_history_parity(lev):
    """History decode == while_loop decode; recorded canvases end in the
    final canvas and repeat once a sentence settles (fixpoint)."""
    model, params, src = lev
    cls = LevenshteinTransformer
    t_ref, l_ref = model.apply(params, src, iterations=5, max_len=12,
                               method=cls.refine)
    t_h, l_h, hist, steps = model.apply(
        params, src, iterations=5, max_len=12, return_history=True,
        method=cls.refine,
    )
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_h))
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_h))
    hist, steps = np.asarray(hist), np.asarray(steps)
    assert hist.shape == (5,) + t_ref.shape
    np.testing.assert_array_equal(hist[-1], np.asarray(t_ref))
    assert ((steps >= 0) & (steps <= 5)).all()
    # rounds past a sentence's step count only repeat its settled canvas
    for b in range(src.shape[0]):
        for j in range(int(steps[b]), 5):
            np.testing.assert_array_equal(hist[j, b], np.asarray(t_ref)[b])


@pytest.mark.quick
def test_insertion_history_parity():
    model = build_model_from_arch("insertion_transformer", dict(**TINY_DIMS))
    src = jnp.asarray([[BOS, 10, 11, EOS]], jnp.int32)
    canvas = jnp.asarray([[BOS, UNK, EOS, PAD]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, canvas)
    cls = type(model)
    t_ref, l_ref = model.apply(params, src, iterations=4, max_len=10,
                               method=cls.refine)
    t_h, l_h, hist, steps = model.apply(
        params, src, iterations=4, max_len=10, return_history=True,
        method=cls.refine,
    )
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_h))
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_h))
    np.testing.assert_array_equal(np.asarray(hist)[-1], np.asarray(t_ref))


@pytest.mark.quick
def test_cmlm_history_last_round_is_final():
    """The last mask-predict round re-masks nothing, so its snapshot IS the
    final canvas; earlier snapshots are fully predicted (no mask token)."""
    model = build_model_from_arch("cmlm_transformer", dict(
        **TINY_DIMS, max_predicted_length=16,
    ))
    src = jnp.asarray([[4, 5, 6, 2], [7, 8, 2, 1]], jnp.int32)
    masked = jnp.asarray([[3, 5, 3, 2]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src[:1], masked)
    cls = type(model)
    t_ref, l_ref = model.apply(params, src, iterations=3, max_len=12,
                               method=cls.mask_predict)
    t_h, l_h, hist = model.apply(
        params, src, iterations=3, max_len=12, return_history=True,
        method=cls.mask_predict,
    )
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_h))
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_h))
    hist = np.asarray(hist)
    assert hist.shape == (3,) + t_ref.shape
    np.testing.assert_array_equal(hist[-1], np.asarray(t_ref))
    assert (hist != model.mask_idx).all()


@pytest.mark.quick
def test_vanilla_translate_history(vanilla):
    model, params, src = vanilla
    cls = type(model)
    t_ref, l_ref = model.apply(params, src, iterations=2, max_len=12,
                               method=cls.translate)
    t_h, l_h, hist = model.apply(
        params, src, iterations=2, max_len=12, return_history=True,
        method=cls.translate,
    )
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_h))
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_h))
    np.testing.assert_array_equal(np.asarray(hist)[-1], np.asarray(t_ref))


@pytest.mark.quick
def test_adapter_records_history_and_steps(lev):
    """build_nat_generator under retain_iter_history: same tokens as the
    plain adapter, last_history/last_steps populated (bos column dropped
    like the hypothesis tokens)."""
    model, params, src = lev
    plain = build_nat_generator(model, _cfg(iter_decode_max_iter=4), D())
    hist_gen = build_nat_generator(
        model, _cfg(iter_decode_max_iter=4, retain_iter_history=True), D())
    t0, _, l0 = plain.generate_text(params, src)
    t1, _, l1 = hist_gen.generate_text(params, src)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    assert plain.last_history is None
    assert hist_gen.last_history is not None
    assert hist_gen.last_history.shape == (4,) + np.asarray(t1)[:, 0, :].shape
    np.testing.assert_array_equal(hist_gen.last_history[-1],
                                  np.asarray(t1)[:, 0, :])
    assert hist_gen.last_steps.shape == (src.shape[0],)


@pytest.fixture(scope="module")
def ar_reranker():
    model = build_model_from_arch("transformer", dict(**TINY_DIMS))
    src = jnp.asarray([[4, 5, 6, 2]], jnp.int32)
    prev = jnp.asarray([[2, 7, 8, 9]], jnp.int32)
    params = model.init(jax.random.PRNGKey(7), src, prev)
    return model, params


@pytest.mark.quick
def test_external_reranker_selects_ar_best(vanilla, ar_reranker):
    """The generator's pick must equal a by-hand argmax of the AR model's
    mean teacher-forced log-prob over the length-beam candidates."""
    model, params, src = vanilla
    rr_model, rr_params = ar_reranker
    beam = 3
    gen = build_nat_generator(
        model,
        _cfg(iter_decode_with_beam=beam,
             iter_decode_with_external_reranker=True),
        D(), reranker=(rr_model, rr_params),
    )
    tokens, scores, lens = gen.generate_text(params, src)
    tokens, scores, lens = map(np.asarray, (tokens, scores, lens))

    # hand-computed expectation
    cls = type(model)
    cand, cand_lens, _ = model.apply(
        params, src, beam=beam, max_len=12, return_candidates=True,
        method=cls.translate_with_length_beam,
    )
    cand = np.asarray(cand)[:, 1:]  # drop bos like the adapter
    cand_lens = np.maximum(np.asarray(cand_lens) - 1, 1)
    led = np.concatenate(
        [np.full((cand.shape[0], 1), EOS, np.int32), cand], axis=1)
    logits = np.asarray(rr_model.apply(rr_params,
                                       jnp.repeat(src, beam, axis=0),
                                       jnp.asarray(led[:, :-1])), np.float32)
    lp = jax.nn.log_softmax(logits, axis=-1)
    tok_lp = np.take_along_axis(np.asarray(lp), cand[..., None],
                                axis=-1)[..., 0]
    mask = cand != PAD
    rr_score = (tok_lp * mask).sum(1) / np.maximum(mask.sum(1), 1)
    B = src.shape[0]
    best = rr_score.reshape(B, beam).argmax(1)
    flat = np.arange(B) * beam + best
    np.testing.assert_array_equal(tokens[:, 0, :], cand[flat])
    np.testing.assert_array_equal(lens[:, 0], cand_lens[flat])
    np.testing.assert_allclose(scores[:, 0], rr_score[flat], rtol=1e-5)


@pytest.mark.quick
def test_reranker_flag_validation(vanilla, ar_reranker):
    model, params, src = vanilla
    rr = ar_reranker
    # flag without a trailing checkpoint
    with pytest.raises(ValueError, match="at least two"):
        build_nat_generator(
            model,
            _cfg(iter_decode_with_beam=3,
                 iter_decode_with_external_reranker=True),
            D())
    # flag without a length beam: nothing to rerank
    with pytest.raises(ValueError, match="with-beam"):
        build_nat_generator(
            model, _cfg(iter_decode_with_external_reranker=True), D(),
            reranker=rr)
    # non-NAT model with the flag
    ar_model, _ = rr
    with pytest.raises(NotImplementedError, match="NAT"):
        build_nat_generator(
            ar_model,
            _cfg(iter_decode_with_beam=3,
                 iter_decode_with_external_reranker=True),
            D(), reranker=rr)
    # history over a length beam is not recorded
    with pytest.raises(NotImplementedError, match="history"):
        build_nat_generator(
            model,
            _cfg(iter_decode_with_beam=3, retain_iter_history=True),
            D())


@pytest.mark.quick
def test_print_step_works_with_length_beam(vanilla, ar_reranker):
    """--print-step must NOT force the history decode: with a length beam
    (no early exit) every sentence's step count is the full schedule, and
    the combination with --iter-decode-with-external-reranker is valid
    (review finding: the CLI used to couple print_step to
    retain_iter_history and crash on beam decodes)."""
    model, params, src = vanilla
    gen = build_nat_generator(
        model,
        _cfg(iter_decode_with_beam=3, iter_decode_max_iter=2,
             print_step=True),
        D())
    gen.generate_text(params, src)
    np.testing.assert_array_equal(gen.last_steps,
                                  np.full((src.shape[0],), 2, np.int32))
    assert gen.last_history is None  # only --retain-iter-history surfaces it

    rr = ar_reranker
    gen2 = build_nat_generator(
        model,
        _cfg(iter_decode_with_beam=3, iter_decode_max_iter=2,
             print_step=True, iter_decode_with_external_reranker=True),
        D(), reranker=rr)
    gen2.generate_text(params, src)
    np.testing.assert_array_equal(gen2.last_steps,
                                  np.full((src.shape[0],), 2, np.int32))


@pytest.mark.quick
def test_print_step_alone_records_real_steps(lev):
    """Single-canvas decode: --print-step alone rides the history decode for
    real early-exit step counts but does not surface the canvases."""
    model, params, src = lev
    gen = build_nat_generator(
        model, _cfg(iter_decode_max_iter=4, print_step=True), D())
    t, _, _ = gen.generate_text(params, src)
    assert gen.last_steps is not None
    assert ((gen.last_steps >= 0) & (gen.last_steps <= 4)).all()
    assert gen.last_history is None
    # decode unchanged vs the plain adapter
    plain = build_nat_generator(model, _cfg(iter_decode_max_iter=4), D())
    t0, _, _ = plain.generate_text(params, src)
    np.testing.assert_array_equal(np.asarray(t), np.asarray(t0))


@pytest.mark.slow
def test_generate_cli_history_and_print_step(tmp_path):
    """e2e: --retain-iter-history/--print-step emit E-<id>_<round> and I-<id>
    lines in generate-valid.txt (reference generate.py:325-344)."""
    from pathlib import Path

    from chimera_st_tpu.cli import generate, preprocess, train
    from tests.synthetic_data import make_parallel_text

    raw = make_parallel_text(str(tmp_path / "raw"))
    bin_dir = str(tmp_path / "bin")
    preprocess.main([
        "-s", "de", "-t", "en",
        "--trainpref", f"{raw}/train", "--validpref", f"{raw}/valid",
        "--destdir", bin_dir, "--joined-dictionary",
    ])
    save_dir = str(tmp_path / "ckpt")
    train.main([
        bin_dir, "--task", "translation_lev", "-s", "de", "-t", "en",
        "--arch", "levenshtein_transformer",
        "--encoder-embed-dim", "16", "--encoder-ffn-dim", "32",
        "--encoder-layers", "1", "--encoder-heads", "2",
        "--decoder-embed-dim", "16", "--decoder-ffn-dim", "32",
        "--decoder-layers", "1", "--decoder-heads", "2",
        "--max-ins", "8", "--seed", "1",
        "--criterion", "levenshtein_loss", "--label-smoothing", "0.1",
        "--optimizer", "adam", "--lr", "1e-3", "--lr-scheduler", "inverse_sqrt",
        "--warmup-updates", "2", "--batch-size", "8", "--max-update", "2",
        "--save-dir", save_dir, "--dtype", "float32",
        "--disable-validation", "--num-length-buckets", "2",
    ])
    out_dir = tmp_path / "gen"
    out_dir.mkdir()
    generate.main([
        bin_dir, "--task", "translation_lev", "-s", "de", "-t", "en",
        "--path", str(Path(save_dir) / "checkpoint_last.ckpt"),
        "--gen-subset", "valid", "--beam", "1", "--max-decode-len", "32",
        "--batch-size", "8", "--dtype", "float32",
        "--iter-decode-max-iter", "3",
        "--retain-iter-history", "--print-step",
        "--results-path", str(out_dir), "--num-length-buckets", "2",
    ])
    text = (out_dir / "generate-valid.txt").read_text()
    assert "H-" in text
    import re
    assert re.search(r"^I-\d+\t\d+$", text, re.M), "missing I- step lines"
    assert re.search(r"^E-\d+_0\t", text, re.M), "missing E- history lines"
