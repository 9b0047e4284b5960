"""NAT decode-surface flags (reference: iterative_refinement_generator.py —
--iter-decode-eos-penalty / --iter-decode-force-max-iter /
--iter-decode-with-beam length-beam reranking)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_st_tpu.models.nat_levenshtein import (
    LevenshteinConfig,
    LevenshteinTransformer,
)

PAD, BOS, EOS, UNK = 1, 0, 2, 3

LEV_TINY = LevenshteinConfig(
    src_vocab_size=24, tgt_vocab_size=24,
    encoder_embed_dim=16, encoder_ffn_dim=32, encoder_layers=1, encoder_heads=2,
    decoder_embed_dim=16, decoder_ffn_dim=32, decoder_layers=1, decoder_heads=2,
    max_ins=8,
)


@pytest.fixture(scope="module")
def lev():
    model = LevenshteinTransformer(LEV_TINY)
    src = jnp.asarray([[BOS, 10, 11, 12, EOS], [BOS, 13, 14, EOS, PAD]],
                      jnp.int32)
    canvas = jnp.asarray([[BOS, UNK, UNK, EOS, PAD]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src[:1], canvas, canvas, canvas)
    return model, params, src


@pytest.mark.quick
def test_eos_penalty_forces_insertions(lev):
    """A huge zero-insertion penalty must make every slot insert its maximum:
    from the [bos, eos] canvas (one slot, max_ins-1 = 7 insertions) round one
    deterministically yields length 2 + 7 = 9 (reference:
    mask_ins_score[..., 0] -= eos_penalty). The unpenalized decode can only
    be <= that (random weights may or may not hit the cap — no tie-dependent
    strict inequality here)."""
    model, params, src = lev
    _, len_plain = model.apply(
        params, src, iterations=1, max_len=12,
        method=LevenshteinTransformer.refine,
    )
    _, len_pen = model.apply(
        params, src, iterations=1, max_len=12, eos_penalty=1e9,
        method=LevenshteinTransformer.refine,
    )
    assert (np.asarray(len_pen) == 2 + (LEV_TINY.max_ins - 1)).all()
    assert (np.asarray(len_pen) >= np.asarray(len_plain)).all()


@pytest.mark.quick
def test_force_max_iter_is_a_fixed_point(lev):
    """Early exit fires only when a round is a no-op, so forcing the full
    iteration budget must not change the result (determinism -> converged
    canvases are fixed points)."""
    model, params, src = lev
    t1, l1 = model.apply(params, src, iterations=6, max_len=12,
                         method=LevenshteinTransformer.refine)
    t2, l2 = model.apply(params, src, iterations=6, max_len=12,
                         force_iterations=True,
                         method=LevenshteinTransformer.refine)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


@pytest.mark.quick
def test_length_beam_matches_translate_at_beam1_and_reranks():
    from chimera_st_tpu.models import build_model_from_arch

    model = build_model_from_arch("nonautoregressive_transformer", dict(
        src_vocab_size=24, tgt_vocab_size=24,
        encoder_embed_dim=16, encoder_ffn_dim=32, encoder_layers=1,
        encoder_heads=2, decoder_embed_dim=16, decoder_ffn_dim=32,
        decoder_layers=1, decoder_heads=2, max_predicted_length=16,
    ))
    src = jnp.asarray([[4, 5, 6, 2], [7, 8, 2, 1]], jnp.int32)
    unk_fill = jnp.asarray([[3, 3, 3, 2]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src[:1], unk_fill)
    cls = type(model)

    t_ref, l_ref = model.apply(params, src, max_len=12, method=cls.translate)
    t_b1, l_b1 = model.apply(params, src, beam=1, max_len=12,
                             method=cls.translate_with_length_beam)
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_b1))
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_b1))

    # beam > 1: the kept candidate's mean interior log-prob must be >= the
    # top-1-length candidate's (reranking can only improve the criterion)
    def mean_interior_lp(tokens, lengths):
        enc, enc_mask = model.apply(params, src, method=cls.encode)
        em = model.apply(params, tokens, enc, enc_mask,
                         method=cls.decode_tokens)
        lp = jax.nn.log_softmax(np.asarray(em, np.float32), axis=-1)
        tok_lp = np.take_along_axis(lp, np.asarray(tokens)[..., None],
                                    axis=-1)[..., 0]
        pos = np.arange(tokens.shape[1])[None, :]
        interior = (pos > 0) & (pos < (np.asarray(lengths) - 1)[:, None])
        return (tok_lp * interior).sum(1) / np.maximum(interior.sum(1), 1)

    t_b3, l_b3 = model.apply(params, src, beam=3, max_len=12,
                             method=cls.translate_with_length_beam)
    assert t_b3.shape == t_ref.shape
    s_b1 = mean_interior_lp(t_b1, l_b1)
    s_b3 = mean_interior_lp(t_b3, l_b3)
    assert (s_b3 >= s_b1 - 1e-5).all()


@pytest.mark.quick
def test_cmlm_length_beam_matches_at_beam1_and_reranks():
    """CMLM mask_predict length beam: beam=1 reproduces the plain decode;
    beam>1 keeps the candidate with the best mean final confidence."""
    from chimera_st_tpu.models import build_model_from_arch

    model = build_model_from_arch("cmlm_transformer", dict(
        src_vocab_size=24, tgt_vocab_size=24,
        encoder_embed_dim=16, encoder_ffn_dim=32, encoder_layers=1,
        encoder_heads=2, decoder_embed_dim=16, decoder_ffn_dim=32,
        decoder_layers=1, decoder_heads=2, max_predicted_length=16,
    ))
    src = jnp.asarray([[4, 5, 6, 2], [7, 8, 2, 1]], jnp.int32)
    masked = jnp.asarray([[3, 5, 3, 2]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src[:1], masked)
    cls = type(model)

    t_ref, l_ref = model.apply(params, src, iterations=3, max_len=12,
                               method=cls.mask_predict)
    t_b1, l_b1 = model.apply(params, src, beam=1, iterations=3, max_len=12,
                             method=cls.mask_predict_with_length_beam)
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_b1))
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_b1))

    t_b3, l_b3 = model.apply(params, src, beam=3, iterations=3, max_len=12,
                             method=cls.mask_predict_with_length_beam)
    assert t_b3.shape == t_ref.shape
    assert (np.asarray(l_b3) >= 1).all()
    # canvases are well-formed: pads exactly after the reported length
    toks = np.asarray(t_b3)
    for b in range(2):
        assert (toks[b, int(l_b3[b]):] == PAD).all()
        assert (toks[b, : int(l_b3[b])] != PAD).all()


@pytest.mark.quick
def test_insertion_force_max_iter_and_beam_rejection():
    """Insertion refine honors force_iterations (converged canvases are
    fixed points); --iter-decode-with-beam on refine-family models raises
    like the reference's allow_length_beam assert."""
    from chimera_st_tpu.generation.nat_generator import build_nat_generator
    from chimera_st_tpu.models import build_model_from_arch

    model = build_model_from_arch("insertion_transformer", dict(
        src_vocab_size=24, tgt_vocab_size=24,
        encoder_embed_dim=16, encoder_ffn_dim=32, encoder_layers=1,
        encoder_heads=2, decoder_embed_dim=16, decoder_ffn_dim=32,
        decoder_layers=1, decoder_heads=2,
    ))
    src = jnp.asarray([[BOS, 10, 11, EOS]], jnp.int32)
    canvas = jnp.asarray([[BOS, UNK, EOS, PAD]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), src, canvas)
    cls = type(model)
    t1, l1 = model.apply(params, src, iterations=6, max_len=10,
                         method=cls.refine)
    t2, l2 = model.apply(params, src, iterations=6, max_len=10,
                         force_iterations=True, method=cls.refine)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    class D:
        def pad(self): return PAD
        def eos(self): return EOS
        def bos(self): return BOS
        def unk(self): return UNK

    class Cfg:
        max_decode_len = 10
        iter_decode_with_beam = 3

    with pytest.raises(NotImplementedError):
        build_nat_generator(model, Cfg, D())
