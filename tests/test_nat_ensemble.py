"""Levenshtein ensemble decoding (reference:
fairseq/models/nat/nonautoregressive_ensembles.py EnsembleLevT — per-stage
probability averaging across members; other NAT families raise)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_st_tpu.generation.nat_ensemble import (
    build_nat_ensemble_generator,
    ensemble_refine,
)
from chimera_st_tpu.models.nat_levenshtein import (
    LevenshteinConfig,
    LevenshteinTransformer,
)

PAD, BOS, EOS, UNK = 1, 0, 2, 3

TINY = LevenshteinConfig(
    src_vocab_size=24, tgt_vocab_size=24,
    encoder_embed_dim=16, encoder_ffn_dim=32, encoder_layers=1, encoder_heads=2,
    decoder_embed_dim=16, decoder_ffn_dim=32, decoder_layers=1, decoder_heads=2,
    max_ins=8,
)


@pytest.fixture(scope="module")
def members():
    model = LevenshteinTransformer(TINY)
    src = jnp.asarray([[BOS, 10, 11, 12, EOS], [BOS, 13, 14, EOS, PAD]], jnp.int32)
    canvas = jnp.asarray([[BOS, UNK, UNK, EOS, PAD]], jnp.int32)
    p1 = model.init(jax.random.PRNGKey(0), src[:1], canvas, canvas, canvas)
    p2 = model.init(jax.random.PRNGKey(1), src[:1], canvas, canvas, canvas)
    return model, p1, p2, src


@pytest.mark.quick
def test_duplicated_member_matches_single_model(members):
    """Averaging N identical members must reproduce the single-model decode
    (logsumexp(stack([lp, lp])) - log 2 == lp)."""
    model, p1, _, src = members
    single = model.apply(p1, src, iterations=4, max_len=12,
                         method=LevenshteinTransformer.refine)
    dup = ensemble_refine(model, [p1, p1], src, iterations=4, max_len=12)
    np.testing.assert_array_equal(np.asarray(single[0]), np.asarray(dup[0]))
    np.testing.assert_array_equal(np.asarray(single[1]), np.asarray(dup[1]))


@pytest.mark.quick
def test_two_member_ensemble_decodes(members):
    """Distinct members: decode runs and keeps the canvas invariants (bos
    start, left-compacted: pads only after the reported length). Token quality
    is meaningless on random weights — word-fill may legally emit any id."""
    model, p1, p2, src = members
    tokens, lengths = ensemble_refine(model, [p1, p2], src, iterations=4, max_len=12)
    tokens = np.asarray(tokens)
    lengths = np.asarray(lengths)
    assert tokens.shape == (2, 12)
    assert (tokens[:, 0] == BOS).all()
    for b in range(2):
        body = tokens[b, : lengths[b]]
        assert (body != PAD).all()
        assert (tokens[b, lengths[b]:] == PAD).all()


@pytest.mark.quick
def test_non_levenshtein_nat_ensemble_raises(members):
    """Reference parity: BasicEnsembleModel.forward_decoder raises for every
    non-LevT NAT family."""
    from chimera_st_tpu.models import build_model_from_arch

    cmlm = build_model_from_arch(
        "cmlm_transformer",
        dict(src_vocab_size=24, tgt_vocab_size=24,
             encoder_embed_dim=16, encoder_ffn_dim=32, encoder_layers=1,
             encoder_heads=2, decoder_embed_dim=16, decoder_ffn_dim=32,
             decoder_layers=1, decoder_heads=2),
    )

    class D:
        def pad(self): return PAD
        def eos(self): return EOS
        def bos(self): return BOS
        def unk(self): return UNK

    class Cfg:
        max_decode_len = 12

    with pytest.raises(NotImplementedError):
        build_nat_ensemble_generator([cmlm, cmlm], [None, None], Cfg, D())

    # AR models fall through to the beam ensemble: returns None
    model, p1, p2, _ = members

    class NotNAT:
        pass

    assert build_nat_ensemble_generator([NotNAT()], [p1], Cfg, D()) is None


@pytest.mark.slow
def test_levenshtein_ensemble_cli(tmp_path):
    """e2e: two independently-trained checkpoints decoded with
    --path a.ckpt:b.ckpt through chimera-generate (EnsembleLevT path)."""
    from chimera_st_tpu.cli import generate, preprocess, train
    from tests.synthetic_data import make_parallel_text

    raw = make_parallel_text(str(tmp_path / "raw"))
    bin_dir = str(tmp_path / "bin")
    preprocess.main([
        "-s", "de", "-t", "en",
        "--trainpref", f"{raw}/train", "--validpref", f"{raw}/valid",
        "--destdir", bin_dir, "--joined-dictionary",
    ])
    ckpts = []
    for seed in (1, 2):
        save_dir = str(tmp_path / f"lev_ckpt{seed}")
        train.main([
            bin_dir, "--task", "translation_lev", "-s", "de", "-t", "en",
            "--arch", "levenshtein_transformer",
            "--encoder-embed-dim", "16", "--encoder-ffn-dim", "32",
            "--encoder-layers", "1", "--encoder-heads", "2",
            "--decoder-embed-dim", "16", "--decoder-ffn-dim", "32",
            "--decoder-layers", "1", "--decoder-heads", "2",
            "--max-ins", "8", "--seed", str(seed),
            "--criterion", "levenshtein_loss", "--label-smoothing", "0.1",
            "--optimizer", "adam", "--lr", "1e-3", "--lr-scheduler", "inverse_sqrt",
            "--warmup-updates", "2", "--batch-size", "8", "--max-update", "2",
            "--save-dir", save_dir, "--dtype", "float32",
            "--disable-validation", "--num-length-buckets", "2",
        ])
        ckpts.append(str(Path(save_dir) / "checkpoint_last.ckpt"))

    out_dir = tmp_path / "gen"
    out_dir.mkdir()
    generate.main([
        bin_dir, "--task", "translation_lev", "-s", "de", "-t", "en",
        "--path", ":".join(ckpts),
        "--gen-subset", "valid", "--beam", "1", "--max-decode-len", "32",
        "--batch-size", "8", "--dtype", "float32",
        "--iter-decode-eos-penalty", "0.1", "--iter-decode-force-max-iter",
        "--iter-decode-max-iter", "4",
        "--results-path", str(out_dir), "--num-length-buckets", "2",
    ])
    text = (out_dir / "generate-valid.txt").read_text()
    assert "H-" in text
