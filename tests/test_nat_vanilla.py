"""Vanilla/iterative NAT + NAT-CRF (reference: fairseq/models/nat/
nonautoregressive_transformer.py, iterative_nonautoregressive_transformer.py,
nat_crf_transformer.py + modules/dynamic_crf_layer.py).

The CRF oracle is brute-force path enumeration on tiny vocab with a full
beam — the low-rank + beam approximation is then EXACT, so log-likelihood
and Viterbi must match to float tolerance."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_st_tpu.models.crf import DynamicCRF
from chimera_st_tpu.models.nat_vanilla import NATConfig, NATransformer

V, T, B = 6, 4, 3


def _crf_setup(rng):
    crf = DynamicCRF(V, low_rank=4, beam=V)  # full beam -> exact
    em = jnp.asarray(rng.normal(size=(B, T, V)), jnp.float32)
    variables = crf.init(jax.random.PRNGKey(0), em,
                         jnp.zeros((B, T), jnp.int32),
                         jnp.ones((B, T), bool),
                         method=DynamicCRF.loglikelihood)
    E1 = np.asarray(variables["params"]["E1"])
    E2 = np.asarray(variables["params"]["E2"])
    trans = E1 @ E2.T  # [V, V]
    return crf, variables, em, trans


def _brute_logZ(em_row, trans, length):
    scores = []
    for path in itertools.product(range(V), repeat=length):
        s = sum(em_row[t, y] for t, y in enumerate(path))
        s += sum(trans[path[t], path[t + 1]] for t in range(length - 1))
        scores.append(s)
    m = max(scores)
    return m + np.log(sum(np.exp(s - m) for s in scores))


def _brute_best(em_row, trans, length):
    best, best_s = None, -1e30
    for path in itertools.product(range(V), repeat=length):
        s = sum(em_row[t, y] for t, y in enumerate(path))
        s += sum(trans[path[t], path[t + 1]] for t in range(length - 1))
        if s > best_s:
            best, best_s = path, s
    return np.asarray(best), best_s


def test_crf_loglikelihood_exact_vs_bruteforce():
    rng = np.random.default_rng(0)
    crf, variables, em, trans = _crf_setup(rng)
    targets = jnp.asarray(rng.integers(0, V, size=(B, T)), jnp.int32)
    lengths = np.array([T, T - 1, 2])
    mask = jnp.asarray(np.arange(T)[None, :] < lengths[:, None])

    llh = crf.apply(variables, em, targets, mask,
                    method=DynamicCRF.loglikelihood)
    em_np = np.asarray(em)
    for b in range(B):
        L = int(lengths[b])
        tgt = np.asarray(targets[b, :L])
        gold = sum(em_np[b, t, tgt[t]] for t in range(L))
        gold += sum(trans[tgt[t], tgt[t + 1]] for t in range(L - 1))
        expect = gold - _brute_logZ(em_np[b], trans, L)
        np.testing.assert_allclose(float(llh[b]), expect, rtol=1e-4)


def test_crf_viterbi_exact_vs_bruteforce():
    rng = np.random.default_rng(1)
    crf, variables, em, trans = _crf_setup(rng)
    lengths = np.array([T, 3, 2])
    mask = jnp.asarray(np.arange(T)[None, :] < lengths[:, None])
    toks = crf.apply(variables, em, mask, method=DynamicCRF.decode)
    em_np = np.asarray(em)
    for b in range(B):
        L = int(lengths[b])
        best, _ = _brute_best(em_np[b], trans, L)
        np.testing.assert_array_equal(np.asarray(toks[b, :L]), best)


def test_crf_beam_forces_targets():
    """With a small beam, the gold tokens must still enter the beam, so the
    numerator path is always scored (reference HACK in dynamic_crf_layer)."""
    rng = np.random.default_rng(2)
    crf = DynamicCRF(V, low_rank=4, beam=2)
    em = jnp.asarray(rng.normal(size=(1, T, V)), jnp.float32)
    # targets far below the top-2 emissions
    targets = jnp.asarray(np.argsort(np.asarray(em[0]), axis=-1)[:, 0][None],
                          jnp.int32)
    mask = jnp.ones((1, T), bool)
    variables = crf.init(jax.random.PRNGKey(0), em, targets, mask,
                         method=DynamicCRF.loglikelihood)
    llh = crf.apply(variables, em, targets, mask,
                    method=DynamicCRF.loglikelihood)
    assert np.isfinite(float(llh[0]))
    assert float(llh[0]) < 0  # gold is a low-scoring path


TINY = dict(
    src_vocab_size=20, tgt_vocab_size=20,
    encoder_embed_dim=16, encoder_ffn_dim=32, encoder_layers=1,
    encoder_heads=2, decoder_embed_dim=16, decoder_ffn_dim=32,
    decoder_layers=1, decoder_heads=2, dropout=0.0,
    max_predicted_length=16,
)


def _nat_batch(rng, B=4, S=5, U=6):
    src = jnp.asarray(rng.integers(4, 20, size=(B, S)), jnp.int32)
    tgt = np.asarray(rng.integers(4, 20, size=(B, U)), np.int32)
    tgt[:, 0] = 0
    tgt[:, -1] = 2
    prev = np.full_like(tgt, 3)  # unk interior
    prev[:, 0] = 0
    prev[:, -1] = 2
    return src, jnp.asarray(tgt), jnp.asarray(prev)


def test_nat_forward_and_translate():
    rng = np.random.default_rng(3)
    model = NATransformer(NATConfig(**TINY))
    src, tgt, prev = _nat_batch(rng)
    v = model.init(jax.random.PRNGKey(0), src, prev,
                   method=NATransformer.init_everything)
    logits, len_logits = model.apply(v, src, prev)
    assert logits.shape == (4, 6, 20)
    assert len_logits.shape == (4, 16)

    toks, lengths = model.apply(v, src, max_len=12,
                                method=NATransformer.translate)
    toks, lengths = np.asarray(toks), np.asarray(lengths)
    assert toks.shape == (4, 12)
    for b in range(4):
        assert toks[b, 0] == 0  # bos
        assert toks[b, lengths[b] - 1] == 2  # eos
        assert (toks[b, lengths[b]:] == 1).all()  # pad


def test_inat_iterative_forward():
    rng = np.random.default_rng(4)
    model = NATransformer(NATConfig(**TINY, train_steps=3, dae_ratio=0.5))
    src, tgt, prev = _nat_batch(rng)
    v = model.init(jax.random.PRNGKey(0), src, prev,
                   method=NATransformer.init_everything)
    steps, len_logits = model.apply(
        v, src, prev, jax.random.PRNGKey(1),
        method=NATransformer.forward_iterative,
    )
    assert steps.shape == (3, 4, 6, 20)
    assert np.isfinite(np.asarray(steps)).all()


def test_nacrf_trains():
    """NAT-CRF: loss finite, grads nonzero through emissions AND the CRF
    transition embeddings, loss decreases over a few adam steps."""
    import optax

    rng = np.random.default_rng(5)
    model = NATransformer(
        NATConfig(**TINY, crf_lowrank=4, crf_beam=8)
    )
    src, tgt, prev = _nat_batch(rng)
    v = model.init(jax.random.PRNGKey(0), src, prev,
                   method=NATransformer.init_everything)

    def loss_fn(params):
        llh, _ = model.apply(params, src, prev, tgt,
                             method=NATransformer.crf_loglikelihood)
        return -jnp.mean(llh)

    tx = optax.adam(5e-3)
    opt = tx.init(v)
    losses = []
    params = v
    for _ in range(8):
        loss, g = jax.value_and_grad(loss_fn)(params)
        losses.append(float(loss))
        upd, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, upd)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    gE1 = np.asarray(
        jax.grad(loss_fn)(v)["params"]["crf"]["E1"]
    )
    assert np.abs(gE1).max() > 0

    # CRF-decoded translate path
    toks, lengths = model.apply(params, src, max_len=12,
                                method=NATransformer.translate)
    assert np.asarray(toks).shape == (4, 12)


def test_nat_registered_and_cli_init():
    """Registry + train-CLI init path cover all three arches."""
    from chimera_st_tpu.cli.train import init_params_for_task
    from chimera_st_tpu.config.registry import ARCHITECTURES, MODELS

    for arch in ("nonautoregressive_transformer",
                 "iterative_nonautoregressive_transformer",
                 "nacrf_transformer"):
        name, preset = ARCHITECTURES.get(arch)
        cfg = preset(dict(TINY))
        model = MODELS.get(name)(cfg)

        class _A:
            seed = 0

        v = init_params_for_task(model, None, _A())
        assert v is not None
        if arch == "nacrf_transformer":
            assert "crf" in v["params"], "CRF params must materialize at init"


def test_build_nat_generator_dispatch():
    """The generate-CLI adapter routes every NAT family through its own
    whole-sequence decode (reference: fairseq_task.build_generator ->
    IterativeRefinementGenerator dispatch) and honors --iter-decode-max-iter."""
    import jax
    import numpy as np

    from chimera_st_tpu.data.dictionary import Dictionary
    from chimera_st_tpu.generation.nat_generator import build_nat_generator
    from chimera_st_tpu.models.nat_cmlm import CMLMConfig, CMLMTransformer
    from chimera_st_tpu.models.transformer_mt import (
        TransformerMTConfig,
        TransformerModel,
    )

    d = Dictionary()
    for w in list("abcdefghij"):
        d.add_symbol(w)

    class Cfg:
        max_decode_len = 12
        iter_decode_max_iter = 2

    src = jnp.asarray(np.array([[5, 6, 7, 2], [8, 9, 2, 1]], np.int32))

    nat = NATransformer(NATConfig(**TINY))
    p = nat.init(jax.random.PRNGKey(0), src, src)
    gen = build_nat_generator(nat, Cfg, d)
    assert gen is not None
    toks, scores, lens = gen.generate_text(p, src)
    assert toks.shape[1] == 1 and lens.shape == (2, 1)
    assert int(np.asarray(lens).min()) >= 1

    cmlm = CMLMTransformer(
        CMLMConfig(
            src_vocab_size=20, tgt_vocab_size=20,
            encoder_embed_dim=16, encoder_ffn_dim=32, encoder_layers=1,
            encoder_heads=2, decoder_embed_dim=16, decoder_ffn_dim=32,
            decoder_layers=1, decoder_heads=2, max_predicted_length=16,
        )
    )
    pc = cmlm.init(jax.random.PRNGKey(0), src, src)
    gen2 = build_nat_generator(cmlm, Cfg, d)
    assert gen2 is not None
    toks2, _, lens2 = gen2.generate_text(pc, src)
    assert np.asarray(toks2).ndim == 3 and int(np.asarray(lens2).min()) >= 1

    # an autoregressive model is NOT claimed by the NAT adapter
    ar = TransformerModel(
        TransformerMTConfig(
            src_vocab_size=20, tgt_vocab_size=20,
            encoder_embed_dim=16, encoder_ffn_dim=32, encoder_layers=1,
            encoder_heads=2, decoder_embed_dim=16, decoder_ffn_dim=32,
            decoder_layers=1, decoder_heads=2,
        )
    )
    assert build_nat_generator(ar, Cfg, d) is None


def test_nacrf_loss_criterion_registry():
    """nacrf_loss through the registry (reference: the CRF word_ins loss of
    nat_crf_transformer): finite, and the CRF term matches the model's
    crf_loglikelihood."""
    from chimera_st_tpu.config.registry import CRITERIONS

    rng = np.random.default_rng(9)
    model = NATransformer(NATConfig(**TINY, crf_lowrank=4, crf_beam=8))
    src, tgt, prev = _nat_batch(rng)
    params = model.init(jax.random.PRNGKey(0), src, prev,
                        method=NATransformer.init_everything)
    lengths = (np.asarray(tgt) != 1).sum(1)
    batch = {
        "src_tokens": src,
        "masked_target": prev,
        "target": tgt,
        "target_lengths": jnp.asarray(lengths, jnp.int32),
        "ntokens": float(lengths.sum()),
    }
    crit = CRITERIONS.get("nacrf_loss")({"length_loss_factor": 0.1})
    loss, ss, logging = crit(model, params, batch, train=False)
    assert np.isfinite(float(loss))
    llh, _ = model.apply(params, src, prev, tgt,
                         method=NATransformer.crf_loglikelihood)
    np.testing.assert_allclose(
        float(logging["crf_loss"]), -float(jnp.sum(llh)), rtol=1e-5
    )
