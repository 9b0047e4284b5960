"""Regression tests for the ops/scoring/logging/utils review fixes."""

import numpy as np
import pytest


@pytest.mark.quick
def test_bleu_scorer_unk_never_matches():
    """reference scoring/bleu.py negates ref unks so a hypothesis <unk>
    cannot be credited as a match."""
    from chimera_st_tpu.scoring.bleu import Scorer

    ref = [5, 6, 7, 8, 9, 10, 2]
    matched = Scorer({"pad": 1, "eos": 2, "unk": 3})
    matched.add(ref, ref)
    full = matched.score()
    assert full == pytest.approx(100.0)

    ref_unk = [5, 6, 3, 8, 9, 10, 2]   # reference contains <unk>
    hyp_unk = [5, 6, 3, 8, 9, 10, 2]   # hypothesis emits <unk> there too
    unk_vs_unk = Scorer({"pad": 1, "eos": 2, "unk": 3})
    unk_vs_unk.add(ref_unk, hyp_unk)
    assert unk_vs_unk.score() < full  # the unk position is NOT a match

    hyp_real = [5, 6, 7, 8, 9, 10, 2]  # hypothesis guesses a real token
    real_vs_unk = Scorer({"pad": 1, "eos": 2, "unk": 3})
    real_vs_unk.add(ref_unk, hyp_real)
    assert unk_vs_unk.score() == pytest.approx(real_vs_unk.score())


@pytest.mark.quick
def test_metrics_aggregate_cleans_up_on_exception():
    from chimera_st_tpu.logging import metrics

    metrics.reset()
    with pytest.raises(RuntimeError):
        with metrics.aggregate("leaky"):
            raise RuntimeError("boom")
    # the aggregator must not stay active (review fix)
    metrics.log_scalar("loss", 1.0)
    assert "loss" not in metrics.get_smoothed_values("leaky")


@pytest.mark.quick
def test_metrics_restore_rebinds_active_default():
    from chimera_st_tpu.logging import metrics

    metrics.reset()
    metrics.log_scalar("loss", 4.0)
    blob = metrics.state_dict()
    metrics.reset()
    metrics.load_state_dict(blob)
    metrics.log_scalar("loss", 2.0)  # must land in the RESTORED aggregator
    v = metrics.get_smoothed_values("default")["loss"]
    assert v == pytest.approx(3.0)  # (4 + 2) / 2 — not frozen at 4


@pytest.mark.quick
def test_quant_noise_unbiased_for_remainder_rows():
    import jax
    import jax.numpy as jnp

    from chimera_st_tpu.ops.quantization import quant_noise

    x = jnp.ones((10, 64))  # in_dim 10, block 8 -> 2-row remainder
    acc = np.zeros((10, 64), np.float64)
    n = 300
    for i in range(n):
        acc += np.asarray(
            quant_noise(x, jax.random.PRNGKey(i), p=0.25, block_size=8)
        )
    mean = acc / n
    # every row (incl. the remainder rows 8-9) is unbiased toward 1.0
    np.testing.assert_allclose(mean.mean(axis=1), np.ones(10), atol=0.15)


@pytest.mark.quick
def test_wer_tokenizer_validates_and_supports_zh():
    from chimera_st_tpu.scoring.wer import EvaluationTokenizer

    zh = EvaluationTokenizer(tokenizer_type="zh")
    out = zh.tokenize("你好吗")
    assert len(out.split()) >= 3  # character-segmented

    with pytest.raises(ValueError):
        EvaluationTokenizer(tokenizer_type="klingon")


@pytest.mark.quick
def test_train_cli_threads_distributed_init_method(monkeypatch):
    """--distributed-init-method reaches jax.distributed.initialize (via
    parallel.initialize_distributed) with the tcp:// prefix stripped and the
    rank/nprocs flags threaded (reference: distributed_utils.py:91-151)."""
    import chimera_st_tpu.parallel as par
    from chimera_st_tpu.cli import train as train_cli

    seen = {}

    class _Stop(Exception):
        pass

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None):
        seen.update(coord=coordinator_address, nprocs=num_processes,
                    rank=process_id)
        raise _Stop  # called before any task/model setup — keep the test cheap

    monkeypatch.setattr(par, "initialize_distributed", fake_init)
    try:
        train_cli.main([
            "dummy", "--task", "dummy_lm", "--arch", "transformer_lm",
            "--criterion", "cross_entropy", "--optimizer", "adam",
            "--lr", "1e-3", "--lr-scheduler", "fixed",
            "--distributed-init-method", "tcp://10.0.0.1:1234",
            "--distributed-rank", "1", "--distributed-num-procs", "2",
        ])
        raise AssertionError("initialize_distributed never called")
    except _Stop:
        pass
    assert seen == {"coord": "10.0.0.1:1234", "nprocs": 2, "rank": 1}
