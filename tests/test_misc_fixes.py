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


@pytest.mark.quick
def test_distributed_init_method_validation():
    """Malformed init methods fail fast with the supported form named
    (ADVICE r3: env:///file:// used to reach jax as a bogus coordinator
    address and die with an obscure connection error)."""
    from chimera_st_tpu.cli import train as train_cli

    for bad in ("env://", "file:///tmp/sync", "tcp://hostonly", "tcp://:99"):
        with pytest.raises(SystemExit, match="tcp://HOST:PORT"):
            train_cli.main([
                "dummy", "--task", "dummy_lm", "--arch", "transformer_lm",
                "--criterion", "cross_entropy", "--optimizer", "adam",
                "--lr", "1e-3", "--lr-scheduler", "fixed",
                "--distributed-init-method", bad,
            ])
    # rank/nprocs without an init method is an error, not a silent no-op
    with pytest.raises(SystemExit, match="no effect"):
        train_cli.main([
            "dummy", "--task", "dummy_lm", "--arch", "transformer_lm",
            "--criterion", "cross_entropy", "--optimizer", "adam",
            "--lr", "1e-3", "--lr-scheduler", "fixed",
            "--distributed-rank", "0",
        ])


@pytest.mark.quick
def test_initialize_distributed_partial_rank_errors():
    """Exactly one of rank/nprocs is a descriptive RuntimeError, not a raw
    jax.distributed failure (ADVICE r3)."""
    from chimera_st_tpu.parallel import initialize_distributed

    with pytest.raises(RuntimeError, match="together"):
        initialize_distributed("127.0.0.1:9", num_processes=2, process_id=None)


@pytest.mark.quick
def test_checkpoint_manager_tracks_best_without_writing(tmp_path):
    """best/patience state advances under --no-save and on non-writing
    (non-lead multi-host) managers; write=False never touches the fs
    (previously save() returned before the best update, so patience never
    decremented under --no-save)."""
    from chimera_st_tpu.checkpoint.store import CheckpointManager

    non_lead = CheckpointManager(str(tmp_path / "nl"), write=False)
    non_lead.save({}, {}, epoch=1, updates=10, val_metric=2.0)
    non_lead.save({}, {}, epoch=2, updates=20, val_metric=3.0)
    assert non_lead.best == 2.0  # tracked
    assert not non_lead.is_better(2.5)  # patience would decrement
    assert not (tmp_path / "nl").exists()  # never created, never wrote

    no_save = CheckpointManager(str(tmp_path / "ns"), no_save=True)
    no_save.save({}, {}, epoch=1, updates=10, val_metric=1.5)
    assert no_save.best == 1.5
    assert list((tmp_path / "ns").glob("*.ckpt")) == []


@pytest.mark.heavy
def test_reset_optimizer_does_not_import_stale_best(tmp_path):
    """r4 review fix: the reference restores save_checkpoint.best only when
    `not reset_optimizer and not reset_meters` (checkpoint_utils
    load_checkpoint) — the ST warm start from an MT checkpoint_best passes
    --reset-optimizer and must NOT inherit the MT stage's best metric, or
    checkpoint_best is never written and --patience fires immediately."""
    import pickle
    from pathlib import Path

    from tests.synthetic_data import make_triplet_dir
    from tests.test_cli_e2e import _train_args
    from chimera_st_tpu.cli import train

    data = make_triplet_dir(str(tmp_path / "data"))
    save_dir = str(tmp_path / "ckpt")
    train.main(_train_args(data, save_dir, ["--max-update", "2"]))
    last = Path(save_dir) / "checkpoint_last.ckpt"
    assert last.is_file()

    # poison the stored best with an unbeatable value (lower-is-better)
    with open(last, "rb") as f:
        payload = pickle.load(f)
    payload["extra"]["best"] = 0.0
    with open(last, "wb") as f:
        pickle.dump(payload, f)

    # plain resume keeps restoring it: no new checkpoint_best appears
    (Path(save_dir) / "checkpoint_best.ckpt").unlink()
    train.main(_train_args(data, save_dir, ["--max-update", "3"]))
    assert not (Path(save_dir) / "checkpoint_best.ckpt").is_file()

    # warm start with --reset-optimizer discards it: best tracking starts
    # fresh and checkpoint_best is written on the first validation
    train.main(_train_args(
        data, save_dir, ["--max-update", "4", "--reset-optimizer"]
    ))
    assert (Path(save_dir) / "checkpoint_best.ckpt").is_file()


@pytest.mark.quick
def test_decode_clis_reject_multihost(monkeypatch):
    """r4 review fix: decode-side CLIs gather sharded outputs to one host
    and write a single results file — under a multi-host job they must fail
    fast instead of racing on the shared path."""
    import jax

    from chimera_st_tpu.cli import options

    options.require_single_host("chimera-generate")  # 1 process: no-op
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(SystemExit, match="multi-host"):
        options.require_single_host("chimera-generate")
