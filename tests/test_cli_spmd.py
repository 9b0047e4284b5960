"""CLI-level SPMD tests (VERDICT r1 item 3): the real `chimera-train` path
must (i) place params and batches on the mesh with the expected shardings,
(ii) produce the same loss trajectory as a single-device run, and
(iii) shard optimizer state over the data axis under --zero-sharding os.

Runs on the 8-device CPU mesh forced by conftest.py."""

import numpy as np
import pytest

from tests.synthetic_data import TINY_ARCH_FLAGS, make_triplet_dir


def _train_args(data_dir, save_dir, world_size, extra=None):
    return [
        data_dir, "--task", "triplet",
        "--arch", "s2t_transformer_w2v2_interlingua_base",
        *TINY_ARCH_FLAGS,
        "--criterion", "triplet_st_mt_contrastive",
        "--label-smoothing", "0.1",
        "--optimizer", "adam", "--lr", "1e-3",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "2",
        "--batch-size", "8", "--required-batch-size-multiple", "8",
        "--num-length-buckets", "1",
        "--save-dir", save_dir, "--log-interval", "1",
        "--dtype", "float32",
        # sync per-update reads: RecordingTrainer inspects train_step's
        # return value, which async dispatch defers to drain_metrics()
        "--async-dispatch", "0",
        "--disable-validation", "--no-save",
        "--max-update", "3",
        "--distributed-world-size", str(world_size),
        *(extra or []),
    ]


@pytest.fixture()
def recording(monkeypatch):
    """Wrap the Trainer so the CLI run records losses/batches/instance."""
    from chimera_st_tpu.train import trainer as trainer_mod

    records = {"losses": [], "batches": [], "trainer": None}
    orig_step = trainer_mod.Trainer.train_step
    orig_to_device = trainer_mod.Trainer.to_device

    class RecordingTrainer(trainer_mod.Trainer):
        def to_device(self, batch):
            out = orig_to_device(self, batch)
            records["batches"].append(out)
            return out

        def train_step(self, microbatches, seed=0):
            records["trainer"] = self
            out = orig_step(self, microbatches, seed=seed)
            records["losses"].append(float(out["loss"]) / max(float(out["sample_size"]), 1.0))
            return out

    monkeypatch.setattr(trainer_mod, "Trainer", RecordingTrainer)
    return records


def _run(data_dir, save_dir, world_size, records, extra=None):
    from chimera_st_tpu.cli import train as train_cli
    from chimera_st_tpu.logging import metrics as metrics_mod

    metrics_mod.reset()
    records["losses"].clear()
    records["batches"].clear()
    train_cli.main(_train_args(data_dir, save_dir, world_size, extra))
    return list(records["losses"]), list(records["batches"]), records["trainer"]


def test_cli_spmd_matches_single_device(tmp_path, recording):
    import jax

    data_dir = make_triplet_dir(str(tmp_path / "data"))

    losses_1, _, _ = _run(data_dir, str(tmp_path / "c1"), 1, recording)
    losses_8, batches_8, trainer_8 = _run(data_dir, str(tmp_path / "c8"), 8, recording)

    assert len(losses_1) == len(losses_8) == 3

    # (i) shardings: batch leading dims over 'data', params replicated on all 8
    assert trainer_8.mesh is not None and trainer_8.mesh.devices.size == 8
    saw_data_sharded = False
    for batch in batches_8:
        for k, v in batch.items():
            assert len(v.sharding.device_set) == 8, k
            if v.ndim >= 1 and v.shape[0] % 8 == 0:
                assert v.sharding.spec[0] == "data", (k, v.sharding)
                saw_data_sharded = True
    assert saw_data_sharded
    for leaf in jax.tree_util.tree_leaves(trainer_8.state.params):
        assert len(leaf.sharding.device_set) == 8

    # (ii) loss trajectory matches the single-device run
    np.testing.assert_allclose(losses_1, losses_8, rtol=2e-4)


def test_cli_zero1_shards_opt_state(tmp_path, recording):
    import jax

    data_dir = make_triplet_dir(str(tmp_path / "data"))
    _, _, trainer = _run(
        data_dir, str(tmp_path / "cz"), 8, recording,
        extra=["--zero-sharding", "os"],
    )
    # at least one optimizer moment must be sharded over 'data', and the
    # sharding must survive an applied update (with_sharding_constraint path)
    sharded = [
        leaf
        for leaf in jax.tree_util.tree_leaves(trainer.state.opt_state)
        if hasattr(leaf, "sharding")
        and getattr(leaf.sharding, "spec", None)
        and any(ax == "data" for ax in leaf.sharding.spec if ax)
    ]
    assert sharded, "no opt-state leaf sharded over the data axis"
