"""Train-side flag tail (reference dataclass/configs.py groups):
--user-dir plugin loading, --finetune-from-model warm start,
--no-save-optimizer-state, --keep-best-checkpoints/--no-last-checkpoints,
--curriculum / --validate-after-updates / valid-specific budgets, --cpu."""

import pickle
from pathlib import Path

import numpy as np
import pytest

from tests.synthetic_data import TINY_ARCH_FLAGS, make_parallel_text

BASE = [
    "--task", "translation", "-s", "de", "-t", "en",
    "--arch", "s2t_transformer_w2v2_interlingua_base",
    *TINY_ARCH_FLAGS,
    "--criterion", "label_smoothed_cross_entropy",
    "--optimizer", "adam", "--lr", "1e-3", "--lr-scheduler", "fixed",
    "--batch-size", "8", "--dtype", "float32", "--num-length-buckets", "2",
]


@pytest.fixture(scope="module")
def bin_dir(tmp_path_factory):
    from chimera_st_tpu.cli import preprocess

    root = tmp_path_factory.mktemp("flags")
    raw = make_parallel_text(str(root / "raw"))
    out = str(root / "bin")
    preprocess.main([
        "-s", "de", "-t", "en",
        "--trainpref", f"{raw}/train", "--validpref", f"{raw}/valid",
        "--destdir", out, "--joined-dictionary",
    ])
    return out


@pytest.mark.slow
def test_user_dir_plugin_loading(bin_dir, tmp_path):
    """--user-dir imports a module whose @register_* decorators run before
    task/criterion resolution (reference: utils.import_user_module)."""
    from chimera_st_tpu.cli import train

    plug = tmp_path / "my_plugins"
    plug.mkdir()
    (plug / "__init__.py").write_text(
        "from chimera_st_tpu.config.registry import CRITERIONS, "
        "register_criterion\n"
        "_base = CRITERIONS.get('label_smoothed_cross_entropy')\n"
        "@register_criterion('user_xent')\n"
        "def user_xent(cfg):\n"
        "    return _base(cfg)\n"
    )
    save_dir = str(tmp_path / "ckpt")
    train.main([bin_dir] + BASE + [
        "--user-dir", str(plug), "--criterion", "user_xent",
        "--max-update", "1", "--save-dir", save_dir, "--disable-validation",
    ])
    assert (Path(save_dir) / "checkpoint_last.ckpt").is_file()

    # a bogus path errors loudly
    from chimera_st_tpu.cli.options import import_user_module

    with pytest.raises(FileNotFoundError):
        import_user_module(str(tmp_path / "nope"))


@pytest.mark.slow
def test_finetune_from_model_and_no_save_optimizer_state(bin_dir, tmp_path):
    from chimera_st_tpu.cli import train

    pre = str(tmp_path / "pretrain")
    train.main([bin_dir] + BASE + [
        "--max-update", "2", "--save-dir", pre, "--disable-validation",
        "--no-save-optimizer-state", "--seed", "3",
    ])
    ckpt = Path(pre) / "checkpoint_last.ckpt"
    payload = pickle.loads(ckpt.read_bytes())
    assert payload["opt_state"] is None  # moments excluded
    assert payload["step"] == 2

    # warm start: params come from the checkpoint, step/optimizer are fresh
    ft = str(tmp_path / "finetune")
    train.main([bin_dir] + BASE + [
        "--max-update", "1", "--save-dir", ft, "--disable-validation",
        "--finetune-from-model", str(ckpt), "--seed", "4",
    ])
    ft_payload = pickle.loads((Path(ft) / "checkpoint_last.ckpt").read_bytes())
    assert ft_payload["step"] == 1  # fresh optimizer: 1 update, not 3

    # relaunching the SAME finetune command resumes its own checkpoint_last
    # instead of re-applying the warm start (review finding: preempted runs
    # must not silently restart from the pretrained params)
    train.main([bin_dir] + BASE + [
        "--max-update", "2", "--save-dir", ft, "--disable-validation",
        "--finetune-from-model", str(ckpt), "--seed", "4",
    ])
    ft_payload2 = pickle.loads((Path(ft) / "checkpoint_last.ckpt").read_bytes())
    assert ft_payload2["step"] == 2  # resumed from step 1, not re-warmed to 0

    # mutual exclusion with --reset-* (reference checkpoint_utils behavior)
    with pytest.raises(SystemExit):
        train.main([bin_dir] + BASE + [
            "--max-update", "1", "--save-dir", str(tmp_path / "x"),
            "--disable-validation",
            "--finetune-from-model", str(ckpt), "--reset-optimizer",
        ])


@pytest.mark.slow
def test_curriculum_and_valid_budgets(bin_dir, tmp_path):
    """--curriculum serves unshuffled epochs; --batch-size-valid /
    --validate-after-updates gate validation; run must complete end to end."""
    from chimera_st_tpu.cli import train

    save_dir = str(tmp_path / "cur")
    train.main([bin_dir] + BASE + [
        "--max-epoch", "2", "--max-update", "6", "--save-dir", save_dir,
        "--curriculum", "1", "--batch-size-valid", "4",
        "--validate-after-updates", "2", "--fixed-validation-seed", "7",
        "--keep-best-checkpoints", "1",
    ])
    assert (Path(save_dir) / "checkpoint_best.ckpt").is_file()


def test_no_last_and_keep_best_pruning(tmp_path):
    """CheckpointManager: --no-last-checkpoints writes no checkpoint_last;
    --keep-best-checkpoints N prunes to the N best by the val metric."""
    import jax.numpy as jnp

    from chimera_st_tpu.checkpoint.store import CheckpointManager
    from chimera_st_tpu.train.train_step import TrainState

    state = TrainState(step=jnp.asarray(0), params={"w": jnp.zeros(2)},
                       opt_state=())
    mgr = CheckpointManager(
        str(tmp_path), keep_best_checkpoints=2, no_last=True, no_epoch=True,
    )
    for ep, val in enumerate([3.0, 1.0, 2.0, 0.5], start=1):
        mgr.save(state, {}, epoch=ep, updates=ep, val_metric=val)
    names = sorted(f.name for f in tmp_path.glob("*.ckpt"))
    assert "checkpoint_last.ckpt" not in names
    assert "checkpoint_best.ckpt" in names
    best_files = [n for n in names if n.startswith("checkpoint.best_")]
    assert len(best_files) <= 2
