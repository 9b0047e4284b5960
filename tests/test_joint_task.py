import numpy as np
import pytest

from tests.synthetic_data import make_parallel_text, make_triplet_dir


@pytest.fixture(scope="module")
def joint_setup(tmp_path_factory):
    """ST (triplet) + MT (translation) sub-tasks over a shared vocabulary."""
    from chimera_st_tpu.cli import preprocess
    from chimera_st_tpu.tasks import setup_task

    st_dir = make_triplet_dir(str(tmp_path_factory.mktemp("st")))
    raw = make_parallel_text(str(tmp_path_factory.mktemp("raw")))
    bin_dir = str(tmp_path_factory.mktemp("bin"))
    # joint vocabulary: reuse the triplet dict for both sides (--srcdict
    # alone builds the target dict from data like the reference, which
    # would break joint_task_mtst's shared-vocabulary requirement)
    preprocess.main([
        "-s", "de", "-t", "en",
        "--trainpref", f"{raw}/train", "--validpref", f"{raw}/valid",
        "--destdir", bin_dir, "--srcdict", f"{st_dir}/dict.txt",
        "--tgtdict", f"{st_dir}/dict.txt",
    ])
    cfg = {
        "_name": "joint_task_mtst",
        "main_task": "st",
        "task_configs": [
            {
                "task_name": "st",
                "sample_ratio": 1.0,
                "weight": 1.0,
                "task": {"_name": "triplet", "data": st_dir},
                "criterion": {
                    "_name": "triplet_st_mt_contrastive",
                    "label_smoothing": 0.1,
                    "loss_ratio": (1.0, 1.0, 1.0),
                },
            },
            {
                "task_name": "mt",
                "sample_ratio": 0.5,
                "weight": 0.5,
                "task": {"_name": "translation", "data": bin_dir,
                         "source_lang": "de", "target_lang": "en"},
                "criterion": {
                    "_name": "label_smoothed_cross_entropy",
                    "label_smoothing": 0.1,
                },
            },
        ],
    }
    task = setup_task(cfg)
    task.load_dataset("train")
    return task


def test_joint_setup_and_schedule(joint_setup):
    task = joint_setup
    assert set(task.sub_tasks) == {"st", "mt"}
    batches = list(task.make_joint_iterator("train", max_sentences=4, epoch=1))
    names = [b["task_name"] for b in batches]
    assert "st" in names and "mt" in names
    # deterministic per epoch
    batches2 = list(task.make_joint_iterator("train", max_sentences=4, epoch=1))
    assert [b["task_name"] for b in batches2] == names


def test_joint_criterion_dispatch_and_train(joint_setup):
    import jax
    import jax.numpy as jnp

    from chimera_st_tpu.optim import build_lr_schedule, build_optimizer
    from chimera_st_tpu.train.trainer import Trainer
    from tests.synthetic_data import TINY_ARCH_FLAGS

    task = joint_setup
    # tiny arch flags -> dict
    overrides = {}
    it = iter(TINY_ARCH_FLAGS)
    for k in it:
        import ast

        v = next(it)
        try:
            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass
        overrides[k[2:].replace("-", "_")] = v
    model = task.build_model({"arch": "s2t_transformer_w2v2_interlingua_base", **overrides})
    criterion = task.build_criterion({"_name": "label_smoothed_cross_entropy"})

    from chimera_st_tpu.models.interlingua import ChimeraInterlinguaModel

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 1000), jnp.float32),
        jnp.zeros((1, 1000), bool),
        jnp.zeros((1, 4), jnp.int32),
        jnp.zeros((1, 4), jnp.int32),
        method=ChimeraInterlinguaModel.init_everything,
    )
    sched = build_lr_schedule({"_name": "fixed", "lr": 1e-3})
    tx = build_optimizer({"_name": "adam"}, sched)
    trainer = Trainer(model, criterion, tx, params)

    seen = set()
    for batch in task.make_joint_iterator("train", max_sentences=4, epoch=1):
        name = batch["task_name"]
        out = trainer.train_step([batch])
        assert np.isfinite(out["loss"]).all()
        seen.add(name)
        if seen == {"st", "mt"}:
            break
    assert seen == {"st", "mt"}
    assert trainer.num_updates >= 2
