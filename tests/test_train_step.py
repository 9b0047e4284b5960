import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_st_tpu.config.registry import CRITERIONS
from chimera_st_tpu.criterions import label_smoothed_nll_loss  # noqa: F401 (registration)
from chimera_st_tpu.models.interlingua import ChimeraInterlinguaModel
from chimera_st_tpu.optim import build_lr_schedule, build_optimizer
from chimera_st_tpu.train import TrainState, make_train_step, make_valid_step
from chimera_st_tpu.train.train_step import create_train_state
from tests.test_interlingua_model import TINY


def _make_batch(rng, B=4, T=400, S=6, U=5):
    tgt = rng.integers(4, TINY.tgt_vocab_size, size=(B, U)).astype(np.int32)
    tgt[:, -1] = 2
    prev = np.concatenate([np.full((B, 1), 2, np.int32), tgt[:, :-1]], axis=1)
    return {
        "audio": jnp.asarray(rng.normal(size=(B, T)), jnp.float32),
        "audio_padding_mask": jnp.zeros((B, T), bool),
        "src_text": jnp.asarray(
            rng.integers(4, TINY.src_vocab_size, size=(B, S)), jnp.int32
        ),
        "prev_output_tokens": jnp.asarray(prev),
        "target": jnp.asarray(tgt),
        "ntokens": jnp.asarray(B * U, jnp.float32),
    }


@pytest.fixture(scope="module")
def setup():
    model = ChimeraInterlinguaModel(TINY)
    rng = np.random.default_rng(0)
    batch = _make_batch(rng)
    params = model.init(
        jax.random.PRNGKey(0),
        batch["audio"][:1],
        batch["audio_padding_mask"][:1],
        batch["src_text"][:1],
        batch["prev_output_tokens"][:1],
        method=ChimeraInterlinguaModel.init_everything,
    )
    return model, params, batch


def test_label_smoothed_nll_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    logits = rng.normal(size=(3, 4, 9)).astype(np.float32)
    target = rng.integers(0, 9, size=(3, 4))
    target[0, 3] = 1  # pad
    lp = jax.nn.log_softmax(jnp.asarray(logits), -1)
    loss, nll = label_smoothed_nll_loss(lp, jnp.asarray(target), 0.1, ignore_index=1)

    tlp = F.log_softmax(torch.tensor(logits), -1)
    t = torch.tensor(target)
    tn = -tlp.gather(-1, t.unsqueeze(-1)).squeeze(-1)
    ts = -tlp.sum(-1)
    mask = t.eq(1)
    tn = tn.masked_fill(mask, 0).sum()
    ts = ts.masked_fill(mask, 0).sum()
    ref = (1 - 0.1) * tn + (0.1 / 9) * ts
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)
    np.testing.assert_allclose(float(nll), float(tn), rtol=1e-5)


def test_triplet_criterion_components(setup):
    model, params, batch = setup
    crit = CRITERIONS.get("triplet_st_mt_contrastive")(
        {"label_smoothing": 0.1, "loss_ratio": (1.0, 1.0, 1.0)}
    )
    loss, ss, logging = crit(model, params, batch, train=False)
    assert float(loss) > 0
    for k in ("st_loss", "mt_loss", "contrastive_loss", "nll_loss"):
        assert np.isfinite(float(logging[k])), k
    # ratios zero out terms
    crit_st = CRITERIONS.get("triplet_st_mt_contrastive")(
        {"label_smoothing": 0.1, "loss_ratio": (1.0, 0.0, 0.0)}
    )
    loss_st, _, logging_st = crit_st(model, params, batch, train=False)
    np.testing.assert_allclose(float(loss_st), float(logging_st["st_loss"]), rtol=1e-6)


def test_contrastive_identical_memories_is_minimal():
    from chimera_st_tpu.criterions.triplet import memory_contrastive_loss

    rng = np.random.default_rng(2)
    mem = jnp.asarray(rng.normal(size=(2, 4, 8)), jnp.float32)
    same = memory_contrastive_loss(mem, mem)
    other = memory_contrastive_loss(
        mem, jnp.asarray(rng.normal(size=(2, 4, 8)), jnp.float32)
    )
    assert float(same) < float(other)


def test_train_step_loss_decreases(setup):
    model, params, batch = setup
    crit = CRITERIONS.get("triplet_st_mt_contrastive")(
        {"label_smoothing": 0.1, "loss_ratio": (1.0, 1.0, 1.0)}
    )
    sched = build_lr_schedule({"_name": "inverse_sqrt", "lr": 1e-3, "warmup_updates": 2})
    tx = build_optimizer({"_name": "adam", "adam_betas": "(0.9, 0.98)"}, sched, clip_norm=10.0)
    step = make_train_step(model, crit, tx, lr_schedule=sched, donate=False)
    state = create_train_state(params, tx)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]) / float(metrics["sample_size"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    assert np.isfinite(float(metrics["gnorm"]))


def test_grad_accumulation_equivalence(setup):
    """accum=2 over two half-batches must equal accum=1 over the full batch
    (same total sample-size normalization), up to numerics. Uses a
    zero-dropout model so the two paths are deterministic."""
    import dataclasses

    _, params, batch = setup
    nodrop = dataclasses.replace(
        TINY,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        w2v2_dropout=0.0,
        w2v2_attention_dropout=0.0,
        w2v2_activation_dropout=0.0,
    )
    model = ChimeraInterlinguaModel(nodrop)
    crit = CRITERIONS.get("triplet_st_mt_contrastive")(
        {"label_smoothing": 0.0, "loss_ratio": (1.0, 0.0, 0.0)}
    )
    sched = build_lr_schedule({"_name": "fixed", "lr": 1e-2})
    tx = build_optimizer({"_name": "sgd"}, sched)

    full = {k: v for k, v in batch.items()}
    step1 = make_train_step(model, crit, tx, accum_steps=1, donate=False)
    s1 = create_train_state(params, tx)
    s1, m1 = step1(s1, full, jax.random.PRNGKey(0))

    def split(x):
        if x.ndim == 0:  # scalars (ntokens): half per microbatch
            return jnp.stack([x / 2, x / 2])
        return jnp.stack([x[:2], x[2:]])

    micro = {k: split(v) for k, v in batch.items()}
    step2 = make_train_step(model, crit, tx, accum_steps=2, donate=False)
    s2 = create_train_state(params, tx)
    s2, m2 = step2(s2, micro, jax.random.PRNGKey(0))

    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s2.params
    )
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5


def test_valid_step(setup):
    model, params, batch = setup
    crit = CRITERIONS.get("triplet_st_mt_contrastive")({"loss_ratio": (1.0, 1.0, 1.0)})
    vstep = make_valid_step(model, crit)
    logging = vstep(params, batch)
    assert np.isfinite(float(logging["loss"]))


def test_train_step_on_mesh(setup):
    """Full train step over an 8-device mesh with data-sharded batch."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from chimera_st_tpu.parallel import make_mesh, param_partition_specs, shard_params

    model, params, batch = setup
    mesh = make_mesh(data_parallel=4, model_parallel=2)
    crit = CRITERIONS.get("triplet_st_mt_contrastive")(
        {"label_smoothing": 0.1, "loss_ratio": (1.0, 1.0, 1.0)}
    )
    sched = build_lr_schedule({"_name": "inverse_sqrt", "lr": 1e-3, "warmup_updates": 4})
    tx = build_optimizer({"_name": "adam"}, sched, clip_norm=1.0)

    sharded_params = shard_params(params, mesh)
    state = create_train_state(sharded_params, tx)
    step = make_train_step(model, crit, tx, donate=False)

    def shard_batch(x):
        if getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, NamedSharding(mesh, P("data")))
        return jax.device_put(x, NamedSharding(mesh, P()))

    sbatch = {k: shard_batch(v) for k, v in batch.items()}
    with mesh:
        state, metrics = step(state, sbatch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_train_step_tp_plus_zero1(setup):
    """TP (4x2 mesh) composed with ZeRO-1 optimizer-state sharding: two
    applied updates keep the moment shardings and a finite loss."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from chimera_st_tpu.parallel import make_mesh, shard_params
    from chimera_st_tpu.train.train_step import create_train_state

    model, params, batch = setup
    mesh = make_mesh(data_parallel=4, model_parallel=2)
    crit = CRITERIONS.get("triplet_st_mt_contrastive")(
        {"label_smoothing": 0.1, "loss_ratio": (1.0, 1.0, 1.0)}
    )
    sched = build_lr_schedule({"_name": "inverse_sqrt", "lr": 1e-3, "warmup_updates": 4})
    tx = build_optimizer({"_name": "adam"}, sched, clip_norm=1.0)

    sharded_params = shard_params(params, mesh)
    state = create_train_state(sharded_params, tx, mesh=mesh, zero_sharding="os")
    opt_shardings = jax.tree_util.tree_map(lambda x: x.sharding, state.opt_state)
    step = make_train_step(
        model, crit, tx, donate=False, opt_state_shardings=opt_shardings
    )

    def shard_leaf(x):
        if getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, NamedSharding(mesh, P("data")))
        return jax.device_put(x, NamedSharding(mesh, P()))

    sbatch = {k: shard_leaf(v) for k, v in batch.items()}
    with mesh:
        state, m1 = step(state, sbatch, jax.random.PRNGKey(0))
        state, m2 = step(state, sbatch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m2["loss"]))
    assert int(state.step) == 2
    # moments stay data-sharded after applied updates
    def axes_in_spec(leaf):
        spec = getattr(getattr(leaf, "sharding", None), "spec", None) or ()
        return {ax for ax in spec if ax}

    leaves = jax.tree_util.tree_leaves(state.opt_state)
    assert sum(1 for l in leaves if "data" in axes_in_spec(l)) > 0
    # moments of TP-sharded params keep the model axis (ZeRO-over-TP layout:
    # grads/moments/params agree, no per-step resharding)
    assert sum(1 for l in leaves if "model" in axes_in_spec(l)) > 0
    assert sum(1 for l in leaves if {"data", "model"} <= axes_in_spec(l)) > 0


def test_zero1_over_tp_factored_moments():
    """Optimizers whose moments are NOT param-shaped (adafactor's factored
    row/col stats reduce one param dim away) must not inherit the param's TP
    spec — regression for a device_put crash on adafactor + --zero-sharding
    os over a model axis. They fall back to plain data sharding."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from chimera_st_tpu.parallel import make_mesh, shard_params
    from chimera_st_tpu.train.train_step import create_train_state

    mesh = make_mesh(data_parallel=4, model_parallel=2)
    params = {
        "layer": {"fc1": {"kernel": jnp.ones((64, 128)),
                          "bias": jnp.zeros((128,))}}
    }
    placed = shard_params(params, mesh)
    for tx in (
        optax.adafactor(learning_rate=1e-3),  # factored: rank-reduced moments
        optax.adam(1e-3),  # param-shaped: keeps the TP spec + data axis
    ):
        state = create_train_state(placed, tx, mesh=mesh, zero_sharding="os")
        for leaf in jax.tree_util.tree_leaves(state.opt_state):
            spec = getattr(getattr(leaf, "sharding", None), "spec", None)
            if spec is None:
                continue
            assert len(spec) <= leaf.ndim
            for i, ax in enumerate(spec):
                if ax:
                    assert leaf.shape[i] % mesh.shape[ax] == 0


def test_zero1_with_freeze_wrapped_optimizer():
    """--zero-sharding os + --fix-* flags: the freeze controls wrap the
    optimizer in optax.multi_transform, which optax.tree_map_params cannot
    traverse — the spec builder must fall back to data-only moment sharding
    instead of crashing at startup (review fix, reproduced)."""
    import optax

    from chimera_st_tpu.optim.freeze import wrap_freeze
    from chimera_st_tpu.parallel import make_mesh, shard_params
    from chimera_st_tpu.train.train_step import create_train_state

    mesh = make_mesh(data_parallel=4, model_parallel=2)
    params = {
        "wav2vec_model": {"fc1": {"kernel": jnp.ones((64, 128))}},
        "decoder": {"fc2": {"kernel": jnp.ones((128, 64))}},
    }
    placed = shard_params(params, mesh)
    tx = wrap_freeze(optax.adam(1e-3), params, ["fix_wav2vec"])
    state = create_train_state(placed, tx, mesh=mesh, zero_sharding="os")
    # moments exist and carry valid (divisible) shardings
    for leaf in jax.tree_util.tree_leaves(state.opt_state):
        spec = getattr(getattr(leaf, "sharding", None), "spec", None)
        if spec is None:
            continue
        for i, ax in enumerate(spec):
            if ax:
                assert leaf.shape[i] % mesh.shape[ax] == 0


def test_zero1_gate_matches_on_tp_only_mesh():
    """zero_sharding='os' on a mesh whose data axis is 1 (TP-only): the
    Trainer must not capture opt-state shardings that create_train_state
    never placed — the first jitted update used to crash on
    with_sharding_constraint (review fix, reproduced)."""
    import optax

    from chimera_st_tpu.parallel import make_mesh, shard_params
    from chimera_st_tpu.train.train_step import create_train_state

    mesh = make_mesh(data_parallel=1, model_parallel=8)
    params = {"layer": {"fc1": {"kernel": jnp.ones((64, 128))}}}
    placed = shard_params(params, mesh)
    tx = optax.adam(1e-3)
    state = create_train_state(placed, tx, mesh=mesh, zero_sharding="os")
    # mirror the Trainer's gate: opt shardings only when data > 1
    opt_shardings = None
    if mesh.shape.get("data", 1) > 1:
        opt_shardings = jax.tree_util.tree_map(
            lambda x: x.sharding, state.opt_state
        )
    # the gate itself is the regression surface: with data=1 the Trainer
    # must not thread opt-state shardings into the jitted apply step
    assert opt_shardings is None
    assert state.opt_state is not None


def test_nonfinite_grad_paths_naming():
    """Skip-path diagnosis names the offending grad subtrees (replaces the
    reference's NanDetector hook re-run, fairseq/nan_detector.py:14)."""
    import jax.numpy as jnp

    from chimera_st_tpu.train.trainer import nonfinite_grad_paths

    grads = {
        "encoder": {"kernel": jnp.ones((2, 2)),
                    "bias": jnp.array([jnp.nan, 0.0])},
        "decoder": {"kernel": jnp.array([[jnp.inf]])},
    }
    assert nonfinite_grad_paths(grads) == ["decoder/kernel", "encoder/bias"]
    assert nonfinite_grad_paths({"a": jnp.zeros(3)}) == []


def test_triplet_samplecontrastive_criterion(setup):
    """The sample-contrastive variant through its registry name (reference:
    criterions/triplet_st_mt_samplecontrastive.py): contrasts across
    samples, so identical memory banks minimize it."""
    model, params, batch = setup
    crit = CRITERIONS.get("triplet_st_mt_samplecontrastive")(
        {"label_smoothing": 0.1, "loss_ratio": (1.0, 1.0, 1.0)}
    )
    loss, ss, logging = crit(model, params, batch, train=False)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert np.isfinite(float(logging["contrastive_loss"]))
    # differs from the per-memory-slot variant on the same inputs
    base = CRITERIONS.get("triplet_st_mt_contrastive")(
        {"label_smoothing": 0.1, "loss_ratio": (1.0, 1.0, 1.0)}
    )
    loss_b, _, logging_b = base(model, params, batch, train=False)
    assert abs(float(logging["contrastive_loss"])
               - float(logging_b["contrastive_loss"])) > 1e-6
