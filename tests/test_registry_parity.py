"""Registry-name parity vs the reference, enforced.

``tests/data/reference_registry_names.json`` is a frozen extraction of every
``@register_*("name")`` / ``@register_*(name=..., arch_name=...)`` literal —
positional AND keyword decorator forms (the r4 extractor missed kwarg-form
``register_model_architecture``, dropping the berard 512 presets) — in the
reference tree (fairseq/ + fairseq_cli/ + chimera/, 226 names across
model/architecture/task/criterion/optimizer/lr_scheduler/bpe/tokenizer/
scoring). Every name must either resolve in our registries or
appear in the documented not-applicable table below with a reason — so the
PARITY.md claim ("zero unmentioned core reference registry names") cannot
silently regress.
"""

import json
from pathlib import Path

import pytest

import chimera_st_tpu.criterions  # noqa: F401 — registration side effects
import chimera_st_tpu.data  # noqa: F401
import chimera_st_tpu.models  # noqa: F401
import chimera_st_tpu.optim  # noqa: F401
import chimera_st_tpu.scoring  # noqa: F401
import chimera_st_tpu.tasks  # noqa: F401
from chimera_st_tpu.config import registry as R

pytestmark = pytest.mark.quick

FROZEN = Path(__file__).parent / "data" / "reference_registry_names.json"

REGISTRIES = {
    "task": R.TASKS,
    "model": R.MODELS,
    "architecture": R.ARCHITECTURES,
    "criterion": R.CRITERIONS,
    "optimizer": R.OPTIMIZERS,
    "lr_scheduler": R.LR_SCHEDULERS,
    "bpe": R.BPE,
    "tokenizer": R.TOKENIZERS,
    "scoring": R.SCORERS,
}

# Names that deliberately do NOT resolve, with the superseding design.
# Keep in sync with PARITY.md's "known deltas" table.
NOT_APPLICABLE = {
    # megatron-style intra-layer model parallel (reference fairseq/model_parallel/*,
    # guarded on a mpu import): superseded by SPMD tensor parallelism — any model
    # trains model-parallel via the mesh's `model` axis + PartitionSpecs
    # (parallel/mesh.py, parallel/tp.py); there is no separate model class to name.
    "model:model_parallel_transformer",
    "model:model_parallel_transformer_lm",
    "model:model_parallel_roberta",
    "architecture:model_parallel_roberta",
    "architecture:model_parallel_roberta_base",
    "architecture:model_parallel_roberta_large",
    "criterion:vocab_parallel_cross_entropy",
    # fairscale Pipe wrapper (reference pipeline_parallel_transformer/model.py):
    # superseded by the SPMD GPipe program (parallel/pipeline.py) reachable via
    # --pipeline-stages on transformer/transformer_lm and the capacity variant
    # transformer_lm_pipe.
    "model:pipeline_parallel_transformer",
    # docstring example, not a real registration (reference
    # fairseq/tasks/__init__.py:36 shows `@register_task('classification')`
    # inside the module docstring; no such task exists in the reference either).
    "task:classification",
}


def test_every_reference_registry_name_resolves_or_is_documented():
    frozen = json.loads(FROZEN.read_text())
    unexplained = []
    for key, ref_path in sorted(frozen.items()):
        kind, name = key.split(":", 1)
        if key in NOT_APPLICABLE:
            assert name not in REGISTRIES[kind], (
                f"{key} is in the NOT_APPLICABLE table but now resolves — "
                "remove the table entry"
            )
            continue
        if name not in REGISTRIES[kind]:
            unexplained.append(f"{key} ({ref_path})")
    assert not unexplained, (
        "reference registry names that neither resolve nor appear in the "
        "documented NOT_APPLICABLE table:\n  " + "\n  ".join(unexplained)
    )


def test_joint_shims_raise_migration_pointer():
    """joint_model/joint_criterion resolve but explain the joint_task design
    instead of building (reference models/joint_model.py:20,
    criterions/joint_criterion.py:13)."""
    with pytest.raises(SystemExit, match="joint_task"):
        R.MODELS.get("joint_model")({})
    with pytest.raises(SystemExit, match="joint_task"):
        R.CRITERIONS.get("joint_criterion")({})


def test_dummy_model_forward():
    """dummy_model builds and produces [B, T, V] logits on dummy_lm-style
    tokens (reference benchmark/dummy_model.py:17)."""
    import jax
    import jax.numpy as jnp

    build = R.MODELS.get("dummy_model")
    model = build({"vocab_size": 16, "embed_dim": 8, "layers": 2, "dropout": 0.0})
    tokens = jnp.ones((2, 5), dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens)
    logits = model.apply(params, tokens, deterministic=True)
    assert logits.shape == (2, 5, 16)
