"""Joint multi-task training (reference: fairseq/tasks/joint_task.py:29-373,
fairseq/tasks/joint_mtst.py:42-104, fairseq/models/joint_model.py:20-133).

TPU-native redesign: the reference swaps shared nn.Modules in and out of
sub-models per step (ShiftModelContext / cache_module, joint_task.py:326-340)
because torch modules own their parameters. In JAX parameters are one pytree,
so "module sharing" is simply *one* parameter tree serving every sub-task:

- `joint_task_mtst` (the Chimera MT+ST recipe): a single interlingua model —
  its text branch is the MT model, its audio branch the ST model, the decoder
  and interlingua memory shared by construction (exactly the sharing set the
  reference configures via module swapping, joint_mtst.py:42-104, given the
  joint SPM vocabulary the recipes use),
- per-task datasets / criterions / sample ratios / metric namespaces
  ("train:<task>", reference joint_task.py:342-373) are preserved,
- batches carry ``task_name``; the joint criterion dispatches on it (the
  dispatch is host-side, so each task gets its own compiled step — no
  dynamic branching inside jit).
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from ..config.registry import (
    CRITERIONS,
    register_criterion,
    register_model,
    register_model_architecture,
    register_task,
)
from ..data.joint_dataset import JointBatchSchedule
from .base import ChimeraTask

logger = logging.getLogger(__name__)


def _load_task_config(entry):
    """Per-task config entries are dicts (programmatic use) or YAML/JSON
    file paths (the CLI's ``--task-configs st.yaml mt.yaml`` — reference:
    tasks/joint_task.py:34 --task-configs file list, with the dumps produced
    by fairseq_cli/train.py:388-397 --save-task-config)."""
    if isinstance(entry, dict):
        return entry
    path = str(entry)
    with open(path) as f:
        if path.endswith((".yaml", ".yml")):
            import yaml

            return yaml.safe_load(f)
        import json

        return json.load(f)


@register_task("joint_task")
class JointTrainingTask(ChimeraTask):
    """Generic N-sub-task scheduler over one shared parameter tree."""

    def __init__(self, cfg: Dict, sub_tasks: Dict[str, ChimeraTask],
                 weights: Dict[str, float], ratios: Dict[str, float]):
        super().__init__(cfg)
        self.sub_tasks = sub_tasks
        self.weights = weights
        self.ratios = ratios
        self.main_task_name = cfg.get("main_task") or next(iter(sub_tasks))

    @classmethod
    def setup_task(cls, cfg: Dict, **kwargs):
        from . import setup_task as setup_sub

        cfg = dict(cfg)
        cfg["task_configs"] = [
            _load_task_config(tc) for tc in cfg["task_configs"]
        ]
        sub_tasks, weights, ratios = {}, {}, {}
        for task_cfg in cfg["task_configs"]:
            name = task_cfg["task_name"]
            weights[name] = float(task_cfg.get("weight", 1.0))
            ratios[name] = float(task_cfg.get("sample_ratio", 1.0))
            sub_tasks[name] = setup_sub(dict(task_cfg["task"]))
        logger.info(f"joint task with sub-tasks: {list(sub_tasks)}")
        return cls(cfg, sub_tasks, weights, ratios)

    @property
    def main_task(self) -> ChimeraTask:
        return self.sub_tasks[self.main_task_name]

    @property
    def source_dictionary(self):
        return self.main_task.source_dictionary

    @property
    def target_dictionary(self):
        return self.main_task.target_dictionary

    def load_dataset(self, split: str, **kwargs):
        for name, t in self.sub_tasks.items():
            t.load_dataset(split)
        self.datasets[split] = {n: t.dataset(split) for n, t in self.sub_tasks.items()}

    def build_model(self, model_cfg: Dict, **kw):
        # one shared model built against the main task's dictionaries
        return self.main_task.build_model(model_cfg, **kw)

    def build_criterion(self, crit_cfg: Dict):
        """Returns a dispatching criterion: batch['task_name'] selects the
        sub-criterion; the loss is weighted by the task weight."""
        import chimera_st_tpu.criterions  # noqa: F401 — registration side effects

        per_task: Dict[str, Callable] = {}
        for task_cfg in self.cfg["task_configs"]:
            name = task_cfg["task_name"]
            sub_cfg = dict(task_cfg.get("criterion", crit_cfg))
            if self.sub_tasks[name].target_dictionary is not None:
                sub_cfg.setdefault(
                    "padding_idx", self.sub_tasks[name].target_dictionary.pad()
                )
            per_task[name] = CRITERIONS.get(sub_cfg["_name"])(sub_cfg)
        weights = self.weights

        def criterion(model, params, batch, rngs=None, num_updates=None, train=True):
            name = batch["task_name"]
            sub_batch = {k: v for k, v in batch.items() if k != "task_name"}
            loss, ss, logging = per_task[name](
                model, params, sub_batch, rngs=rngs, num_updates=num_updates,
                train=train,
            )
            return weights.get(name, 1.0) * loss, ss, logging

        criterion.per_task = per_task
        return criterion

    def make_joint_iterator(
        self,
        split: str,
        max_tokens: Optional[int] = None,
        max_sentences: Optional[int] = None,
        seed: int = 1,
        num_length_buckets: int = 10,
        epoch: int = 1,
    ):
        """Yields task-tagged batches interleaved by sample ratio."""
        from ..data.batching import batch_by_size, optimal_buckets, pad_to_bucket

        per_task_batches = {}
        collate_fns = {}
        for name, t in self.sub_tasks.items():
            ds = t.dataset(split)
            sizes = np.asarray([ds.num_tokens(i) for i in range(len(ds))])
            order = np.argsort(-sizes, kind="stable")
            batches = batch_by_size(
                order, sizes, max_tokens=max_tokens, max_sentences=max_sentences
            )
            edges = optimal_buckets(sizes, num_length_buckets)
            per_task_batches[name] = batches

            def make_collate(t=t, ds=ds, sizes=sizes, edges=edges):
                def collate(idx):
                    target = pad_to_bucket(int(sizes[idx].max()), edges)
                    return t.collate_indices(ds, idx, target)

                return collate

            collate_fns[name] = make_collate()

        schedule = JointBatchSchedule(per_task_batches, self.ratios, seed=seed)

        def gen():
            for name, bi in schedule.epoch_schedule(epoch):
                batch = collate_fns[name](per_task_batches[name][bi])
                batch["task_name"] = name
                yield batch

        return gen()


@register_task("joint_task_mtst")
class JointTrainingMTSTTask(JointTrainingTask):
    """Chimera MT+ST joint fine-tuning (reference: joint_mtst.py:42-104).

    Both sub-tasks drive one interlingua model: the sharing set the reference
    builds by swapping decoder embeddings / transformer stacks is realized
    structurally (single parameter tree). Requires the joint vocabulary the
    Chimera recipes use (asserted at setup)."""

    @classmethod
    def setup_task(cls, cfg: Dict, **kwargs):
        task = super().setup_task(cfg, **kwargs)
        dicts = [
            t.target_dictionary
            for t in task.sub_tasks.values()
            if t.target_dictionary is not None
        ]
        assert all(d == dicts[0] for d in dicts), (
            "joint_task_mtst shares the decoder across sub-tasks and requires "
            "a joint target vocabulary (the Chimera recipes use a joint SPM)"
        )
        return task


# --------------------------------------------------------------------------
# reference-name compat: the reference wraps per-task sub-models in a
# JointModel (models/joint_model.py:20-133) and dispatches losses through a
# registered joint_criterion (criterions/joint_criterion.py:13-86). Here the
# joint framework IS the task: joint_task builds one shared parameter tree
# and dispatches criterions per sub-task batch, so there is no separate model
# or criterion object to construct. A reference task-config naming them gets
# a migration pointer instead of an unknown-name error.

_JOINT_MIGRATION = (
    "the reference's {kind} `{name}` is superseded here: `--task joint_task` "
    "(or joint_task_mtst) owns the shared parameter tree and dispatches the "
    "per-sub-task criterions itself — configure the sub-task's own model/"
    "criterion names in the task-config JSON instead "
    "(see tasks/joint_task.py; reference models/joint_model.py:20, "
    "criterions/joint_criterion.py:13)"
)


@register_model("joint_model")
def _joint_model_shim(cfg_dict, dtype=None, param_dtype=None):
    raise SystemExit(_JOINT_MIGRATION.format(kind="model", name="joint_model"))


@register_model_architecture("joint_model", "joint_model")
def _joint_model_arch_shim(cfg):
    """reference models/joint_model.py:130 registers the arch under the same
    name; resolving it here routes into the model shim's migration pointer."""
    return dict(cfg)


@register_criterion("joint_criterion")
def _joint_criterion_shim(cfg):
    raise SystemExit(_JOINT_MIGRATION.format(kind="criterion", name="joint_criterion"))
