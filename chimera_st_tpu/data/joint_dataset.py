"""Joint multi-task batch scheduling (reference: fairseq/data/joint_dataset.py:21-271).

Rather than concatenating example-level datasets, the TPU-native design
schedules BATCHES: each sub-task keeps its own dataset/collater (static shape
buckets stay per-task, so no cross-task shape blowup) and the joint iterator
interleaves per-task batch streams by sample ratio, tagging every batch with
``task_name`` (the tag drives criterion dispatch like the reference's
any_step, fairseq/tasks/joint_task.py:273-312)."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


class JointBatchSchedule:
    def __init__(
        self,
        per_task_batches: Dict[str, List[np.ndarray]],
        sample_ratios: Optional[Dict[str, float]] = None,
        seed: int = 1,
    ):
        self.per_task = per_task_batches
        self.ratios = sample_ratios or {k: 1.0 for k in per_task_batches}
        self.seed = seed

    def epoch_schedule(self, epoch: int) -> List[tuple]:
        """Deterministic interleave: [(task_name, batch_index), ...]."""
        rng = np.random.default_rng([self.seed, epoch])
        entries: List[tuple] = []
        for name, batches in self.per_task.items():
            ratio = self.ratios.get(name, 1.0)
            n = len(batches)
            reps = int(np.floor(n * ratio))
            frac = n * ratio - reps
            idx = list(range(n)) * int(np.ceil(ratio))
            take = reps + (1 if rng.random() < frac else 0)
            picked = rng.permutation(len(idx))[:take]
            entries.extend((name, idx[i]) for i in picked)
        order = rng.permutation(len(entries))
        return [entries[i] for i in order]
