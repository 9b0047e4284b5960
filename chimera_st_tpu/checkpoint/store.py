"""Native checkpoint store (reference: fairseq/checkpoint_utils.py:30-133
save_checkpoint / :134-223 load_checkpoint).

Checkpoints are single files holding the train state (params + optimizer
state as numpy trees via flax serialization state-dicts, robust to optax
class-layout changes) plus extra state: epoch/iterator position, best metric,
metrics aggregator state, cumulative train time — the same resume contract as
the reference (trainer.py:267-360). File naming and retention mirror the
reference: checkpoint_last / checkpoint_best / checkpoint{N}.ep /
checkpoint_{N}.up with keep-last-N pruning.
"""

from __future__ import annotations

import logging
import pickle
import re
import time
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

logger = logging.getLogger(__name__)

SUFFIX = ".ckpt"


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_state(path: str, state, extra: Dict[str, Any],
               save_optimizer: bool = True) -> None:
    payload = {
        "step": int(state.step),
        "params": _to_host(serialization.to_state_dict(state.params)),
        # --no-save-optimizer-state: moments excluded; restore falls back to
        # a fresh optimizer (reference checkpoint_cfg.no_save_optimizer_state)
        "opt_state": _to_host(serialization.to_state_dict(state.opt_state))
        if save_optimizer else None,
        "extra": extra,
        "format_version": 1,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    Path(tmp).replace(path)


def load_state(path: str, state_template) -> Tuple[Any, Dict[str, Any]]:
    """Restore into the shape of `state_template` (a freshly built TrainState)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    import jax.numpy as jnp

    params = serialization.from_state_dict(state_template.params, payload["params"])
    try:
        if payload.get("opt_state") is None:
            raise KeyError("checkpoint saved with --no-save-optimizer-state")
        opt_state = serialization.from_state_dict(
            state_template.opt_state, payload["opt_state"]
        )
    except (ValueError, KeyError) as e:
        # optimizer structure changed between save and restore (e.g. the run
        # was saved with --fix-* freeze masking and restored without, or
        # vice versa — optax.multi_transform wraps the opt-state tree).
        # Reference behavior: fairseq resets the optimizer state with a
        # warning when the optimizer config no longer matches
        # (trainer.py load_checkpoint / checkpoint_utils arg overrides).
        logger.warning(
            f"optimizer state in {path} does not match the current optimizer "
            f"tree ({e}); keeping freshly initialized optimizer state"
        )
        opt_state = state_template.opt_state
    def _redevice(tmpl, restored):
        # from_state_dict yields host numpy leaves; put them back on the
        # template's devices WITH its shardings, or a resumed ZeRO-1 /
        # model-parallel run silently loses its layouts until the first
        # update re-constrains them (review fix — replicated opt moments can
        # OOM exactly the runs that needed sharding)
        return jax.tree_util.tree_map(_place_like, tmpl, restored)

    state = state_template._replace(
        step=_redevice(state_template.step,
                       jnp.asarray(payload["step"], jnp.int32)),
        params=_redevice(state_template.params, params),
        opt_state=_redevice(state_template.opt_state, opt_state),
    )
    return state, payload.get("extra", {})


def _place_like(t, r):
    """Re-apply the template leaf's MESH sharding to a restored host leaf.

    Only NamedShardings (ZeRO-1 moments, TP/pipe params) are re-committed;
    plain single-device leaves stay UNCOMMITTED jnp arrays — committing them
    to device 0 conflicts with mesh-sharded neighbors inside one jit call
    (uncommitted arrays let XLA place them freely, the pre-fix behavior)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    sharding = getattr(t, "sharding", None)
    if isinstance(sharding, NamedSharding):
        return jax.device_put(jnp.asarray(r), sharding)
    return jnp.asarray(r)


def load_params_only(path: str, params_template):
    with open(path, "rb") as f:
        payload = pickle.load(f)
    restored = serialization.from_state_dict(params_template, payload["params"])
    return jax.tree_util.tree_map(_place_like, params_template, restored)


class CheckpointManager:
    """Naming/retention/best-tracking (reference: checkpoint_utils.py:30-133)."""

    def __init__(
        self,
        save_dir: str,
        best_metric: str = "loss",
        maximize_best: bool = False,
        keep_last_epochs: int = -1,
        keep_interval_updates: int = -1,
        keep_best_checkpoints: int = -1,
        no_last: bool = False,
        save_optimizer_state: bool = True,
        no_epoch: bool = False,
        no_save: bool = False,
        write: bool = True,
    ):
        # write=False: track best/patience state but never touch the
        # filesystem — non-lead processes of a multi-host job (every process
        # must keep identical best-tracking or patience early-stop desyncs
        # the hosts; only process 0 may write to a shared save_dir)
        self.write = write
        self.save_dir = Path(save_dir)
        if write:
            self.save_dir.mkdir(parents=True, exist_ok=True)
        self.best_metric = best_metric
        self.maximize_best = maximize_best
        self.keep_last_epochs = keep_last_epochs
        self.keep_interval_updates = keep_interval_updates
        self.keep_best_checkpoints = keep_best_checkpoints
        self.no_last = no_last
        self.no_epoch = no_epoch
        self.no_save = no_save
        self.save_optimizer_state = save_optimizer_state
        self.best: Optional[float] = None
        if write:
            self.verify_writable()

    def verify_writable(self):
        """reference: checkpoint_utils.py:600 verify_checkpoint_directory."""
        probe = self.save_dir / "dummy"
        try:
            with open(probe, "w") as f:
                f.write("ok")
        finally:
            probe.unlink(missing_ok=True)

    def is_better(self, val: float) -> bool:
        if self.best is None:
            return True
        return val > self.best if self.maximize_best else val < self.best

    def save(
        self,
        state,
        extra: Dict[str, Any],
        epoch: int,
        updates: int,
        val_metric: Optional[float] = None,
        end_of_epoch: bool = True,
        save_interval_updates: int = 0,
    ):
        # best is tracked BEFORE any early-return: patience early-stop reads
        # is_better()/best, which must advance even under --no-save and on
        # non-writing (non-lead multi-host) processes
        is_best = val_metric is not None and self.is_better(val_metric)
        if is_best:
            self.best = val_metric
        if self.no_save or not self.write:
            return
        extra = dict(extra)
        extra["best"] = self.best
        wrote = []
        t0 = time.time()

        def _save(name):
            save_state(str(self.save_dir / name), state, extra,
                       save_optimizer=self.save_optimizer_state)
            wrote.append(name)

        # write once, then copy (reference: copy-first-then-replicate)
        primary = None
        if end_of_epoch and not self.no_epoch:
            primary = f"checkpoint{epoch}{SUFFIX}"
            _save(primary)
        elif not end_of_epoch and save_interval_updates > 0:
            primary = f"checkpoint_{epoch}_{updates}{SUFFIX}"
            _save(primary)

        import shutil

        def _replicate(name):
            if primary is not None:
                shutil.copyfile(
                    str(self.save_dir / primary), str(self.save_dir / name)
                )
            else:
                _save(name)
            if name not in wrote:
                wrote.append(name)

        if is_best:
            _replicate(f"checkpoint_best{SUFFIX}")
        if self.keep_best_checkpoints > 0 and val_metric is not None:
            # score-stamped copies pruned to the N best
            # (reference: checkpoint.best_<score> files)
            _replicate(f"checkpoint.best_{val_metric:.4f}_{updates}{SUFFIX}")
        if not self.no_last:
            _replicate(f"checkpoint_last{SUFFIX}")

        self._prune()
        logger.info(
            f"saved checkpoint(s) {wrote} (epoch {epoch}, {updates} updates, "
            f"{time.time() - t0:.1f}s)"
        )

    def _prune(self):
        if self.keep_last_epochs > 0:
            ckpts = sorted(
                self.save_dir.glob(f"checkpoint[0-9]*{SUFFIX}"),
                key=lambda p: int(re.match(r"checkpoint(\d+)", p.stem).group(1)),
            )
            for p in ckpts[: -self.keep_last_epochs]:
                p.unlink(missing_ok=True)
        if self.keep_best_checkpoints > 0:
            def score_of(p):  # checkpoint.best_<score>_<updates>.ckpt
                return float(p.stem.split("_")[-2])

            ckpts = sorted(
                self.save_dir.glob(f"checkpoint.best_*{SUFFIX}"),
                key=score_of,
                reverse=not self.maximize_best,  # worst-first for pruning
            )
            if len(ckpts) > self.keep_best_checkpoints:
                for p in ckpts[: -self.keep_best_checkpoints]:
                    p.unlink(missing_ok=True)
        if self.keep_interval_updates > 0:
            ckpts = sorted(
                self.save_dir.glob(f"checkpoint_*_*{SUFFIX}"),
                key=lambda p: int(p.stem.split("_")[-1]),
            )
            for p in ckpts[: -self.keep_interval_updates]:
                p.unlink(missing_ok=True)

    def last_checkpoint_path(self) -> Optional[str]:
        p = self.save_dir / f"checkpoint_last{SUFFIX}"
        return str(p) if p.is_file() else None


# checkpoint parameter averaging lives in tools/average_checkpoints.py (the
# chimera-average-checkpoints CLI) — a second template-based implementation
# here was dead code and has been removed (review fix)


def prune_layer_params(tree: Dict[str, Any], layers_to_keep, prefix: str = "layers_"):
    """Load a deep checkpoint into a shallower model: keep only the listed
    layer indices of a ``{prefix}{i}``-keyed stack and renumber them
    consecutively (reference: checkpoint_utils.py:479 prune_state_dict +
    --encoder/decoder-layers-to-keep, used with LayerDrop-trained models).

    ``tree`` is one param subtree (e.g. params['decoder'] or the top-level
    encoder dict); non-stack keys pass through untouched."""
    if isinstance(layers_to_keep, str):
        layers_to_keep = [int(x) for x in layers_to_keep.split(",") if x != ""]
    keep = sorted(int(i) for i in layers_to_keep)
    out: Dict[str, Any] = {}
    for k, v in tree.items():
        if not (k.startswith(prefix) and k[len(prefix):].isdigit()):
            out[k] = v
    for new_i, old_i in enumerate(keep):
        old_key = f"{prefix}{old_i}"
        if old_key not in tree:
            raise KeyError(f"layer {old_key} not present (prune list {keep})")
        out[f"{prefix}{new_i}"] = tree[old_key]
    return out
