"""Fine-tune freeze controls (parameter-subtree masking).

TPU-native equivalent of the reference's ``requires_grad_(False)`` fine-tune
switches on the Chimera model
(reference: fairseq/models/chimera/w2v2_transformer_interlingua.py:106-124:
``--fix-wav2vec --fix-encoder-transformers --fix-decoder-transformers
--fix-decoder --fix-interlingua``) and the encoder re-init switch
``--reset-encoder`` (reference: w2v2_transformer_interlingua.py:191-198
upgrade_state_dict_named overwrites the checkpoint's encoder transformer
weights with fresh ones).

In a functional framework "requires_grad" is an optimizer property, not a
parameter property: frozen subtrees get ``optax.set_to_zero()`` through
``optax.multi_transform``, so they receive no updates and accumulate no
moments (exactly the torch semantics — Adam state for a param with
``requires_grad=False`` never materializes).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Tuple

import jax
import optax

# flag name -> predicate over the parameter path (tuple of str keys, starting
# below the flax "params" collection root)
_FIX_PREDICATES = {
    "fix_wav2vec": lambda p: p and p[0] == "wav2vec_model",
    "fix_encoder_transformers": lambda p: p
    and p[0].startswith("transformer_layers_"),
    "fix_decoder": lambda p: p and p[0] == "decoder",
    "fix_decoder_transformers": lambda p: len(p) >= 2
    and p[0] == "decoder"
    and p[1].startswith("layers_"),
    "fix_interlingua": lambda p: p
    and (
        p[0].startswith("interlingua_layers_")
        or p[0] == "interlingua_embedding"
    ),
    # not a reference CLI flag: torch-parity mask for text-only tasks (see
    # auto_text_only_fixes below)
    "fix_audio_trunk": lambda p: p
    and (
        p[0] in ("wav2vec_model", "subsample")
        or p[0].startswith("audio_exclusive_layers_")
    ),
}

FIX_FLAG_NAMES: Tuple[str, ...] = tuple(_FIX_PREDICATES)


def _path_keys(path) -> Tuple[str, ...]:
    keys = []
    for entry in path:
        if hasattr(entry, "key"):
            keys.append(str(entry.key))
        elif hasattr(entry, "idx"):
            keys.append(str(entry.idx))
        else:
            keys.append(str(entry))
    # strip the flax collection root ("params") so predicates see model paths
    if keys and keys[0] == "params":
        keys = keys[1:]
    return tuple(keys)


def freeze_labels(params: Any, fixes: Iterable[str]) -> Any:
    """Label pytree matching ``params``: 'freeze' on fixed subtrees, 'train'
    elsewhere. ``fixes`` are flag names from FIX_FLAG_NAMES."""
    fixes = [f for f in fixes if f]
    for f in fixes:
        if f not in _FIX_PREDICATES:
            raise ValueError(f"unknown freeze flag {f!r}")
    preds = [_FIX_PREDICATES[f] for f in fixes]

    def label(path, _leaf):
        keys = _path_keys(path)
        return "freeze" if any(p(keys) for p in preds) else "train"

    return jax.tree_util.tree_map_with_path(label, params)


def wrap_freeze(
    tx: optax.GradientTransformation, params: Any, fixes: Iterable[str]
) -> optax.GradientTransformation:
    """Wrap an optimizer so parameters in fixed subtrees never change."""
    fixes = [f for f in fixes if f]
    if not fixes:
        return tx
    labels = freeze_labels(params, fixes)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels
    )


_AUDIO_TRUNK_KEYS = ("wav2vec_model", "subsample")


def auto_text_only_fixes(task: Any, params: Any) -> Tuple[str, ...]:
    """Torch-parity optimizer mask for text-only training.

    The reference's Adam only steps parameters whose ``.grad`` is not None
    (fairseq/optim/adam.py:100-115 iterates ``group["params"]`` and
    ``continue``s on ``p.grad is None``), so in the MT pre-train stage
    (``--task translation`` over the interlingua arch,
    chimera/scripts/train-en2any-MT.sh) the audio trunk — wav2vec2 +
    subsampler + audio-exclusive encoder layers, ~95M of the 139M params —
    never materializes optimizer state. A jitted functional step has no
    ``grad is None``: backprop emits structural zeros for the unused trunk
    and a plain optax.adam would stream param+m+v for all of it every
    update (~2.3 GB of HBM traffic buying nothing). Masking the trunk out
    of the optimizer reproduces the torch semantics exactly (zero grads +
    zero init moments already imply the trunk never moves; this just stops
    paying for the proof).

    Returns ("fix_audio_trunk",) when the task declares itself text-only
    AND the param tree actually carries an audio trunk; () otherwise.
    """
    if not getattr(task, "text_only", False):
        return ()
    inner = params.get("params", params) if hasattr(params, "get") else {}
    keys = list(inner.keys()) if hasattr(inner, "keys") else []
    if any(
        k in _AUDIO_TRUNK_KEYS or k.startswith("audio_exclusive_layers_")
        for k in keys
    ):
        return ("fix_audio_trunk",)
    return ()


def frozen_fraction(params: Any, fixes: Iterable[str]) -> float:
    """Fraction of scalar parameters frozen (for logging)."""
    import numpy as np

    labels = freeze_labels(params, fixes)
    tot = frz = 0
    for leaf, lab in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(labels)
    ):
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 1
        tot += n
        if lab == "freeze":
            frz += n
    return frz / max(tot, 1)


def reset_encoder_subtrees(restored_params: Any, fresh_params: Any) -> Any:
    """--reset-encoder: replace the restored checkpoint's shared encoder
    transformer stack with freshly initialized weights
    (reference: w2v2_transformer_interlingua.py:191-198; the reference also
    resets embed_positions, which here are parameter-free sinusoids)."""
    restored = dict(restored_params)
    inner_restored = dict(restored["params"])
    inner_fresh = fresh_params["params"]
    for key in list(inner_restored):
        if key.startswith("transformer_layers_") or key.startswith(
            "audio_exclusive_layers_"
        ):
            inner_restored[key] = inner_fresh[key]
    restored["params"] = inner_restored
    return restored
