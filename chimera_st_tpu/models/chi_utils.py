"""Chimera misc utilities (reference: fairseq/models/chimera/chi_utils.py:6-82).

- LengthDropout: randomly drops timesteps at train time (the reference's
  debug/augmentation module) — functional, jit-safe (mask-based instead of
  the reference's dynamic shortening, so shapes stay static: dropped steps
  are masked out of attention rather than removed).
- update_dict_with_prefix is n/a — checkpoint surgery happens in the
  name-mapped importer (checkpoint/torch_import.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def length_dropout(
    x: jax.Array,  # [B, T, C]
    padding_mask: jax.Array,  # [B, T] True = pad
    rate: float,
    rng: Optional[jax.Array],
    deterministic: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Randomly mark a fraction of valid timesteps as padding.

    Returns (x, new_padding_mask). Static-shape variant of the reference's
    LengthDropout: instead of physically removing steps, dropped positions
    join the padding mask (equivalent under masked attention).
    """
    if deterministic or rate <= 0.0 or rng is None:
        return x, padding_mask
    drop = jax.random.bernoulli(rng, rate, padding_mask.shape)
    # never drop every frame of an utterance: keep position 0
    drop = drop.at[:, 0].set(False)
    new_mask = padding_mask | drop
    return jnp.where(new_mask[:, :, None], 0.0, x), new_mask
