"""Mask helpers (reference: fairseq/data/data_utils.py:491 lengths_to_padding_mask).

Convention matches the reference: ``True`` marks a *padded* position.
All helpers are jit-safe (static shapes, no data-dependent control flow).
"""

from __future__ import annotations

import jax.numpy as jnp


def lengths_to_padding_mask(lengths, max_len: int):
    """[B] lengths -> [B, max_len] bool mask, True at padded positions."""
    pos = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return pos >= lengths[:, None]


def padding_mask_to_lengths(mask):
    """[B, T] bool padding mask -> [B] lengths."""
    return jnp.sum(~mask, axis=-1).astype(jnp.int32)
