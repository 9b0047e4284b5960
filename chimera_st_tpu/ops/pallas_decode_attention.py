"""Fused decode-step beam attention (Pallas TPU kernel).

One autoregressive beam-search step reads every layer's KV cache once; in
the lazy-beam-reorder scheme (generation/generator.py) each hypothesis must
additionally *select* its ancestor's cache column per time step. The XLA
formulation (models/layers.py crosscol branch) expresses that select as
cross-column logits + a post-softmax one-hot contraction — correct, but the
dot-generals name [B, H, K, L, K] fp32 intermediates and XLA only partially
fuses them (~6.2 ms/step on-chip at B=128, beam 10, L<=64; xplane trace).

This kernel collapses the ancestry select into a MASK:

    for program (b, h):                       # grid = B x H
      K_blk, V_blk : [C*L, D]                 # sentence b's C beam columns,
                                              # column-major row c*L + l
      logits = q_blk @ K_blk^T                # [C, L*C]   (MXU)
      valid(kq, c*L+l) = (anc[l, kq] == c) & (l <= cache_index)
      probs = softmax(where(valid, logits, -inf), axis=lanes)   # fp32, VPU
      out   = probs @ V_blk                   # [C, D]     (MXU)

Because only one column per (kq, l) is valid, softmax over the full L*C
lane axis equals the per-time softmax over the selected entries — the
one-hot select costs nothing. Per-program traffic is exactly one read of
the sentence's cache block (164 KB at L=64): the whole step is
bandwidth-bound at the cache size, the speed-of-light for this op.

Cache layout for this path is [B, H, C, L, D] (flattened [B, H, C*L, D]
for the kernel), so each program's block is one contiguous DMA; the new
step's K entries land as a single dynamic_update_slice at time index on the
5D view, and segment growth concatenates along L. The ancestry tensor is the same
[L, B*C] map the XLA paths use.

Enable with CHIMERA_PALLAS_DECODE=1 (read by the generator); parity vs the
crosscol path is exact on CPU (interpret mode) and tie-flip-level on TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(idx_ref, q_ref, k_ref, v_ref, anc_ref, out_ref, *, C: int, L: int):
    """Grid (B, H). Blocks: q [C, D], k/v [L*C, D], anc [L, C], out [C, D]."""
    D = q_ref.shape[-1]
    cache_index = idx_ref[0]

    q = q_ref[...]  # [C, D] bf16
    k = k_ref[...]  # [L*C, D]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [C, L*C]
    logits = logits * jnp.float32(D**-0.5)

    # lane t = c*L + l (cache rows are column-major: one beam column's
    # timeline is contiguous) -> valid iff anc[l, kq] == c and l <= idx
    lane = jax.lax.broadcasted_iota(jnp.int32, (C, L * C), 1)
    col = jax.lax.div(lane, L)
    row = jax.lax.rem(lane, L)
    anc = anc_ref[...]  # [L, C] int32: anc[l, kq] = source column
    # [L, C] -> [C, L] -> tile C times along lanes (pltpu.repeat concatenates
    # copies) -> [C, C*L] with lane c*L+l holding anc[l, kq]
    anc_rep = pltpu.repeat(anc.T, C, 1)
    valid = (col == anc_rep) & (row <= cache_index)

    neg = jnp.float32(-1e30)
    logits = jnp.where(valid, logits, neg)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    e = jnp.where(valid, e, 0.0)
    denom = jnp.sum(e, axis=1, keepdims=True)
    probs = (e / denom).astype(v_ref.dtype)  # [C, L*C]

    out = jax.lax.dot_general(
        probs, v_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [C, D]
    out_ref[...] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_step_attention(
    q: jax.Array,  # [B, C, H, D]
    kc: jax.Array,  # [B, H, C*L, D] (row c*L + l: column-major timelines)
    vc: jax.Array,  # [B, H, C*L, D]
    ancestry: jax.Array,  # [L, B*C] int32 (within-sentence source columns)
    cache_index: jax.Array,  # scalar int32 (current time step)
    interpret: bool = False,
) -> jax.Array:
    """-> [B, C, H, D] attention output (pre out-projection)."""
    B, C, H, D = q.shape
    LC = kc.shape[2]
    L = LC // C
    anc = ancestry.reshape(L, B, C)

    qt = jnp.transpose(q, (0, 2, 1, 3))  # [B, H, C, D]
    idx = jnp.asarray(cache_index, jnp.int32).reshape(1)

    out = pl.pallas_call(
        functools.partial(_kernel, C=C, L=L),
        grid=(B, H),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cache_index [1]
            pl.BlockSpec((None, None, C, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, LC, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, LC, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, None, C), lambda b, h: (0, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, None, C, D), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, C, D), q.dtype),
        interpret=interpret,
    )(idx, qt, kc, vc, anc)
    return jnp.transpose(out, (0, 2, 1, 3))  # [B, C, H, D]
