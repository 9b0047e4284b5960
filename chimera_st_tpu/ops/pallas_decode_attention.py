"""Fused decode-step beam attention (Pallas TPU kernel).

One autoregressive beam-search step reads every layer's KV cache once; in
the lazy-beam-reorder scheme (generation/generator.py) each hypothesis must
additionally *select* its ancestor's cache column per time step. The XLA
formulation (models/layers.py crosscol branch) expresses that select as
cross-column logits + a post-softmax one-hot contraction — correct, but the
dot-generals name [B, H, K, L, K] fp32 intermediates and XLA only partially
fuses them (~6.2 ms/step on-chip at B=128, beam 10, L<=64; xplane trace).

This kernel collapses the ancestry select into a MASK. Each program handles
a block of S sentences for one head (grid = B/S x H) so per-program DMA is
large enough to amortize grid overhead (the first cut used one sentence per
program — 1024 tiny programs — and lost to grid fixed costs):

      K_blk, V_blk : [S*C*L, D]           # S sentences' C beam columns,
                                          # row (s*C + c)*L + l
      logits = q_blk @ K_blk^T            # [S*C, S*C*L]   (MXU)
      valid(r=s1*C+kq, t) with s2=t//(C*L), c=(t//L)%C, l=t%L:
          (s1 == s2) & (anc[s1, l, kq] == c) & (l <= cache_index)
      probs = softmax(where(valid, logits, -inf), lanes)    # fp32, VPU
      out   = probs @ V_blk               # [S*C, D]       (MXU)

Because exactly one column per (hypothesis, l) is valid, softmax over the
full masked lane axis equals the per-time softmax over the selected
entries — the one-hot select and the cross-sentence blocking both cost
nothing beyond the mask. The dense matmul does S x the minimal FLOPs, but
the step is bandwidth-bound: per-program traffic is one read of the block's
cache (1.3 MB at S=8, L=64), the speed-of-light for this op.

Cache layout for this path is [B, H, C, L, D] (flattened [B, H, C*L, D]
for the kernel — a free row-major merge), so each program's block is one
contiguous DMA; the new step's K entries land as a single
dynamic_update_slice at time index on the 5D view, and segment growth
concatenates along L (beam_search.py _grow_time). The ancestry tensor is
the same [L, B*C] map the XLA paths use.

Enable with CHIMERA_PALLAS_DECODE=1 (read by the generator); parity vs the
crosscol path is exact on CPU (interpret mode) and tie-flip-level on TPU.

STATUS: measured dead end, default OFF — loses to the XLA crosscol path
end-to-end at every sentences-per-program setting (S=1: 891.6 ms, S=2:
852.4, S=8: 974.5 vs 628.1 ms/batch at B=128 beam 10; see
ARCHITECTURE.md §7 and benchmarks/trace_pallas_decode.py for the
trace-level diagnosis: per-custom-call fixed costs + full-cache layout
copies XLA inserts around the call in the while-loop carry).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(idx_ref, q_ref, k_ref, v_ref, anc_ref, out_ref, *, S: int,
            C: int, L: int):
    """Grid (B/S, H). Blocks: q [S, C, D], k/v [S, C*L, D], anc [S, L, C],
    out [S, C, D]."""
    D = q_ref.shape[-1]
    cache_index = idx_ref[0]
    R = S * C          # query rows
    T = S * C * L      # cache lanes

    q = q_ref[...].reshape(R, D)
    k = k_ref[...].reshape(T, D)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * jnp.float32(D**-0.5)  # [R, T]

    # lane t = (s2*C + c)*L + l ; row r = s1*C + kq
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, T), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (R, T), 0)
    l_id = jax.lax.rem(lane, L)
    c_id = jax.lax.rem(jax.lax.div(lane, L), C)
    s2 = jax.lax.div(lane, C * L)
    s1 = jax.lax.div(row, C)
    # anc [S, L, C] -> [S, C, L] -> [S*C, L] -> tile S*C copies along lanes
    # -> [R, T]; the tiled value at (r, t) is anc[s1(r), l(t), kq(r)]
    # (pltpu.repeat concatenates copies, and the value only depends on
    # t mod L = l)
    anc_sc = jnp.transpose(anc_ref[...], (0, 2, 1)).reshape(R, L)
    anc_rep = pltpu.repeat(anc_sc, S * C, 1)
    valid = (s1 == s2) & (c_id == anc_rep) & (l_id <= cache_index)

    logits = jnp.where(valid, logits, jnp.float32(-1e30))
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m)
    e = jnp.where(valid, e, 0.0)
    probs = (e / jnp.sum(e, axis=1, keepdims=True)).astype(v_ref.dtype)

    out = jax.lax.dot_general(
        probs, v_ref[...].reshape(T, D), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [R, D]
    out_ref[...] = out.reshape(S, C, D).astype(out_ref.dtype)


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
    # sentences per program: balances grid fixed cost (fewer programs) vs
    # VMEM pressure (2 cache blocks + logits must fit with double buffering
    # for the grid pipeline to engage). A/B'd at 1/2/8 — see module docstring.
    import os as _os

    S = int(_os.environ.get("CHIMERA_PALLAS_DECODE_S", "2"))
    while B % S:
        S //= 2
    # [B, L, C]: kernel blocks slice only the leading (sentence) dim —
    # Mosaic requires a block's last two dims be full (or tile-aligned)
    anc = jnp.transpose(ancestry.reshape(L, B, C), (1, 0, 2))

    qt = jnp.transpose(q, (0, 2, 1, 3))  # [B, H, C, D]
    idx = jnp.asarray(cache_index, jnp.int32).reshape(1)

    out = pl.pallas_call(
        functools.partial(_kernel, S=S, C=C, L=L),
        grid=(B // S, H),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cache_index [1]
            pl.BlockSpec((S, None, C, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, None, LC, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, None, LC, D), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, L, C), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, None, C, D), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, C, D), q.dtype),
        interpret=interpret,
    )(idx, qt, kc, vc, anc)
    return jnp.transpose(out, (0, 2, 1, 3))  # [B, C, H, D]
