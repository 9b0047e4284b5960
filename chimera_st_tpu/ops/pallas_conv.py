"""Fused wav2vec2 conv-frontend Pallas kernel.

reference: fairseq/models/wav2vec/wav2vec2.py:685 ConvFeatureExtractionModel —
the 7-layer strided conv stack. The BASELINE north star names this stack as a
fused-Pallas target. Design:

- layer 0 (k=10, s=5, C_in=1) + Fp32GroupNorm + GELU stay in XLA: the group
  norm is an instance norm over the FULL time axis, which breaks time-tiling
  (a fused version would need a second pass just for the statistics), and
  layer 0 carries ~1% of the stack FLOPs.
- layers 1..6 (4x k=3 s=2 + 2x k=2 s=2, 512ch) fuse into ONE kernel tiled
  over (batch, output-time). Each grid step loads the input halo for its
  output tile once, cascades all six convs in VMEM (even/odd phase split
  turns each stride-2 conv into k MXU matmuls [S,512]x[512,512]), and writes
  only the final tile — intermediate layer activations NEVER touch HBM
  (the XLA path materializes ~2.2 GB of them at B=128 / 6 s audio).

Parity vs the XLA path is tested in tests/test_pallas_conv.py; the A/B
benchmark lives in benchmarks/ab_conv_frontend.py.
"""

from __future__ import annotations

import functools
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (kernel, stride) for the fused tail — fixed to the wav2vec2-base spec
TAIL_SPEC: Tuple[Tuple[int, int], ...] = ((3, 2), (3, 2), (3, 2), (3, 2),
                                          (2, 2), (2, 2))
CH = 512
TILE = 32  # output frames per grid step (VMEM budget: ~12.5 MB with weights)


def _padded_spans_for_tile(tile: int) -> List[int]:
    """Even, slack-padded spans so every in-kernel tap is a UNIT-STRIDE
    slice + pair reshape (mosaic rejects stride-2 extract_strided_slice —
    found by the on-chip A/B). Layer l computes spans_pad[l+1] rows from
    spans_pad[l] input rows; tap `off` reads rows [off, off + 2*n) via
    reshape-to-pairs, so the input must hold k-1 + 2*n rows, rounded up to
    even. Valid rows stay a prefix; the few trailing garbage rows are
    finite (convs of zero padding) and are trimmed by the final [:tile]."""
    spans = [tile if tile % 2 == 0 else tile + 1]
    for k, _ in reversed(TAIL_SPEC):
        need = 2 * spans[-1] + k - 1
        spans.append(need + (need % 2))
    return list(reversed(spans))


def conv_tail_fused_windows(x: jax.Array, weights: Sequence[jax.Array],
                            interpret: bool = False) -> jax.Array:
    """Fused tail with host-side halo windowing.

    Overlapping (halo) input windows are not expressible as a BlockSpec
    (block index maps address disjoint blocks), so the input is first viewed
    as per-tile windows [B, n_tiles, span0, CH] via a cheap XLA gather of
    slice starts, then the kernel consumes one window per grid step. The
    window copy is the only extra HBM traffic (span0/stride overlap ~= 1.6%
    per layer-depth doubling; ~2x on the input layer) and buys keeping all
    six intermediate activations in VMEM.
    """
    B, T1, ch = x.shape
    assert ch == CH
    lengths = [T1]
    for k, s in TAIL_SPEC:
        lengths.append((lengths[-1] - k) // s + 1)
    t_out = lengths[-1]
    if t_out <= 0:
        return jnp.zeros((B, 0, CH), x.dtype)
    span0 = _padded_spans_for_tile(TILE)[0]
    stride0 = TILE * 2 ** len(TAIL_SPEC)  # input frames per output tile
    n_tiles = int(np.ceil(t_out / TILE))
    need = (n_tiles - 1) * stride0 + span0
    if need > T1:
        x = jnp.pad(x, ((0, 0), (0, need - T1), (0, 0)))
    # [B, n_tiles, span0, CH] halo windows
    starts = np.arange(n_tiles) * stride0
    windows = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(x, int(s0), span0, axis=1)
         for s0 in starts],
        axis=1,
    )
    wflat = [w.reshape(-1, CH).astype(x.dtype) for w in weights]

    grid = (B, n_tiles)
    in_specs = [
        pl.BlockSpec((1, 1, span0, CH), lambda b, t: (b, t, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((w.shape[0], CH), lambda b, t: (0, 0),
                     memory_space=pltpu.VMEM)
        for w in wflat
    ]
    out = pl.pallas_call(
        _conv_tail_kernel_windows,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TILE, CH), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TILE, CH), x.dtype),
        # the unrolled 6-layer body's fp32 accumulators + gelu temporaries
        # exceed the 16 MB default scoped-vmem budget (measured: 33 MB at
        # TILE=32); v5e has 128 MB VMEM, so raise the per-kernel cap
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(windows, *wflat)
    return out[:, :t_out]


def _gelu_exact(x: jax.Array) -> jax.Array:
    """Exact GELU with a polynomial erf (Abramowitz & Stegun 7.1.26,
    max abs err 1.5e-7 — far below bf16 resolution).

    jax.nn.gelu(approximate=False) lowers through `erfc`, which has no
    Pallas TPU lowering (NotImplementedError in mosaic; found by the
    on-chip A/B). exp/mul/add all lower, so the polynomial form runs on
    the VPU."""
    a = x * jnp.float32(0.7071067811865476)  # x / sqrt(2)
    s = jnp.sign(a)
    z = jnp.abs(a)
    t = 1.0 / (1.0 + jnp.float32(0.3275911) * z)
    poly = t * (
        jnp.float32(0.254829592)
        + t * (
            jnp.float32(-0.284496736)
            + t * (
                jnp.float32(1.421413741)
                + t * (
                    jnp.float32(-1.453152027) + t * jnp.float32(1.061405429)
                )
            )
        )
    )
    erf = s * (1.0 - poly * jnp.exp(-z * z))
    return 0.5 * x * (1.0 + erf)


def _conv_tail_kernel_windows(x_ref, *refs):
    w_refs = refs[:-1]
    out_ref = refs[-1]
    spans = _padded_spans_for_tile(TILE)
    x = x_ref[0, 0]  # [span0_pad, CH]
    for li, (k, s) in enumerate(TAIL_SPEC):
        n_out = spans[li + 1]
        w = w_refs[li]
        acc = None
        for off in range(k):
            # stride-2 tap as unit-stride slice + pair reshape (mosaic has
            # no strided extract; see _padded_spans_for_tile)
            seg = jax.lax.slice(x, (off, 0), (off + 2 * n_out, CH))
            tap = seg.reshape(n_out, 2, CH)[:, 0, :]
            part = jnp.dot(
                tap,
                w[off * CH:(off + 1) * CH, :],
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
        x = _gelu_exact(acc).astype(x_ref.dtype)
    out_ref[0] = x[:TILE]


def conv_tail_reference(x: jax.Array, weights: Sequence[jax.Array]) -> jax.Array:
    """XLA composition of the same tail (for parity tests and the A/B)."""
    for w in weights:
        k = w.shape[0]
        x = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype),
            window_strides=(2,), padding="VALID",
            dimension_numbers=("NTC", "TIO", "NTC"),
        )
        x = jax.nn.gelu(x, approximate=False).astype(x.dtype)
    return x


def fused_conv_tail(x: jax.Array, weights: Sequence[jax.Array],
                    interpret: bool = False) -> jax.Array:
    """Differentiable fused tail: Pallas forward, XLA-composition backward.

    pallas_call has no automatic transpose rule, so the VJP re-derives the
    gradient through ``conv_tail_reference`` (same math; the fused kernel is
    an execution-schedule change only). Same pattern as
    ops/pallas_attention.fused_encoder_attention."""

    @jax.custom_vjp
    def inner(x, *ws):
        return conv_tail_fused_windows(x, ws, interpret=interpret)

    def fwd(x, *ws):
        return inner(x, *ws), (x, ws)

    def bwd(res, g):
        x, ws = res
        _, vjp = jax.vjp(lambda x, *ws: conv_tail_reference(x, ws), x, *ws)
        return vjp(g)

    inner.defvjp(fwd, bwd)
    return inner(x, *weights)
