"""Weight quantization: scalar (int8 fake-quant QAT) and iterative product
quantization (iPQ), plus quant-noise training.

TPU-native rebuild of the reference quantization subsystem
(reference: fairseq/modules/quantization/scalar/* — IntLinear/IntEmbedding
with EMA-observed scales and straight-through gradients;
fairseq/modules/quantization/pq/* — kmeans block quantization with learnable
centroids; fairseq/modules/quant_noise.py — block dropout for PQ-friendly
training). The reference swaps nn.Modules; here quantization is a set of
pure functions over param pytrees + a fake-quant primitive with a custom
straight-through VJP, which composes with any flax module."""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------------ scalar


@jax.custom_vjp
def fake_quant(x: jax.Array, scale: jax.Array, zero: jax.Array, bits: int = 8):
    """Quantize-dequantize with straight-through gradient
    (reference: scalar/ops.py emulate_int + the STE in IntLinear.forward)."""
    qmin, qmax = 0, 2**bits - 1
    q = jnp.clip(jnp.round(x / scale + zero), qmin, qmax)
    return scale * (q - zero)


def _fq_fwd(x, scale, zero, bits=8):
    return fake_quant(x, scale, zero, bits), None


def _fq_bwd(_, g):
    return (g, None, None, None)


fake_quant.defvjp(_fq_fwd, _fq_bwd)


def int8_params(x: jax.Array, bits: int = 8) -> Tuple[jax.Array, jax.Array]:
    """Per-tensor (scale, zero-point) from min/max observation
    (reference: scalar/modules/qlinear.py MinMax observer)."""
    mn = jnp.minimum(jnp.min(x), 0.0)
    mx = jnp.maximum(jnp.max(x), 0.0)
    qmax = 2**bits - 1
    scale = jnp.maximum((mx - mn) / qmax, 1e-8)
    zero = jnp.round(-mn / scale)
    return scale, zero


def quantize_params_scalar(params: Any, bits: int = 8, min_size: int = 256) -> Any:
    """Post-training fake-quantization of every weight matrix in a pytree
    (kernels/embeddings; small vectors like biases/norms stay fp32)."""

    def q(x):
        if not hasattr(x, "ndim") or x.ndim < 2 or x.size < min_size:
            return x
        scale, zero = int8_params(x, bits)
        return fake_quant(x, scale, zero, bits)

    return jax.tree_util.tree_map(q, params)


def quant_noise(x: jax.Array, rng: jax.Array, p: float, block_size: int = 8):
    """Drop contiguous blocks of weights during training so the surviving
    weights learn PQ-robust representations (reference:
    fairseq/modules/quant_noise.py; "Training with Quantization Noise for
    Extreme Model Compression"). x is a [in, out] kernel."""
    if p <= 0:
        return x
    in_dim, out_dim = x.shape[-2], x.shape[-1]
    nb = -(-in_dim // block_size)  # remainder rows form a partial block
    mask = jax.random.bernoulli(rng, p, (nb, out_dim))
    mask = jnp.repeat(mask, block_size, axis=0)[:in_dim]
    # every row is dropped with probability p, so the 1/(1-p) rescale is
    # unbiased for ALL rows (review fix: never-dropped remainder rows were
    # still rescaled, inflating their expected contribution by 1/(1-p))
    return jnp.where(mask, 0.0, x) / (1.0 - p)


# ---------------------------------------------------------------------- PQ


class PQWeight(NamedTuple):
    centroids: jax.Array  # [n_centroids, block_size]
    assignments: jax.Array  # [n_blocks] int32
    shape: Tuple[int, ...]  # original weight shape


def pq_quantize(
    weight: np.ndarray,
    block_size: int = 8,
    n_centroids: int = 256,
    n_iter: int = 15,
    seed: int = 0,
) -> PQWeight:
    """k-means product quantization of one weight matrix
    (reference: pq/em.py EM + pq/pq.py quantize_columns — here plain numpy
    Lloyd iterations over row-blocks; runs host-side, once per layer)."""
    w = np.asarray(weight, np.float32)
    flat = w.reshape(-1)
    pad = (-len(flat)) % block_size
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, np.float32)])
    blocks = flat.reshape(-1, block_size)
    rng = np.random.default_rng(seed)
    n_c = min(n_centroids, len(blocks))
    centroids = blocks[rng.choice(len(blocks), n_c, replace=False)].copy()
    for _ in range(n_iter):
        d = ((blocks[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(n_c):
            sel = blocks[assign == c]
            if len(sel):
                centroids[c] = sel.mean(0)
            else:  # dead centroid: re-seed from a random block (reference
                # em.py resolves empty clusters the same way)
                centroids[c] = blocks[rng.integers(len(blocks))]
    d = ((blocks[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
    assign = d.argmin(1).astype(np.int32)
    return PQWeight(jnp.asarray(centroids), jnp.asarray(assign), tuple(w.shape))


def pq_dequantize(pq: PQWeight) -> jax.Array:
    """Reconstruct the dense weight from centroids + assignments. Centroids
    may be trained further with gradients flowing through this gather
    (the reference's iPQ finetuning stage)."""
    flat = pq.centroids[pq.assignments].reshape(-1)
    size = int(np.prod(pq.shape))
    return flat[:size].reshape(pq.shape)


def quantize_params_pq(
    params: Any,
    block_size: int = 8,
    n_centroids: int = 256,
    min_size: int = 4096,
) -> Tuple[Any, Dict[str, PQWeight]]:
    """PQ-compress every large 2-D weight; returns (params with dequantized
    weights, {path: PQWeight codebooks}). Compression ratio per layer:
    32 bits/weight -> log2(n_centroids)/block_size bits + codebook."""
    codebooks: Dict[str, PQWeight] = {}

    def visit(path, x):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if not hasattr(x, "ndim") or x.ndim < 2 or x.size < min_size:
            return x
        pq = pq_quantize(np.asarray(x), block_size, n_centroids)
        codebooks[name] = pq
        return pq_dequantize(pq)

    out = jax.tree_util.tree_map_with_path(visit, params)
    return out, codebooks
