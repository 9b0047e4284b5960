"""A/B the beam-reorder gather + top-k implementations, end-to-end decode.

Measures decode-only time (precomputed encoder out) at a given batch size for
each gather variant by monkeypatching beam_search internals. Informed by the
r2 trace: per step at B=64 the gather fusions cost ~2.3 ms, layout-conversion
copies of the gathered caches ~1.7 ms, top-k ~0.8 ms.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/chimera_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import chimera_st_tpu.generation.beam_search as bs

BEAM = 10
MAX_DECODE_LEN = 64
ITERS = 6


def gather_matmul(tree, indices, B, src_k):  # V1 (current)
    out_k = indices.shape[1]
    flat_src = (
        jnp.arange(B, dtype=indices.dtype)[:, None] * src_k + indices
    ).reshape(-1)

    def gather(x):
        onehot = jax.nn.one_hot(flat_src, B * src_k, dtype=x.dtype)
        n = x.reshape(B * src_k, -1)
        g = jnp.matmul(onehot, n, preferred_element_type=x.dtype)
        return g.reshape((B * out_k,) + x.shape[1:])

    return jax.tree_util.tree_map(gather, tree)


def gather_take(tree, indices, B, src_k):  # V2
    def gather(x):
        xb = x.reshape((B, src_k) + x.shape[1:])
        idx = indices.reshape(indices.shape + (1,) * (xb.ndim - 2))
        g = jnp.take_along_axis(xb, idx, axis=1)
        return g.reshape((B * indices.shape[1],) + x.shape[1:])

    return jax.tree_util.tree_map(gather, tree)


def gather_dot_general(tree, indices, B, src_k):  # V4: no reshape, 4-D rhs
    out_k = indices.shape[1]
    flat_src = (
        jnp.arange(B, dtype=indices.dtype)[:, None] * src_k + indices
    ).reshape(-1)

    def gather(x):
        onehot = jax.nn.one_hot(flat_src, B * src_k, dtype=x.dtype)
        return jax.lax.dot_general(
            onehot, x, (((1,), (0,)), ((), ())),
            preferred_element_type=x.dtype,
        )

    return jax.tree_util.tree_map(gather, tree)


VARIANTS = {
    "matmul": gather_matmul,
    "take": gather_take,
    "dotgen": gather_dot_general,
}


def run(batch, variant):
    bs._gather_flat_beams = VARIANTS[variant]
    from chimera_st_tpu.generation.generator import (
        GeneratorSettings,
        SequenceGenerator,
    )
    from chimera_st_tpu.models.interlingua import (
        ChimeraInterlinguaModel,
        InterlinguaConfig,
    )

    cfg = InterlinguaConfig(tgt_vocab_size=10000, src_vocab_size=10000)
    model = ChimeraInterlinguaModel(cfg, dtype=jnp.bfloat16)
    T = 6 * 16000
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(batch, T)) * 0.1, jnp.float32)
    mask = jnp.zeros((batch, T), bool)
    params = model.init(
        jax.random.PRNGKey(0), audio[:1], mask[:1],
        jnp.full((1, 4), 2, jnp.int32), jnp.full((1, 4), 2, jnp.int32),
        method=ChimeraInterlinguaModel.init_everything,
    )
    gen = SequenceGenerator(
        model,
        GeneratorSettings(beam_size=BEAM, max_decode_len=MAX_DECODE_LEN,
                          len_penalty=1.5, min_len=30),
    )
    enc, enc_mask = gen._jit_encode_audio(params, audio, mask)
    np.asarray(enc)
    out = gen._jit_generate(params, enc, enc_mask, None, beam_size=BEAM)
    ref_tokens = np.asarray(out[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = gen._jit_generate(params, enc, enc_mask, None, beam_size=BEAM)
        np.asarray(out[0])
    t = (time.perf_counter() - t0) / ITERS
    print(f"B={batch:4d} gather={variant:8s} decode={t*1e3:8.1f}ms "
          f"utt/s(decode-only)={batch/t:7.1f}", flush=True)
    return ref_tokens


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--variants", nargs="+", default=["matmul", "take", "dotgen"])
    args = p.parse_args()
    ref = None
    for v in args.variants:
        toks = run(args.batch, v)
        if ref is None:
            ref = toks
        else:
            assert (toks == ref).all(), f"variant {v} changed decode results!"
    print("all variants produce identical tokens")
