"""Isolate decode-loop component costs on the real chip.

Times jitted while_loops of N steps each:
  a) decoder.step only (no beam gather)
  b) beam gather only (block-diagonal one-hot matmul over the cache pytree)
  c) step + gather (the real loop body shape)
  d) top-2K over [B, K*V]
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

BEAM = 10
MAX_LEN = 64
STEPS = 32


def timed(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main(B):
    from chimera_st_tpu.generation.beam_search import _gather_flat_beams
    from chimera_st_tpu.models.interlingua import (
        ChimeraInterlinguaModel,
        InterlinguaConfig,
    )

    cfg = InterlinguaConfig(tgt_vocab_size=10000, src_vocab_size=10000)
    model = ChimeraInterlinguaModel(cfg, dtype=jnp.bfloat16)
    K = BEAM
    BK = B * K
    c = cfg
    head_dim = c.decoder_embed_dim // c.decoder_heads
    kv_shape = (BK, MAX_LEN + 1, c.decoder_heads, head_dim)

    rngk = jax.random.PRNGKey(0)
    params = model.init(
        rngk,
        jnp.zeros((1, 8000), jnp.float32), jnp.zeros((1, 8000), bool),
        jnp.full((1, 4), 2, jnp.int32), jnp.full((1, 4), 2, jnp.int32),
        method=ChimeraInterlinguaModel.init_everything,
    )
    M = cfg.interlingua_length
    enc = jax.random.normal(rngk, (B, M, c.decoder_embed_dim), jnp.bfloat16)
    enc_kv = model.apply(
        params, enc.astype(jnp.float32),
        method=lambda m, e: m.decoder.precompute_encoder_kv(e),
    )
    enc_kv = jax.tree_util.tree_map(lambda x: jnp.repeat(x, K, axis=0), enc_kv)

    caches = [
        {"k": jnp.zeros(kv_shape, jnp.bfloat16), "v": jnp.zeros(kv_shape, jnp.bfloat16)}
        for _ in range(c.decoder_layers)
    ]

    def step_only(caches):
        def body(carry):
            i, caches, tok = carry
            logits, new_caches = model.apply(
                params, tok, i, caches, enc_kv, None,
                method=lambda m, t, ii, cc, ekv, em: m.decoder.step(t, ii, cc, ekv, em),
            )
            tok = jnp.argmax(logits, axis=-1)[:, None].astype(jnp.int32)
            return i + 1, new_caches, tok

        init = (jnp.asarray(0, jnp.int32), caches, jnp.full((BK, 1), 2, jnp.int32))
        return jax.lax.while_loop(lambda s: s[0] < STEPS, body, init)[1]

    def gather_only(caches):
        def body(carry):
            i, caches = carry
            idx = (jnp.arange(B * K, dtype=jnp.int32).reshape(B, K) + i) % K
            new = _gather_flat_beams(caches, idx % K, B, K)
            return i + 1, new

        init = (jnp.asarray(0, jnp.int32), caches)
        return jax.lax.while_loop(lambda s: s[0] < STEPS, body, init)[1]

    def step_and_gather(caches):
        def body(carry):
            i, caches, tok = carry
            logits, new_caches = model.apply(
                params, tok, i, caches, enc_kv, None,
                method=lambda m, t, ii, cc, ekv, em: m.decoder.step(t, ii, cc, ekv, em),
            )
            tok = jnp.argmax(logits, axis=-1)[:, None].astype(jnp.int32)
            idx = (jnp.arange(B * K, dtype=jnp.int32).reshape(B, K) + i) % K
            new_caches = _gather_flat_beams(new_caches, idx, B, K)
            return i + 1, new_caches, tok

        init = (jnp.asarray(0, jnp.int32), caches, jnp.full((BK, 1), 2, jnp.int32))
        return jax.lax.while_loop(lambda s: s[0] < STEPS, body, init)[1]

    def topk_only(x0):
        def body(carry):
            i, x = carry
            sc, idx = jax.lax.top_k(x.reshape(B, K * 10000), 2 * K)
            x = x + sc[:, :K, None] * 1e-9
            return i + 1, x

        return jax.lax.while_loop(lambda s: s[0] < STEPS, body, (jnp.asarray(0), x0))[1]

    t_a = timed(jax.jit(step_only), caches)
    t_b = timed(jax.jit(gather_only), caches)
    t_c = timed(jax.jit(step_and_gather), caches)
    x0 = jax.random.normal(rngk, (B, K, 10000), jnp.float32)
    t_d = timed(jax.jit(topk_only), x0)
    per = 1e3 / STEPS
    print(
        f"B={B:4d} per-step: step_only={t_a*per:6.3f}ms gather_only={t_b*per:6.3f}ms "
        f"step+gather={t_c*per:6.3f}ms top2k={t_d*per:6.3f}ms",
        flush=True,
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[16, 32, 64])
    args = p.parse_args()
    for b in args.batches:
        main(b)
