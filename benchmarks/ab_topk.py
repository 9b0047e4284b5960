"""A/B top-2K selection variants inside the real decode loop."""

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


def flat_top2k(alive_scores, logprobs, B, K, V):
    cand = alive_scores[:, :, None] + logprobs
    s, idx = jax.lax.top_k(cand.reshape(B, K * V), 2 * K)
    return s, idx // V, idx % V


def two_stage_top2k(alive_scores, logprobs, B, K, V):
    # per-beam top-2K over V, then top-2K of the 2K*K shortlist
    cand = alive_scores[:, :, None] + logprobs  # [B, K, V]
    s1, t1 = jax.lax.top_k(cand, 2 * K)  # [B, K, 2K]
    flat_s = s1.reshape(B, K * 2 * K)
    s2, i2 = jax.lax.top_k(flat_s, 2 * K)
    beam = i2 // (2 * K)
    tok = jnp.take_along_axis(t1.reshape(B, K * 2 * K), i2, axis=1)
    return s2, beam, tok


def approx_top2k(alive_scores, logprobs, B, K, V):
    cand = (alive_scores[:, :, None] + logprobs).reshape(B, K * V)
    s, idx = jax.lax.approx_max_k(cand, 2 * K, recall_target=0.99)
    idx = idx.astype(jnp.int32)
    return s, idx // V, idx % V


VARIANTS = {"flat": flat_top2k, "two_stage": two_stage_top2k, "approx": approx_top2k}


def run(batch, variant):
    bs._default_top2k = VARIANTS[variant]
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
        GeneratorSettings(beam_size=10, max_decode_len=64, len_penalty=1.5,
                          min_len=30),
    )
    enc, enc_mask = gen._jit_encode_audio(params, audio, mask)
    np.asarray(enc)
    out = gen._jit_generate(params, enc, enc_mask, None, beam_size=10)
    toks = np.asarray(out[0])
    t0 = time.perf_counter()
    for _ in range(6):
        out = gen._jit_generate(params, enc, enc_mask, None, beam_size=10)
        np.asarray(out[0])
    t = (time.perf_counter() - t0) / 6
    print(f"B={batch} topk={variant:10s} decode={t*1e3:7.1f}ms", flush=True)
    return toks


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--variants", nargs="+", default=["flat", "two_stage"])
    args = p.parse_args()
    ref = None
    for v in args.variants:
        t = run(args.batch, v)
        if ref is None:
            ref = t
        elif v != "approx":
            assert (t == ref).all(), f"{v} changed tokens"
    print("done")
