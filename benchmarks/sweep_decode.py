"""Decode throughput sweep: batch size x configuration.

Measures the flagship-model beam decode (beam 10, 6 s utterances, bf16)
at several batch sizes on the real chip, separating encode cost from the
decode loop. Informs bench.py's operating point (VERDICT round-1 item 2).
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

SAMPLE_RATE = 16000
AUDIO_SECONDS = 6.0
BEAM = 10
MAX_DECODE_LEN = 64
ITERS = 4


def run(batch, cache_segment=16):
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
    T = int(AUDIO_SECONDS * SAMPLE_RATE)
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
        GeneratorSettings(
            beam_size=BEAM, max_decode_len=MAX_DECODE_LEN,
            len_penalty=1.5, min_len=30, cache_segment=cache_segment,
        ),
    )

    # --- encode only
    enc, enc_mask = gen._jit_encode_audio(params, audio, mask)
    np.asarray(enc)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        enc, enc_mask = gen._jit_encode_audio(params, audio, mask)
        np.asarray(enc)
    t_enc = (time.perf_counter() - t0) / ITERS

    # --- decode only (from precomputed encoder out)
    out = gen._jit_generate(params, enc, enc_mask, None, beam_size=BEAM)
    np.asarray(out[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = gen._jit_generate(params, enc, enc_mask, None, beam_size=BEAM)
        np.asarray(out[0])
    t_dec = (time.perf_counter() - t0) / ITERS

    # --- end to end
    np.asarray(gen.generate_audio(params, audio, mask)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        np.asarray(gen.generate_audio(params, audio, mask)[0])
    t_tot = (time.perf_counter() - t0) / ITERS

    print(
        f"B={batch:4d}  encode={t_enc*1e3:8.1f}ms  decode={t_dec*1e3:8.1f}ms  "
        f"total={t_tot*1e3:8.1f}ms  utt/s={batch/t_tot:8.1f}  "
        f"rtfx={batch*AUDIO_SECONDS/t_tot:8.0f}",
        flush=True,
    )
    return batch / t_tot


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[16, 32, 64, 128])
    p.add_argument(
        "--cache-segment", type=int, default=16,
        help="KV-cache growth segment (0 = preallocate max_len)",
    )
    args = p.parse_args()
    for b in args.batches:
        run(b, cache_segment=args.cache_segment)
