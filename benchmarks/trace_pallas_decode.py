"""Trace one B=128 generate with the Pallas decode kernel enabled and dump
the device-plane op breakdown (same program as benchmarks/ab_lazy_select.py
with CHIMERA_PALLAS_DECODE=1 — run that first so the compile is cached)."""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/chimera_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/chimera_trace_pallas")


def main():
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
    B, T = 128, 6 * 16000
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(B, T)) * 0.1, jnp.float32)
    mask = jnp.zeros((B, T), bool)
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
    np.asarray(gen.generate_audio(params, audio, mask)[0])  # compile + warm
    audio2 = jnp.asarray(rng.normal(size=(B, T)) * 0.1, jnp.float32)
    with jax.profiler.trace(TRACE_DIR):
        np.asarray(gen.generate_audio(params, audio2, mask)[0])
    xs = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xs)


if __name__ == "__main__":
    main()
