"""Capture a jax.profiler trace of the decode loop and dump HLO op stats."""

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

BATCH = int(os.environ.get("TRACE_BATCH", "64"))
TRACE_DIR = "/tmp/chimera_trace"


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
    T = 6 * 16000
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(BATCH, T)) * 0.1, jnp.float32)
    mask = jnp.zeros((BATCH, T), bool)
    params = model.init(
        jax.random.PRNGKey(0), audio[:1], mask[:1],
        jnp.full((1, 4), 2, jnp.int32), jnp.full((1, 4), 2, jnp.int32),
        method=ChimeraInterlinguaModel.init_everything,
    )
    gen = SequenceGenerator(
        model,
        GeneratorSettings(beam_size=10, max_decode_len=64, len_penalty=1.5, min_len=30),
    )
    np.asarray(gen.generate_audio(params, audio, mask)[0])  # warm

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(2):
            np.asarray(gen.generate_audio(params, audio, mask)[0])
    print("trace captured", flush=True)

    # dump op stats from the xplane (parse_xplane parses the proto directly;
    # the tensorboard plugin's native converter is broken with installed TF)
    os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
    import parse_xplane

    parse_xplane.parse(TRACE_DIR, topk=50)


if __name__ == "__main__":
    main()
