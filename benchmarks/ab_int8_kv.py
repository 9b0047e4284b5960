"""A/B: int8 KV cache (--kv-cache-int8) vs bf16 cache at the bench operating
point (B=128, beam 10, 6 s audio, bf16 model). Both run in one process (the
flag is a GeneratorSettings field -> separate jit programs).

Asserts near-identical tokens (int8 is lossy: per-row symmetric quantization
flips a small fraction of argmax ties on random-weights logits), then times
the full generate under the bench protocol (distinct inputs per iter,
host-sync via np.asarray).

    python benchmarks/ab_int8_kv.py            # B=128
    AB_BATCH=64 python benchmarks/ab_int8_kv.py
"""

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

BATCH = int(os.environ.get("AB_BATCH", "128"))
ITERS = 6


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

    gens, toks = {}, {}
    for int8 in (False, True):
        gens[int8] = SequenceGenerator(
            model,
            GeneratorSettings(beam_size=10, max_decode_len=64, len_penalty=1.5,
                              min_len=30, kv_cache_int8=int8),
        )
        toks[int8] = np.asarray(gens[int8].generate_audio(params, audio, mask)[0])
    frac = float((toks[False] != toks[True]).mean())
    print(f"token mismatch int8 vs bf16: {frac:.4%}")
    assert frac < 0.02, f"int8 cache diverges beyond quantization ties: {frac:.2%}"

    batches = [
        jnp.asarray(rng.normal(size=(BATCH, T)) * 0.1, jnp.float32)
        for _ in range(ITERS)
    ]
    jax.block_until_ready(batches)
    # interleave the variants per iteration — this tunnel has up to 2x
    # run-to-run drift, so timing all of A then all of B can fabricate or
    # bury a ~5% effect (same rule as the other ab_*.py harnesses)
    totals = {False: 0.0, True: 0.0}
    for b in batches:
        for int8 in (False, True):
            t0 = time.perf_counter()
            np.asarray(gens[int8].generate_audio(params, b, mask)[0])
            totals[int8] += time.perf_counter() - t0
    for int8 in (False, True):
        dt = totals[int8] / ITERS
        print(
            f"int8={int8} B={BATCH}: {dt * 1e3:.1f} ms/batch, "
            f"{BATCH / dt:.1f} utt/s"
        )
    print(f"speedup int8/bf16: {totals[False] / totals[True]:.3f}x")


if __name__ == "__main__":
    main()
