"""A/B: lazy-beam-reorder attention formulations at the bench operating point
(B=128, beam 10, 6 s audio, bf16) — "gather" (one-hot K/V column select
before logits) vs "crosscol" (cross-column logits + post-softmax select).

Both are the same math; asserts identical tokens, then times the full
generate under the bench protocol (distinct inputs per iter, host-sync).
Run each mode in its OWN process (the mode is baked in at trace time):

    CHIMERA_LAZY_SELECT=crosscol python benchmarks/ab_lazy_select.py
    CHIMERA_LAZY_SELECT=gather   python benchmarks/ab_lazy_select.py
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

    mode = os.environ.get("CHIMERA_LAZY_SELECT", "crosscol")
    if os.environ.get("CHIMERA_PALLAS_DECODE", "0") == "1":
        mode = "pallas"
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
        GeneratorSettings(beam_size=10, max_decode_len=64, len_penalty=1.5,
                          min_len=30),
    )
    toks = np.asarray(gen.generate_audio(params, audio, mask)[0])
    np.save(f"/tmp/ab_lazy_tokens_{mode}.npy", toks)
    other = {"gather": "crosscol", "crosscol": "gather",
             "pallas": "crosscol"}[mode]
    other_f = f"/tmp/ab_lazy_tokens_{other}.npy"
    if os.path.exists(other_f):
        ref = np.load(other_f)
        frac = float((toks != ref).mean())
        # exact on CPU (tests/test_generate_golden.py); on TPU the two
        # formulations accumulate bf16 in different orders, which flips
        # argmax ties on random-weights logits — tolerate a small fraction
        print(f"token mismatch vs {other}: {frac:.4%}")
        assert frac < 0.01, f"modes diverge beyond tie-flips: {frac:.2%}"

    batches = [
        jnp.asarray(rng.normal(size=(BATCH, T)) * 0.1, jnp.float32)
        for _ in range(ITERS)
    ]
    jax.block_until_ready(batches)
    t0 = time.perf_counter()
    for b in batches:
        np.asarray(gen.generate_audio(params, b, mask)[0])
    dt = (time.perf_counter() - t0) / ITERS
    print(
        f"mode={mode} B={BATCH}: {dt * 1e3:.1f} ms/batch, "
        f"{BATCH / dt:.1f} utt/s"
    )


if __name__ == "__main__":
    main()
