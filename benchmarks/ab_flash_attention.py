"""A/B: fused Pallas encoder attention vs XLA softmax(QK^T)V on the real
chip — measured end-to-end through the flagship audio encoder."""

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

import chimera_st_tpu.ops.attention as attn_mod
from chimera_st_tpu.models.interlingua import (
    ChimeraInterlinguaModel,
    InterlinguaConfig,
)

B = int(os.environ.get("AB_BATCH", "128"))
SECONDS = 6.0
ITERS = 4


def run(flash: bool):
    attn_mod._FLASH_ENABLED = flash
    cfg = InterlinguaConfig(tgt_vocab_size=10000, src_vocab_size=10000)
    model = ChimeraInterlinguaModel(cfg, dtype=jnp.bfloat16)
    T = int(SECONDS * 16000)
    rng = np.random.default_rng(0)
    audio0 = jnp.asarray(rng.normal(size=(B, T)) * 0.1, jnp.float32)
    mask = jnp.zeros((B, T), bool)
    params = model.init(
        jax.random.PRNGKey(0), audio0[:1], mask[:1],
        jnp.full((1, 4), 2, jnp.int32), jnp.full((1, 4), 2, jnp.int32),
        method=ChimeraInterlinguaModel.init_everything,
    )
    enc_fn = jax.jit(
        lambda p, a, m: model.apply(
            p, a, m, method=ChimeraInterlinguaModel.encode_audio
        )
    )
    batches = [
        jnp.asarray(rng.normal(size=(B, T)) * 0.1, jnp.float32)
        for _ in range(ITERS)
    ]
    jax.block_until_ready(batches)
    out = enc_fn(params, audio0, mask)
    np.asarray(out[0])
    t0 = time.perf_counter()
    for b in batches:
        np.asarray(enc_fn(params, b, mask)[0])
    dt = (time.perf_counter() - t0) / ITERS
    print(f"B={B} flash={int(flash)}: encode={dt*1e3:7.1f}ms", flush=True)
    return np.asarray(out[0], np.float32)


if __name__ == "__main__":
    ref = run(False)
    got = run(True)
    d = float(np.max(np.abs(ref - got)))
    print(f"max |diff| = {d:.4f} (bf16 compute; expect <0.1)")
