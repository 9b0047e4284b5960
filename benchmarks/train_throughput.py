"""Training-throughput benchmark: flagship Chimera triplet fine-tune step.

Measures updates/sec, target-tokens(wps) and audio-seconds/sec of the fully
jitted train step (dual audio+text forward, tri-modal loss, adam +
inverse-sqrt — the reference ST recipe, train-en2any-ST.sh) on the real
chip. Complements bench.py's decode number with the training-side figure the
reference harness logs as wps/ups (trainer metrics, SURVEY.md §6).

axon timing traps apply (memory: identical dispatches are deduped): every
iteration gets a distinct target slice and the step is synced by
materializing the loss on host.

Usage: python benchmarks/train_throughput.py [--batches 8 16] [--seconds 6]
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
U = 32  # target length (tokens)
S = 32  # source text length
ITERS = 6


def run(batch: int, seconds: float, dtype):
    import chimera_st_tpu.criterions  # noqa: F401 — populate the registry
    from chimera_st_tpu.config.registry import CRITERIONS
    from chimera_st_tpu.models.interlingua import (
        ChimeraInterlinguaModel,
        InterlinguaConfig,
    )
    from chimera_st_tpu.optim.lr_schedulers import build_lr_schedule
    from chimera_st_tpu.optim.optimizers import build_optimizer
    from chimera_st_tpu.train.train_step import (
        create_train_state,
        make_train_step,
    )

    cfg = InterlinguaConfig(tgt_vocab_size=10000, src_vocab_size=10000)
    model = ChimeraInterlinguaModel(cfg, dtype=dtype)
    T = int(seconds * SAMPLE_RATE)
    rng = np.random.default_rng(0)

    def make_batch(i: int):
        tgt = rng.integers(4, 10000, size=(batch, U)).astype(np.int32)
        tgt[:, -1] = 2
        prev = np.concatenate([np.full((batch, 1), 2, np.int32), tgt[:, :-1]], 1)
        return {
            "audio": jnp.asarray(
                rng.normal(size=(batch, T)).astype(np.float32) * 0.1
            ),
            "audio_padding_mask": jnp.zeros((batch, T), bool),
            "src_text": jnp.asarray(
                rng.integers(4, 10000, size=(batch, S)), jnp.int32
            ),
            "prev_output_tokens": jnp.asarray(prev),
            "target": jnp.asarray(tgt),
            "ntokens": jnp.asarray(batch * U, jnp.float32),
        }

    b0 = make_batch(0)
    params = model.init(
        jax.random.PRNGKey(0), b0["audio"][:1], b0["audio_padding_mask"][:1],
        b0["src_text"][:1], b0["prev_output_tokens"][:1],
        method=ChimeraInterlinguaModel.init_everything,
    )
    crit = CRITERIONS.get("triplet_st_mt_contrastive")(
        {"label_smoothing": 0.1, "loss_ratio": (1.0, 1.0, 1.0)}
    )
    sched = build_lr_schedule(
        {"_name": "inverse_sqrt", "lr": 1e-4, "warmup_updates": 1000}
    )
    tx = build_optimizer(
        {"_name": "adam", "adam_betas": "(0.9, 0.98)"}, sched, clip_norm=10.0
    )
    step = make_train_step(model, crit, tx, lr_schedule=sched)
    state = create_train_state(params, tx)

    # warm (compile)
    t0 = time.perf_counter()
    state, metrics = step(state, make_batch(0), jax.random.PRNGKey(0))
    np.asarray(metrics["loss"])
    compile_s = time.perf_counter() - t0

    batches = [make_batch(i + 1) for i in range(ITERS)]  # distinct inputs
    t0 = time.perf_counter()
    for i, b in enumerate(batches):
        state, metrics = step(state, b, jax.random.PRNGKey(i + 1))
        np.asarray(metrics["loss"])
    dt = (time.perf_counter() - t0) / ITERS

    ups = 1.0 / dt
    print(
        f"B={batch:4d}  {dt*1e3:8.1f} ms/update  ups={ups:6.2f}  "
        f"wps={batch*U*ups:9.0f}  audio_s/s={batch*seconds*ups:8.1f}  "
        f"(first step incl. compile: {compile_s:.1f}s)",
        flush=True,
    )
    return ups


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[8, 16])
    p.add_argument("--seconds", type=float, default=6.0)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()
    dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.dtype]
    for b in args.batches:
        run(b, args.seconds, dt)
