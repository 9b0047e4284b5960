"""Capture a jax.profiler trace of the flagship triplet TRAIN step + MFU.

The training-side twin of trace_decode.py: builds the jitted train step the
ST recipe runs (dual audio+text forward, tri-modal loss, adam), times it,
reads the exact FLOP count off XLA's cost analysis, and dumps the top HLO
ops from the xplane so the dominant cost is evidence, not guesswork
(reference workload: fairseq/trainer.py:455-668 + chimera train-en2any-ST.sh).

Usage: TRACE_BATCH=16 python benchmarks/trace_train.py [--no-trace]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/chimera_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

TRACE_DIR = "/tmp/chimera_trace_train"

from device_peaks import PEAK_BF16_FLOPS  # noqa: E402 — shared MFU table


def build_step(batch: int, seconds: float, remat: str = "none",
               workload: str = "st", src_len: int = 32):
    from train_throughput import make_problem, make_problem_mt

    if workload == "mt":
        return make_problem_mt(batch, src_len, jnp.bfloat16)
    return make_problem(batch, seconds, jnp.bfloat16, remat=remat)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=int(os.environ.get("TRACE_BATCH", 16)))
    p.add_argument("--seconds", type=float, default=6.0)
    p.add_argument("--remat", default="none", choices=["none", "w2v2"])
    p.add_argument("--no-trace", action="store_true",
                   help="just time + cost-analysis MFU, skip xplane capture")
    p.add_argument("--topk", type=int, default=40)
    p.add_argument("--workload", default="st", choices=["st", "mt"])
    p.add_argument("--src-len", type=int, default=32)
    args = p.parse_args()

    step, state, make_batch = build_step(args.batch, args.seconds, args.remat,
                                         workload=args.workload,
                                         src_len=args.src_len)

    # warm/compile, then read exact FLOPs off the compiled step
    t0 = time.perf_counter()
    state, metrics = step(state, make_batch(0), jax.random.PRNGKey(0))
    np.asarray(metrics["loss"])
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s", flush=True)

    lowered = step.lower(state, make_batch(0), jax.random.PRNGKey(0))
    cost = lowered.compile().cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0))

    # chained dispatch, single end sync (per-step host sync would add a
    # tunnel RTT to every step); best-of-3 vs run-to-run drift
    iters = 6
    batches = [make_batch(i + 1) for i in range(iters)]
    jax.block_until_ready(batches)
    dt = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        for i, b in enumerate(batches):
            state, metrics = step(state, b, jax.random.PRNGKey(r * iters + i + 1))
        np.asarray(metrics["loss"])
        dt = min(dt, (time.perf_counter() - t0) / iters)

    kind = jax.devices()[0].device_kind
    peak = PEAK_BF16_FLOPS.get(kind)
    achieved = flops / dt
    print(
        f"B={args.batch} remat={args.remat} wl={args.workload}: "
        f"{dt*1e3:.1f} ms/update, "
        + (f"audio_s/s={args.batch*args.seconds/dt:.1f}, "
           if args.workload == "st" else
           f"wps={args.batch*args.src_len/dt:.0f}, ")
        + f"cost-analysis flops/step={flops/1e12:.2f} TF, "
        f"achieved={achieved/1e12:.1f} TF/s"
        + (f", MFU={100*achieved/peak:.1f}% of {kind} bf16 peak"
           if peak else f" (no peak table entry for {kind!r})"),
        flush=True,
    )

    if args.no_trace:
        return

    os.system(f"rm -rf {TRACE_DIR}")
    with jax.profiler.trace(TRACE_DIR):
        for i in range(2):
            state, metrics = step(
                state, make_batch(100 + i), jax.random.PRNGKey(100 + i)
            )
            np.asarray(metrics["loss"])
    print("trace captured", flush=True)

    os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
    import parse_xplane

    parse_xplane.parse(TRACE_DIR, topk=args.topk)


if __name__ == "__main__":
    main()
