"""A/B: fused Pallas conv tail vs XLA composition on the real chip
(BASELINE north star: fused w2v2 conv frontend)."""

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

from chimera_st_tpu.ops.pallas_conv import (
    CH, TAIL_SPEC, conv_tail_fused_windows, conv_tail_reference,
)

B = int(os.environ.get("AB_BATCH", "128"))
T1 = int(os.environ.get("AB_T1", "19198"))  # 6 s audio after layer 0 (k10 s5)
ITERS = 4


def main():
    rng = np.random.default_rng(0)
    ws = [jnp.asarray(rng.normal(scale=0.05, size=(k, CH, CH)), jnp.bfloat16)
          for k, _ in TAIL_SPEC]
    xs = [jnp.asarray(rng.normal(size=(B, T1, CH)) * 0.5, jnp.bfloat16)
          for _ in range(ITERS)]
    jax.block_until_ready(xs)

    ref_fn = jax.jit(conv_tail_reference)
    fused_fn = jax.jit(conv_tail_fused_windows)

    r0 = ref_fn(xs[0], ws); np.asarray(r0)
    f0 = fused_fn(xs[0], ws); np.asarray(f0)
    # parity on-device (bf16 tolerance)
    d = float(jnp.max(jnp.abs(r0.astype(jnp.float32) - f0.astype(jnp.float32))))
    print(f"max |diff| = {d:.4f}")

    # sync via an on-device scalar reduce: materializing the full [B, T', C]
    # output pays a multi-hundred-ms tunnel transfer per iteration that
    # swamps the on-chip time (first A/B rounds measured 742 ms/iter at
    # B=64 for a stack whose whole encode leg runs in 139 ms in-bench)
    sum_fn = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))

    trace_dir = os.environ.get("AB_TRACE_DIR")
    if trace_dir:
        from jax.profiler import trace as jprofile_trace
    else:
        import contextlib

        def jprofile_trace(_):
            return contextlib.nullcontext()

    with jprofile_trace(trace_dir):
        t0 = time.perf_counter()
        for x in xs:
            np.asarray(sum_fn(ref_fn(x, ws)))
        t_ref = (time.perf_counter() - t0) / ITERS

        t0 = time.perf_counter()
        for x in xs:
            np.asarray(sum_fn(fused_fn(x, ws)))
        t_fused = (time.perf_counter() - t0) / ITERS
    print(f"B={B} T1={T1}: xla={t_ref*1e3:.1f}ms  pallas={t_fused*1e3:.1f}ms  "
          f"speedup={t_ref/t_fused:.2f}x")


if __name__ == "__main__":
    main()
