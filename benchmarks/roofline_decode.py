"""Roofline accounting for the decode bench point (ARCHITECTURE.md §7).

Reads XLA's exact cost analysis (FLOPs + bytes accessed) off the compiled
encode and beam-decode programs at the bench.py operating point, times them
with the tunnel-safe discipline, and prints the roofline position: achieved
FLOP/s vs bf16 peak (MFU) and achieved bytes/s vs HBM bandwidth — i.e.
whether each phase is compute-, bandwidth-, or latency-bound. This is the
evidence VERDICT r3 asked for to decide whether further single-chip decode
work can pay (reference protocol: sequence_generator.py:179 + beam 10 /
lenpen 1.5 from generate-mustc-final.sh:5-8).

Usage: python benchmarks/roofline_decode.py [--batch 128]
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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from device_peaks import HBM_BYTES_PER_S, PEAK_BF16_FLOPS  # noqa: E402


def _cost(compiled):
    c = compiled.cost_analysis()
    c = c[0] if isinstance(c, (list, tuple)) else c
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--seconds", type=float, default=6.0)
    args = p.parse_args()

    import bench  # repo-root bench: reuse its exact problem construction

    B = args.batch
    T = int(args.seconds * bench.SAMPLE_RATE)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(B, T)) * 0.1, jnp.float32)
    mask = jnp.zeros((B, T), bool)
    _, params, gen = bench.build_flagship(T)

    # ---- exact costs off the compiled programs
    enc_lowered = gen._jit_encode_audio.lower(params, audio, mask)
    enc_flops, enc_bytes = _cost(enc_lowered.compile())
    enc, enc_mask = gen._jit_encode_audio(params, audio, mask)
    np.asarray(enc)

    dec_lowered = gen._jit_generate.lower(
        params, enc, enc_mask, None, beam_size=bench.BEAM
    )
    dec_flops, dec_bytes = _cost(dec_lowered.compile())

    # ---- timing (distinct inputs, end-sync, best of 3)
    iters = 6
    wavs = [jnp.asarray(rng.normal(size=(B, T)) * 0.1, jnp.float32)
            for _ in range(iters)]
    jax.block_until_ready(wavs)

    t_enc = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [gen._jit_encode_audio(params, w, mask)[0] for w in wavs]
        for o in outs:
            np.asarray(o)
        t_enc = min(t_enc, (time.perf_counter() - t0) / iters)

    encs = [gen._jit_encode_audio(params, w, mask) for w in wavs]
    jax.block_until_ready(encs)
    t_dec = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [gen._jit_generate(params, e, m, None, beam_size=bench.BEAM)[0]
                for e, m in encs]
        for o in outs:
            np.asarray(o)
        t_dec = min(t_dec, (time.perf_counter() - t0) / iters)

    kind = jax.devices()[0].device_kind
    peak = PEAK_BF16_FLOPS.get(kind, float("nan"))
    bw = HBM_BYTES_PER_S.get(kind, float("nan"))
    steps = bench.MAX_DECODE_LEN

    def report(name, flops, bytes_, dt):
        mfu = flops / dt / peak
        hbm = bytes_ / dt / bw
        print(
            f"{name}: {dt*1e3:7.1f} ms  {flops/1e12:6.2f} TF "
            f"({100*mfu:4.1f}% MFU)  {bytes_/1e9:6.2f} GB "
            f"({100*hbm:5.1f}% of HBM BW)",
            flush=True,
        )
        return mfu, hbm

    print(f"device={kind}  B={B}  beam={bench.BEAM}  steps={steps}")
    report("encode", enc_flops, enc_bytes, t_enc)
    report("decode", dec_flops, dec_bytes, t_dec)
    e2e_dt = t_enc + t_dec
    report("e2e   ", enc_flops + dec_flops, enc_bytes + dec_bytes, e2e_dt)
    print(
        f"per decode step: {t_dec/steps*1e3:.2f} ms wall, "
        f"{dec_bytes/steps/1e9:.3f} GB accessed "
        f"(HBM-minimum step time {dec_bytes/steps/bw*1e3:.2f} ms)"
    )
    print(f"e2e utt/s: {B/e2e_dt:.1f}")


if __name__ == "__main__":
    main()
