"""Training-throughput benchmark: flagship Chimera triplet fine-tune step.

Measures updates/sec, target-tokens/sec (wps) and audio-seconds/sec of the
fully jitted train step (dual audio+text forward, tri-modal loss, adam +
inverse-sqrt — the reference ST recipe, train-en2any-ST.sh) on the real chip,
plus MFU from XLA's exact cost analysis. Sweeps batch size to the knee and
optionally grad accumulation (--update-freq) and w2v2-trunk remat.

The reference trains ST at --max-tokens 2,000,000 frames/GPU ≈ 125 audio-s
≈ B=21 at 6 s (train-en2any-ST.sh:33-57), so the sweep brackets that point.

axon timing traps apply (memory: identical dispatches are deduped): every
iteration gets a distinct target slice and the step is synced by
materializing the loss on host.

Usage: python benchmarks/train_throughput.py [--batches 8 16 24 32 48]
           [--seconds 6] [--update-freq 1] [--remat none|w2v2] [--json out.json]
"""

import argparse
import json
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
REPEATS = 3

from device_peaks import PEAK_BF16_FLOPS  # noqa: E402 — shared MFU table


def _assemble(model, init_args, crit_name, crit_cfg, lr_cfg, clip_norm,
              one_batch, update_freq, fixes=()):
    """Shared scaffold for both workloads: init, criterion, schedule,
    optimizer, jitted step, and the update_freq > 1 microbatch stacking —
    one definition so the ST and MT sweeps measure the same protocol.
    ``fixes`` are optim.freeze flag names masked out of the optimizer
    (the MT stage's torch-parity trunk skip)."""
    import chimera_st_tpu.criterions  # noqa: F401 — populate the registry
    from chimera_st_tpu.config.registry import CRITERIONS
    from chimera_st_tpu.models.interlingua import ChimeraInterlinguaModel
    from chimera_st_tpu.optim.lr_schedulers import build_lr_schedule
    from chimera_st_tpu.optim.optimizers import build_optimizer
    from chimera_st_tpu.train.train_step import (
        create_train_state,
        make_train_step,
    )

    def make_batch(i: int):
        if update_freq == 1:
            return one_batch(i)
        micros = [one_batch(i * update_freq + j) for j in range(update_freq)]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *micros)

    params = model.init(
        jax.random.PRNGKey(0), *init_args,
        method=ChimeraInterlinguaModel.init_everything,
    )
    crit = CRITERIONS.get(crit_name)(crit_cfg)
    sched = build_lr_schedule(lr_cfg)
    tx = build_optimizer(
        {"_name": "adam", "adam_betas": "(0.9, 0.98)"}, sched,
        clip_norm=clip_norm,
    )
    if fixes:
        from chimera_st_tpu.optim.freeze import wrap_freeze

        tx = wrap_freeze(tx, params, fixes)
    step = make_train_step(model, crit, tx, accum_steps=update_freq,
                           lr_schedule=sched)
    state = create_train_state(params, tx)
    return step, state, make_batch


def make_problem(batch: int, seconds: float, dtype, remat: str = "none",
                 update_freq: int = 1):
    """Build (jitted step, initial state, make_batch) for the flagship
    triplet fine-tune. With update_freq > 1, batches carry a leading
    microbatch axis and the step scans over it (grad accumulation)."""
    from chimera_st_tpu.models.interlingua import (
        ChimeraInterlinguaModel,
        InterlinguaConfig,
    )

    cfg = InterlinguaConfig(
        tgt_vocab_size=10000, src_vocab_size=10000,
        w2v2_remat=(remat == "w2v2"),
    )
    model = ChimeraInterlinguaModel(cfg, dtype=dtype)
    T = int(seconds * SAMPLE_RATE)
    rng = np.random.default_rng(0)

    def one_batch(i: int):
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

    b0 = one_batch(0)
    return _assemble(
        model,
        (b0["audio"][:1], b0["audio_padding_mask"][:1],
         b0["src_text"][:1], b0["prev_output_tokens"][:1]),
        "triplet_st_mt_contrastive",
        {"label_smoothing": 0.1, "loss_ratio": (1.0, 1.0, 1.0)},
        {"_name": "inverse_sqrt", "lr": 1e-4, "warmup_updates": 1000},
        10.0, one_batch, update_freq,
    )


def make_problem_mt(batch: int, src_len: int, dtype, update_freq: int = 1,
                    freeze_trunk: bool = False):
    """MT pre-train stage step: SAME interlingua model, text-branch forward
    + label-smoothed CE (the reference's 500k-update WMT stage,
    train-en2any-MT.sh: --task translation --max-tokens 4096 --update-freq 8).
    Audio trunk params exist but are untouched, exactly as in the real run."""
    from chimera_st_tpu.models.interlingua import (
        ChimeraInterlinguaModel,
        InterlinguaConfig,
    )

    cfg = InterlinguaConfig(tgt_vocab_size=10000, src_vocab_size=10000)
    model = ChimeraInterlinguaModel(cfg, dtype=dtype)
    rng = np.random.default_rng(0)
    S_mt = src_len

    def one_batch(i: int):
        tgt = rng.integers(4, 10000, size=(batch, S_mt)).astype(np.int32)
        tgt[:, -1] = 2
        prev = np.concatenate([np.full((batch, 1), 2, np.int32), tgt[:, :-1]], 1)
        return {
            "src_tokens": jnp.asarray(
                rng.integers(4, 10000, size=(batch, S_mt)), jnp.int32
            ),
            "prev_output_tokens": jnp.asarray(prev),
            "target": jnp.asarray(tgt),
            "ntokens": jnp.asarray(batch * S_mt, jnp.float32),
        }

    b0 = one_batch(0)
    return _assemble(
        model,
        (jnp.zeros((1, 8000), jnp.float32), jnp.zeros((1, 8000), bool),
         b0["src_tokens"][:1], b0["prev_output_tokens"][:1]),
        "label_smoothed_cross_entropy", {"label_smoothing": 0.1},
        {"_name": "inverse_sqrt", "lr": 5e-4, "warmup_updates": 4000},
        0.0, one_batch, update_freq,
        fixes=("fix_audio_trunk",) if freeze_trunk else (),
    )


def run_mt_ragged(token_budget: int, n_buckets: int, dtype,
                  n_sents: int = 8192, seed: int = 0,
                  freeze_trunk: bool = False):
    """MT pre-train throughput on a RAGGED WMT-like length distribution —
    the real operating point, not the uniform-32-token best case.

    Sentence lengths ~ lognormal(median 24, sigma 0.6) clipped to [4, 128]
    (WMT14 en-de BPE-ish); batches are built the way the train CLI builds
    them for XLA: length-sorted, bucketed to `n_buckets` DP-optimal edges
    (data.batching.optimal_buckets), each bucket split into even chunks
    under a per-batch token budget (reference packs ragged batches by token
    budget eagerly, data_utils_fast.pyx:27-123 — here the bucket edge is the
    compiled shape). Reports wps on REAL tokens, padding fill, and the
    fill-weighted MFU across all compiled shapes."""
    from chimera_st_tpu.data.batching import optimal_buckets, pad_to_bucket
    from chimera_st_tpu.models.interlingua import (
        ChimeraInterlinguaModel,
        InterlinguaConfig,
    )

    cfg = InterlinguaConfig(tgt_vocab_size=10000, src_vocab_size=10000)
    model = ChimeraInterlinguaModel(cfg, dtype=dtype)
    rng = np.random.default_rng(seed)

    lens = np.clip(
        rng.lognormal(np.log(24), 0.6, size=n_sents), 4, 128
    ).astype(np.int64)
    edges = optimal_buckets(lens, n_buckets)
    by_edge = {}
    for L in sorted(lens, reverse=True):
        by_edge.setdefault(pad_to_bucket(int(L), edges), []).append(int(L))
    jobs = []  # (S_edge, batch, real_lens)
    for e, items in sorted(by_edge.items()):
        bmax = max(8, int(np.clip(round(token_budget / e / 8) * 8, 8, 1024)))
        chunks = int(np.ceil(len(items) / bmax))
        b = int(np.ceil(len(items) / chunks / 8) * 8)
        for j in range(chunks):
            jobs.append((e, b, items[j * b:(j + 1) * b]))

    def job_batch(S, B, real_lens, i):
        r = np.random.default_rng(hash((S, B, i)) % 2**32)
        tgt = r.integers(4, 10000, size=(B, S)).astype(np.int32)
        for row, L in enumerate(real_lens):
            tgt[row, L - 1] = 2
            tgt[row, L:] = 1  # pad
        tgt[len(real_lens):] = 1  # dummy round-off rows: all-pad targets
        prev = np.concatenate([np.full((B, 1), 2, np.int32), tgt[:, :-1]], 1)
        src = r.integers(4, 10000, size=(B, S)).astype(np.int32)
        for row in range(B):
            L = real_lens[row] if row < len(real_lens) else 1
            src[row, L:] = 1
        return {
            "src_tokens": jnp.asarray(src),
            "prev_output_tokens": jnp.asarray(prev),
            "target": jnp.asarray(tgt),
            "ntokens": jnp.asarray(
                float(sum(real_lens)) or 1.0, jnp.float32),
        }

    b0 = job_batch(*jobs[0][:2], jobs[0][2], 0)
    step, state, _ = _assemble(
        model,
        (jnp.zeros((1, 8000), jnp.float32), jnp.zeros((1, 8000), bool),
         b0["src_tokens"][:1], b0["prev_output_tokens"][:1]),
        "label_smoothed_cross_entropy", {"label_smoothing": 0.1},
        {"_name": "inverse_sqrt", "lr": 5e-4, "warmup_updates": 4000},
        0.0, lambda i: None, 1,
        fixes=("fix_audio_trunk",) if freeze_trunk else (),
    )

    # compile every distinct (S, B) shape + collect its FLOPs
    flops_by_shape = {}
    for S, B, ls in jobs:
        if (S, B) in flops_by_shape:
            continue
        b = job_batch(S, B, ls, -1)
        state, m = step(state, b, jax.random.PRNGKey(0))
        np.asarray(m["loss"])
        cost = step.lower(state, b, jax.random.PRNGKey(0)).compile(
        ).cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops_by_shape[(S, B)] = float(cost.get("flops", 0.0))

    inputs = [job_batch(S, B, ls, i) for i, (S, B, ls) in enumerate(jobs)]
    jax.block_until_ready(inputs)
    dt = float("inf")
    for r in range(REPEATS):
        t0 = time.perf_counter()
        for b, (S, B, ls) in zip(inputs, jobs):
            state, m = step(state, b, jax.random.PRNGKey(r + 1))
        np.asarray(m["loss"])
        dt = min(dt, time.perf_counter() - t0)

    real_tokens = int(sum(sum(ls) for _, _, ls in jobs))
    padded_tokens = int(sum(S * B for S, B, _ in jobs))
    total_flops = sum(flops_by_shape[(S, B)] for S, B, _ in jobs)
    kind = jax.devices()[0].device_kind
    peak = PEAK_BF16_FLOPS.get(kind)
    mfu = total_flops / dt / peak if peak else None
    out = {
        "workload": "mt_ragged",
        "freeze_trunk": freeze_trunk,
        "token_budget": token_budget,
        "n_buckets": n_buckets,
        "n_sents": n_sents,
        "n_batches": len(jobs),
        "edges": [int(e) for e in edges],
        "batch_per_edge": {str(S): B for S, B, _ in jobs},
        "fill": round(real_tokens / padded_tokens, 3),
        "real_wps": round(real_tokens / dt, 0),
        "padded_wps": round(padded_tokens / dt, 0),
        "updates_per_sec": round(len(jobs) / dt, 2),
        "mfu_pct": round(100 * mfu, 1) if mfu is not None else None,
        "length_dist": "lognormal(median 24, sigma 0.6) clip [4, 128]",
    }
    print(
        f"mt_ragged budget={token_budget} buckets={n_buckets}: "
        f"real_wps={out['real_wps']:.0f} fill={out['fill']} "
        f"MFU={out['mfu_pct']}% shapes={len(flops_by_shape)}",
        flush=True,
    )
    return out


def run(batch: int, seconds: float, dtype, remat: str = "none",
        update_freq: int = 1, workload: str = "st", src_len: int = 32,
        freeze_trunk: bool = False):
    if workload == "mt":
        step, state, make_batch = make_problem_mt(
            batch, src_len, dtype, update_freq=update_freq,
            freeze_trunk=freeze_trunk,
        )
        tokens_per_sample = src_len
    else:
        step, state, make_batch = make_problem(
            batch, seconds, dtype, remat=remat, update_freq=update_freq
        )
        tokens_per_sample = U

    # warm (compile)
    t0 = time.perf_counter()
    try:
        state, metrics = step(state, make_batch(0), jax.random.PRNGKey(0))
        np.asarray(metrics["loss"])
    except Exception as e:  # OOM at this batch — report and move on
        msg = str(e).splitlines()[0][:160]
        print(f"B={batch:4d} uf={update_freq} remat={remat}: FAILED ({msg})",
              flush=True)
        return None
    compile_s = time.perf_counter() - t0

    # exact FLOPs per compiled step for the MFU numerator
    cost = step.lower(
        state, make_batch(0), jax.random.PRNGKey(0)
    ).compile().cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0))
    if update_freq > 1:
        # XLA cost analysis counts a scan/while body ONCE regardless of trip
        # count. The accum step is 1 explicit microbatch + scan(uf-1) + a
        # (negligible) optimizer apply, so the report covers ~2 microbatches;
        # scale to the true count (verified: uf=8 then reads ~= the same-
        # effective-batch uf=1 MFU instead of 4x under it).
        flops = flops * update_freq / 2.0

    # Timing: dispatch ITERS steps back-to-back (state carries the data
    # dependency, so they serialize on device) and sync ONCE at the end —
    # per-step host materialization would add a tunnel round-trip to every
    # step and swamp the number at small batch. Distinct inputs per step
    # (axon dedupes identical dispatches); best of REPEATS guards the ~2x
    # run-to-run tunnel drift.
    batches = [make_batch(i + 1) for i in range(ITERS)]
    jax.block_until_ready(batches)
    dt = float("inf")
    for r in range(REPEATS):
        t0 = time.perf_counter()
        for i, b in enumerate(batches):
            state, metrics = step(state, b, jax.random.PRNGKey(r * ITERS + i + 1))
        np.asarray(metrics["loss"])
        dt = min(dt, (time.perf_counter() - t0) / ITERS)

    eff_batch = batch * update_freq
    ups = 1.0 / dt
    kind = jax.devices()[0].device_kind
    peak = PEAK_BF16_FLOPS.get(kind)
    mfu = flops / dt / peak if peak else None
    audio_s = eff_batch * seconds * ups if workload == "st" else None
    print(
        f"B={batch:4d} uf={update_freq} remat={remat}: {dt*1e3:8.1f} ms/update"
        f"  ups={ups:6.2f}  wps={eff_batch*tokens_per_sample*ups:9.0f}"
        + (f"  audio_s/s={audio_s:8.1f}" if audio_s is not None else "")
        + f"  flops/step={flops/1e12:.2f}TF"
        + (f"  MFU={100*mfu:.1f}%" if mfu is not None else "")
        + f"  (first step incl. compile: {compile_s:.1f}s)",
        flush=True,
    )
    return {
        "batch": batch, "update_freq": update_freq, "remat": remat,
        "workload": workload,
        "ms_per_update": round(dt * 1e3, 1),
        "updates_per_sec": round(ups, 3),
        "wps": round(eff_batch * tokens_per_sample * ups, 0),
        "audio_s_per_sec": round(audio_s, 1) if audio_s is not None else None,
        "flops_per_step_tf": round(flops / 1e12, 2),
        "mfu_pct": round(100 * mfu, 1) if mfu is not None else None,
    }


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[8, 16, 24, 32, 48])
    p.add_argument("--seconds", type=float, default=6.0)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--update-freq", type=int, nargs="+", default=[1])
    p.add_argument("--remat", default="none", choices=["none", "w2v2"])
    p.add_argument("--workload", default="st", choices=["st", "mt"],
                   help="st = triplet fine-tune step (train-en2any-ST.sh); "
                        "mt = text-branch pre-train step (train-en2any-MT.sh, "
                        "tokens = batch * src-len)")
    p.add_argument("--src-len", type=int, default=32,
                   help="tokens per sentence for --workload mt")
    p.add_argument("--ragged", action="store_true",
                   help="--workload mt only: ragged WMT-like lengths through "
                        "the bucketed batching path (reports fill + real-"
                        "token wps); --token-budget values are swept")
    p.add_argument("--token-budget", type=int, nargs="+",
                   default=[4096, 16384],
                   help="padded tokens per batch for --ragged")
    p.add_argument("--n-buckets", type=int, default=4)
    p.add_argument("--freeze-trunk", action="store_true",
                   help="--workload mt: mask the audio trunk out of the "
                        "optimizer (torch-parity grad-None skip; the train "
                        "CLI does this automatically for text-only tasks)")
    p.add_argument("--n-sents", type=int, default=8192)
    p.add_argument("--json", default=None, help="write the sweep as JSON here")
    args = p.parse_args()
    dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.dtype]
    rows = []
    if args.ragged:
        if args.workload != "mt":
            raise SystemExit("--ragged requires --workload mt")
        for budget in args.token_budget:
            r = run_mt_ragged(budget, args.n_buckets, dt, n_sents=args.n_sents,
                              freeze_trunk=args.freeze_trunk)
            if r:
                rows.append(r)
        best = max(rows, key=lambda r: r["real_wps"]) if rows else None
        summary = {
            "metric": "train_mt_ragged_real_tokens_per_sec_per_chip",
            "value": best["real_wps"] if best else 0.0,
            "unit": "tokens/s",
            "device": jax.devices()[0].device_kind,
            "best": best,
            "sweep": rows,
        }
        print(json.dumps(summary), flush=True)
        if args.json:
            with open(args.json, "w") as f:
                json.dump(summary, f, indent=1)
        raise SystemExit(0)
    for uf in args.update_freq:
        for b in args.batches:
            r = run(b, args.seconds, dt, remat=args.remat, update_freq=uf,
                    workload=args.workload, src_len=args.src_len,
                    freeze_trunk=args.freeze_trunk)
            if r:
                rows.append(r)
    key = "audio_s_per_sec" if args.workload == "st" else "wps"
    best = max(rows, key=lambda r: r[key]) if rows else None
    summary = {
        "metric": ("train_audio_seconds_per_sec_per_chip" if args.workload == "st"
                   else "train_mt_target_tokens_per_sec_per_chip"),
        "value": best[key] if best else 0.0,
        "unit": "audio-s/s" if args.workload == "st" else "tokens/s",
        "device": jax.devices()[0].device_kind,
        "best": best,
        "sweep": rows,
    }
    print(json.dumps(summary), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=1)
