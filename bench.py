"""Decode-throughput benchmark (runs on one real TPU chip).

Measures batched beam-search speech translation on the flagship architecture
(512-d encoder/decoder, wav2vec2-base 768-d trunk, full 12+6+3 layer depth,
M=16 memory) under the reference eval protocol shape: beam 10 on ~6 s
utterances (MuST-C tst-COMMON mean duration), bf16 compute.

Sweeps batch size and reports the best utterances/sec/chip (round-2: batch
scaling + time-major beam-minor KV caches are the two big levers; see
benchmarks/ for the sweep/trace tooling). Prints ONE JSON line; extras carry
the per-batch breakdown (encode vs decode wall time).

`vs_baseline` is measured against REF_A100_UTT_PER_SEC, an assumed
fairseq/A100 baseline for the same protocol (the reference publishes no
throughput numbers — BASELINE.md; fairseq sequence_generator with a wav2vec2
front end decodes ~10 utt/s on A100-class hardware at beam 10; the
BASELINE.json target is >=20x that).
"""

import json
import os
import time

import jax

# persistent compile cache: first-run compiles of the flagship model take
# minutes over the remote-TPU tunnel; later runs hit the cache
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/chimera_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

REF_A100_UTT_PER_SEC = 10.0  # assumed fairseq A100 baseline (see docstring)

# round-3: lazy beam reorder + grouped cross-attention moved the knee of the
# batch-scaling curve from 64 to 128 (sweep: 206 utt/s at 128, 170 at 192;
# see benchmarks/sweep_decode logs)
BATCHES = (64, 128)
AUDIO_SECONDS = 6.0
SAMPLE_RATE = 16000
BEAM = 10
MAX_DECODE_LEN = 64
ITERS = 6


def build_flagship(probe_len: int):
    """ONE definition of the bench operating point — flagship interlingua
    model, bf16, beam 10, len_penalty 1.5, min_len 30 — shared by run_batch,
    run_mixed_lengths, run_multichip_scaling and benchmarks/roofline_decode
    so the protocol cannot drift between harnesses. min_len pins the decode
    loop to a realistic hypothesis length (random params would otherwise
    emit eos after ~2 steps and measure nothing): tst-COMMON references
    average ~30 target tokens. `probe_len` only drives init shape tracing
    (flax param values depend on the rng, not the probe input)."""
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
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, probe_len), jnp.float32),
        jnp.zeros((1, probe_len), bool),
        jnp.full((1, 4), 2, jnp.int32),
        jnp.full((1, 4), 2, jnp.int32),
        method=ChimeraInterlinguaModel.init_everything,
    )
    gen = SequenceGenerator(
        model,
        GeneratorSettings(
            beam_size=BEAM,
            max_decode_len=MAX_DECODE_LEN,
            len_penalty=1.5,
            min_len=30,
        ),
    )
    return model, params, gen


def run_batch(batch: int, blocks: int = 3):
    """Returns (median secs/batch, encode secs/batch, [per-block secs/batch]).

    The ITERS timed dispatches are split into `blocks` separately-timed
    groups and the MEDIAN block drives the headline — this tunnel drifts up
    to 2x run-to-run, so a single pooled pass made round-over-round deltas
    uninterpretable; the block spread is reported in extras."""
    T = int(AUDIO_SECONDS * SAMPLE_RATE)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(batch, T)) * 0.1, jnp.float32)
    mask = jnp.zeros((batch, T), bool)
    _, params, gen = build_flagship(T)

    # distinct input batches: the axon runtime dedupes identical dispatches.
    # Sync via host materialization (np.asarray) — block_until_ready returns
    # early on this remote platform and measures fiction.
    batches = [
        jnp.asarray(rng.normal(size=(batch, T)) * 0.1, jnp.float32)
        for _ in range(ITERS)
    ]
    jax.block_until_ready(batches)

    # encode-only timing (same sync discipline)
    enc, enc_mask = gen._jit_encode_audio(params, audio, mask)
    np.asarray(enc)
    t0 = time.perf_counter()
    for b in batches:
        e, _ = gen._jit_encode_audio(params, b, mask)
        np.asarray(e)
    t_enc = (time.perf_counter() - t0) / ITERS

    np.asarray(gen.generate_audio(params, audio, mask)[0])  # compile + sync
    per_block = max(1, ITERS // blocks)
    block_dts = []
    for i in range(0, len(batches), per_block):
        group = batches[i:i + per_block]
        t0 = time.perf_counter()
        outs = [gen.generate_audio(params, b, mask)[0] for b in group]
        for o in outs:
            np.asarray(o)
        block_dts.append((time.perf_counter() - t0) / len(group))
    return float(np.median(block_dts)), t_enc, block_dts


def run_mixed_lengths(n_buckets: int = 7, n_utts: int = 1024,
                      work_s: float = 768.0, budget_s: float = 1500.0,
                      seed: int = 1, passes: int = 3):
    """Mixed-length decode through the real bucketed eval path (co-headline:
    the north-star metric is tst-COMMON throughput, and tst-COMMON is
    mixed-length — reference protocol chimera/generate/
    generate-mustc-final.sh:5-8, length-sorted batching
    fairseq/data/audio/speech_to_text_dataset.py:423-557).

    Draws a lognormal duration distribution clipped to [2, 15] s (median
    ~5.5 s, like MuST-C tst-COMMON) and decodes it with the padding levers
    the round-4 verdict identified:

    - bucket edges minimizing expected pad (`optimal_buckets` DP, not
      quantiles: 13% vs 16% per-item pad at 6 buckets on this dist),
    - per-bucket batch sizes equalizing PADDED AUDIO per batch (~`work_s`
      seconds = the B=128 x 6 s knee), with each bucket's population split
      into even chunks so round-off dummy rows are < 8 per bucket,
    - per-bucket STATIC decode buffers scaled linearly from the 6 s protocol
      cap (max 64 at 6 s -> 10.7 tokens/audio-s): the compiled loop bound
      tracks the bucket, like the reference's max_positions clamp.

    Decode-loop TERMINATION is emulated per ROW, not per bucket: with
    random bench params the model never emits eos, so bounding the loop
    only by the bucket cap runs every batch to the cap — a 15 s bucket
    would pay 160 steps where a trained checkpoint's beam finalizes at the
    hypothesis length (~5 target tokens per audio-second on tst-COMMON:
    ~30 tokens at the 6 s mean; protocol reference
    chimera/generate/generate-mustc-final.sh:5-8) and the loop's
    `max(max_lens)+1` bound + early-stop ends the batch there. The bench
    forces that terminal point through the generator's own per-sentence
    length machinery (`max_len_a/b` over src_lengths — the reference's
    sequence_generator.py:226-230 a*src+b budget): max_lens[row] =
    5 tok/s * real duration + 2 slack, so each batch runs exactly as many
    steps as its longest realistic hypothesis, under the unchanged bucket
    cap. Same compiled program family as the eval CLI; only the length
    inputs encode the trained-model termination profile.

    Each (edge, batch, decode_len) triple is one compiled shape = n_buckets
    compiles, warmed under `budget_s`. `passes` separately-timed full-corpus
    passes (distinct inputs — the axon runtime dedupes identical dispatches)
    give a median + spread. Returns None if no shape fits the budget."""
    from chimera_st_tpu.data.batching import optimal_buckets, pad_to_bucket
    from chimera_st_tpu.generation.generator import (
        GeneratorSettings,
        SequenceGenerator,
    )

    t_start = time.perf_counter()
    rng = np.random.default_rng(seed)

    secs = np.clip(rng.lognormal(np.log(5.5), 0.55, size=n_utts), 2.0, 15.0)
    lengths = (secs * SAMPLE_RATE).astype(np.int64)
    edges = optimal_buckets(lengths, n_buckets)

    model, params, _ = build_flagship(int(edges[0]))

    # group by covering edge (descending length within, like the real eval
    # sort) and split each bucket into even chunks under the work budget
    by_edge = {}
    for L in sorted(lengths, reverse=True):
        by_edge.setdefault(pad_to_bucket(int(L), edges), []).append(int(L))
    jobs = []  # (edge, real_lengths_in_this_chunk, batch)
    for edge, utts in sorted(by_edge.items()):
        bmax = int(np.clip(round(work_s * SAMPLE_RATE / edge / 8) * 8,
                           32, 256))
        chunks = int(np.ceil(len(utts) / bmax))
        b = int(np.ceil(len(utts) / chunks / 8) * 8)
        for i in range(0, len(utts), b):
            jobs.append((edge, utts[i:i + b], b))

    # one generator per bucket: the 6 s protocol point (BEAM/len_penalty,
    # max 64 at 6 s) scaled by bucket duration for the STATIC buffer;
    # termination rides per-row max_lens = HYP_TOK_PER_SEC * duration + 2
    # (see docstring) via max_len_a/b over src_lengths in samples
    HYP_TOK_PER_SEC = 30.0 / AUDIO_SECONDS  # ~5 target tokens / audio-s

    def gen_for(edge):
        e_sec = edge / SAMPLE_RATE
        max_dl = max(12, int(np.ceil(MAX_DECODE_LEN / AUDIO_SECONDS * e_sec)))
        return SequenceGenerator(
            model,
            GeneratorSettings(
                beam_size=BEAM, max_decode_len=max_dl, len_penalty=1.5,
                min_len=6,
                max_len_a=HYP_TOK_PER_SEC / SAMPLE_RATE, max_len_b=2,
                min_len_a=0.8 * HYP_TOK_PER_SEC / SAMPLE_RATE, min_len_b=0,
            ),
        ), int(np.ceil(HYP_TOK_PER_SEC * e_sec)) + 2, max_dl

    gens = {e: gen_for(e) for e in by_edge}

    def make_inputs(edge, real_lens, batch, salt):
        r = np.random.default_rng(hash((edge, salt)) % 2**32)
        wav = (r.normal(size=(batch, edge)) * 0.1).astype(np.float32)
        mask = np.zeros((batch, edge), bool)
        src_lens = np.full((batch,), edge, np.int32)
        for row, L in enumerate(real_lens):
            mask[row, L:] = True
            src_lens[row] = L
        # rows beyond real_lens keep the all-False mask from np.zeros and
        # the full-edge src length: dummy round-off rows decode at the
        # bucket's full realistic length (counted as waste)
        return jnp.asarray(wav), jnp.asarray(mask), jnp.asarray(src_lens)

    # warm every distinct shape (compile) under the wall-clock budget
    shapes_done = set()
    for edge, utts in sorted(by_edge.items()):
        if time.perf_counter() - t_start > budget_s:
            break
        b = next(j[2] for j in jobs if j[0] == edge)
        w, m, sl = make_inputs(edge, utts[:b], b, salt=-1)
        np.asarray(gens[edge][0].generate_audio(params, w, m, src_lengths=sl)[0])
        shapes_done.add(edge)
    jobs = [j for j in jobs if j[0] in shapes_done]
    if not jobs:
        return None

    # timed passes: place a pass's distinct inputs, sync, dispatch all
    # batches, sync outputs; median pass is the reported number
    pass_rates = []
    done_utts = sum(len(ls) for _, ls, _ in jobs)
    for p in range(passes):
        inputs = [make_inputs(e, ls, b, salt=(p, i))
                  for i, (e, ls, b) in enumerate(jobs)]
        jax.block_until_ready([w for w, _, _ in inputs])
        t0 = time.perf_counter()
        outs = [gens[e][0].generate_audio(params, w, m, src_lengths=sl)[0]
                for (e, _, _), (w, m, sl) in zip(jobs, inputs)]
        for o in outs:
            np.asarray(o)
        pass_rates.append(done_utts / (time.perf_counter() - t0))

    utt_per_sec = float(np.median(pass_rates))
    real_audio_s = sum(sum(ls) for _, ls, _ in jobs) / SAMPLE_RATE
    padded_s = sum(e * b for e, _, b in jobs) / SAMPLE_RATE
    return {
        "utt_per_sec": round(utt_per_sec, 2),
        "utt_per_sec_spread": [round(min(pass_rates), 2),
                               round(max(pass_rates), 2)],
        "rtfx_real_audio": round(
            real_audio_s / done_utts * utt_per_sec, 1),
        "bucket_fill": round(real_audio_s / padded_s, 3),
        "n_compiled_shapes": len(shapes_done),
        "n_buckets_requested": n_buckets,
        "buckets_skipped": len(by_edge) - len(shapes_done),
        "n_utts": done_utts,
        "batch_per_bucket": {
            str(round(e / SAMPLE_RATE, 2)): b
            for e, b in sorted({(e, b) for e, _, b in jobs})},
        # [realistic terminal steps at the bucket edge, static buffer cap]
        "hyp_steps_and_cap_per_bucket": {
            str(round(e / SAMPLE_RATE, 2)): [gens[e][1], gens[e][2]]
            for e in sorted(shapes_done)},
        "edges_sec": [round(e / SAMPLE_RATE, 2) for e in sorted(shapes_done)],
        "duration_dist": "lognormal(median 5.5s, sigma 0.55) clip [2, 15]s",
    }


def run_multichip_scaling(batch: int):
    """Per-chip decode throughput at 1/2/4/.../N chips via data-parallel
    sharding (the generate CLI's >1-device path, tests/test_multichip_decode):
    produces the scaling sweep automatically on the first multi-chip
    environment; returns None on a single chip (today's box)."""
    n_dev = jax.device_count()
    if n_dev < 2:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P

    from chimera_st_tpu.parallel import make_mesh

    T = int(AUDIO_SECONDS * SAMPLE_RATE)
    rng = np.random.default_rng(0)
    _, params, gen = build_flagship(T)
    sweep = {}
    n = 1
    while n <= n_dev:
        mesh = make_mesh(data_parallel=n, model_parallel=1)
        shard = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        p = jax.device_put(params, rep)
        B = batch * n  # same per-chip batch at every width
        mask = jax.device_put(jnp.zeros((B, T), bool), shard)
        batches = [
            jax.device_put(
                jnp.asarray(rng.normal(size=(B, T)) * 0.1, jnp.float32), shard
            )
            for _ in range(ITERS)
        ]
        np.asarray(gen.generate_audio(p, batches[0], mask)[0])  # compile
        t0 = time.perf_counter()
        outs = [gen.generate_audio(p, b, mask)[0] for b in batches]
        for o in outs:
            np.asarray(o)
        dt = (time.perf_counter() - t0) / ITERS
        sweep[str(n)] = {
            "utt_per_sec_per_chip": round(B / dt / n, 2),
            "utt_per_sec_total": round(B / dt, 2),
        }
        n *= 2
    return sweep


def _devices_or_die(timeout_s: int = 240) -> str:
    """Backend init with a watchdog instead of a probe subprocess.

    When the remote-TPU tunnel is down, jax.devices() blocks FOREVER (no
    exception) — a hang is worse than a failure for the driver. The earlier
    fix probed in a throwaway child first, but that paid the full 10-40 s
    plugin init TWICE on every healthy run (review finding). Instead: init
    in-process and let a watchdog thread emit the parseable error JSON and
    hard-exit if init hasn't answered within the timeout — zero added
    latency when the tunnel is up, bounded failure when it isn't."""
    import os
    import sys
    import threading

    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            print(json.dumps({
                "metric": "decode_utterances_per_sec_per_chip",
                "value": 0.0,
                "unit": "utt/s",
                "vs_baseline": 0.0,
                "extras": {"error": (
                    f"device backend unreachable (init exceeded "
                    f"{timeout_s}s — TPU tunnel down?)")},
            }), flush=True)
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()
    import jax

    d = jax.devices()
    done.set()
    return f"{d[0].platform} {len(d)}"


def main():
    import sys

    # stderr: stdout must stay exactly ONE JSON line for the driver
    print(f"# devices: {_devices_or_die()}", file=sys.stderr, flush=True)
    results = {}
    for batch in BATCHES:
        dt, t_enc, block_dts = run_batch(batch)
        results[batch] = {
            "utt_per_sec": batch / dt,
            "secs_per_batch": round(dt, 3),
            "encode_ms": round(t_enc * 1e3, 1),
            "decode_ms": round((dt - t_enc) * 1e3, 1),
            "utt_per_sec_spread": [round(batch / max(block_dts), 2),
                                   round(batch / min(block_dts), 2)],
        }
    best_b = max(results, key=lambda b: results[b]["utt_per_sec"])
    utt_per_sec = results[best_b]["utt_per_sec"]
    rtfx = utt_per_sec * AUDIO_SECONDS

    # mixed-length mode (real bucketing path) — additive, never fatal, and
    # budget-bounded: each bucket is a fresh compile shape, expensive cold
    mixed = None
    if os.environ.get("CHIMERA_BENCH_MIXED", "1") != "0":
        try:
            mixed = run_mixed_lengths(
                budget_s=float(os.environ.get("CHIMERA_BENCH_MIXED_BUDGET_S",
                                              "1500")),
            )
        except Exception as e:
            mixed = {"error": f"{type(e).__name__}: {e}"[:200]}

    # data-parallel scaling sweep — no-op on today's single-chip box, kicks
    # in automatically on the first multi-chip environment
    multichip = None
    try:
        multichip = run_multichip_scaling(batch=best_b)
    except Exception as e:
        multichip = {"error": f"{type(e).__name__}: {e}"[:200]}
    print(
        json.dumps(
            {
                "metric": "decode_utterances_per_sec_per_chip",
                "value": round(utt_per_sec, 2),
                "unit": "utt/s",
                "vs_baseline": round(utt_per_sec / REF_A100_UTT_PER_SEC, 2),
                # co-headline: the north-star protocol (tst-COMMON) is
                # mixed-length; this is the same metric on the realistic
                # duration distribution instead of uniform 6 s
                "mixed_utt_per_sec": (
                    mixed.get("utt_per_sec") if isinstance(mixed, dict)
                    else None),
                "mixed_vs_baseline": (
                    round(mixed["utt_per_sec"] / REF_A100_UTT_PER_SEC, 2)
                    if isinstance(mixed, dict) and "utt_per_sec" in mixed
                    else None),
                "extras": {
                    "rtfx": round(rtfx, 1),
                    "best_batch": best_b,
                    "beam": BEAM,
                    "audio_seconds": AUDIO_SECONDS,
                    "max_decode_len": MAX_DECODE_LEN,
                    "sweep": {str(b): r for b, r in results.items()},
                    "mixed_length": mixed,
                    "multichip_scaling": multichip,
                },
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # always emit a parseable line for the driver
        print(
            json.dumps(
                {
                    "metric": "decode_utterances_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "utt/s",
                    "vs_baseline": 0.0,
                    "extras": {"error": f"{type(e).__name__}: {e}"[:300]},
                }
            )
        )
        raise SystemExit(1)
