"""Sustained train throughput through the REAL CLI loop (not the bare step).

benchmarks/train_throughput.py times the jitted step in isolation; this
harness builds a flagship-scale synthetic MuST-C-like corpus on disk (6 s
wavs, ~30-token sentences, 10k-type vocab), runs the actual `chimera-train`
entry point on the real chip (triplet task, flagship arch, the ST-recipe
configuration) for a bounded number of updates, and reports the sustained
updates/sec + wps the harness itself logs — i.e. the jitted step PLUS data
loading, length bucketing, host->device transfer, metrics, and the epoch
machinery. The gap between this number and the bare-step number is the
host-side overhead (reference equivalent: trainer.py wps/ups meters,
fairseq progress log).

Usage: python benchmarks/train_cli_sustained.py [--updates 40] [--batch 48]
           [--n-utts 256] [--keep-dir]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SAMPLE_RATE = 16000
AUDIO_SECONDS = 6.0
SENT_LEN = 30
VOCAB = 9000


def build_corpus(root: Path, n_utts: int, seed: int = 0):
    import numpy as np

    sys.path.insert(0, str(REPO))
    from chimera_st_tpu.data.audio import write_wav

    (root / "wavs").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    ns = int(AUDIO_SECONDS * SAMPLE_RATE)
    words = [f"w{i:05d}" for i in range(VOCAB)]
    rows = []
    wav = (rng.normal(size=ns) * 0.1).astype(np.float32)
    for i in range(n_utts):
        # distinct file per utterance (the loader must do real IO per item),
        # same samples (writing 256 distinct 6 s wavs adds nothing to the
        # host-path measurement and 10x's corpus build time)
        write_wav(str(root / "wavs" / f"u{i}.wav"), wav)
        src = " ".join(rng.choice(words, size=SENT_LEN))
        tgt = " ".join(rng.choice(words, size=SENT_LEN))
        rows.append((f"u{i}", f"wavs/u{i}.wav:0:{ns}", ns, src, tgt))
    for split in ("train", "valid"):
        with open(root / f"{split}.tsv", "w") as f:
            f.write("id\taudio\tn_frames\tsrc_text\ttgt_text\n")
            for r in rows:
                f.write("\t".join(map(str, r)) + "\n")
    with open(root / "dict.txt", "w") as f:
        for w in words:
            f.write(f"{w} 1\n")
    with open(root / "config_wave.yaml", "w") as f:
        f.write(
            f"audio_root: {root}\nuse_audio_input: true\n"
            "vocab_filename: dict.txt\nsrc_vocab_filename: dict.txt\n"
        )


def build_mt_corpus(root: Path, n_sents: int, seed: int = 0) -> Path:
    """Ragged WMT-like parallel corpus (lognormal lengths, the same
    distribution train_throughput --ragged measures) binarized through the
    real chimera-preprocess path; returns the data-bin dir."""
    import subprocess

    import numpy as np

    raw = root / "raw"
    raw.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    words = [f"w{i:05d}" for i in range(VOCAB)]
    lens = np.clip(
        rng.lognormal(np.log(24), 0.6, size=n_sents), 4, 128
    ).astype(int)
    for lang in ("en", "de"):
        with open(raw / f"train.{lang}", "w") as f:
            for L in lens:
                f.write(" ".join(rng.choice(words, size=L)) + "\n")
        with open(raw / f"valid.{lang}", "w") as f:
            for L in lens[:64]:
                f.write(" ".join(rng.choice(words, size=L)) + "\n")
    data_bin = root / "bin"
    r = subprocess.run(
        [sys.executable, "-m", "chimera_st_tpu.cli.preprocess",
         "-s", "en", "-t", "de",
         "--trainpref", str(raw / "train"), "--validpref", str(raw / "valid"),
         "--destdir", str(data_bin), "--joined-dictionary"],
        capture_output=True, text=True,
        env={**os.environ,
             "PYTHONPATH": str(REPO) + os.pathsep
             + os.environ.get("PYTHONPATH", "")},
        timeout=600,
    )
    if r.returncode != 0:
        raise SystemExit(f"preprocess failed:\n{r.stderr[-2000:]}")
    return data_bin


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--updates", type=int, default=40)
    p.add_argument("--log-interval", type=int, default=5,
                   help="progress cadence; the reported ups/wps are the LAST "
                        "interval's smoothed values (post-compile steady "
                        "state — train_inner meters reset every interval)")
    p.add_argument("--batch", type=int, default=48,
                   help="sentences per update (all utterances are 6 s, so "
                        "--max-tokens is derived as batch * 96000 samples)")
    p.add_argument("--n-utts", type=int, default=256)
    p.add_argument("--workload", default="st", choices=["st", "mt"],
                   help="st = triplet audio recipe; mt = translation "
                        "pre-train recipe (train-en2any-MT.sh config) on a "
                        "ragged WMT-like text corpus")
    p.add_argument("--max-tokens", type=int, default=16384,
                   help="--workload mt: padded tokens per update")
    p.add_argument("--n-sents", type=int, default=16384,
                   help="--workload mt: corpus size")
    p.add_argument("--keep-dir", action="store_true")
    args, extra = p.parse_known_args()  # extras forwarded to chimera-train
    # (e.g. tiny-arch flags + --cpu for a plumbing smoke off-chip)
    if extra and extra[0] == "--":  # argparse keeps the separator itself
        extra = extra[1:]

    work = Path(tempfile.mkdtemp(prefix="chimera_cli_bench_"))
    data = work / "corpus"

    if args.workload == "mt":
        t0 = time.perf_counter()
        data_bin = build_mt_corpus(data, args.n_sents)
        print(f"corpus: {args.n_sents} ragged sentences binarized in "
              f"{time.perf_counter()-t0:.1f}s at {data_bin}", flush=True)
        cmd = [
            sys.executable, "-m", "chimera_st_tpu.cli.train", str(data_bin),
            "--task", "translation", "-s", "en", "-t", "de",
            "--arch", "s2t_transformer_w2v2_interlingua_base",
            "--criterion", "label_smoothed_cross_entropy",
            "--label-smoothing", "0.1",
            "--optimizer", "adam", "--adam-betas", "(0.9, 0.98)",
            "--clip-norm", "0.0",
            "--lr", "5e-4", "--lr-scheduler", "inverse_sqrt",
            "--warmup-updates", "4000",
            "--max-tokens", str(args.max_tokens),
            "--max-update", str(args.updates),
            "--num-length-buckets", "4",
            "--log-format", "json", "--log-interval", str(args.log_interval),
            "--disable-validation", "--no-save",
            "--save-dir", str(work / "ckpt"),
            *extra,
        ]
        env = dict(os.environ)
        env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
        t0 = time.perf_counter()
        proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                              cwd=str(REPO), timeout=3600)
        wall = time.perf_counter() - t0
        out = proc.stdout + "\n" + proc.stderr
        if proc.returncode != 0:
            print(out[-4000:])
            raise SystemExit(f"chimera-train failed rc={proc.returncode}")
        stats = None
        for line in out.splitlines():
            m = re.search(r"\{.*\"ups\".*\}", line)
            if m:
                try:
                    stats = json.loads(m.group(0))
                except json.JSONDecodeError:
                    pass
        print(f"total wall (incl. compile + corpus build): {wall:.1f}s",
              flush=True)
        if not stats:
            print(out[-3000:])
            raise SystemExit("no json progress line with ups found")
        result = {
            "metric": "train_cli_sustained_mt_wps",
            "value": float(stats.get("wps", 0.0)),
            "unit": "target-tokens/s",
            "max_tokens": args.max_tokens,
            "updates": args.updates,
            "harness_logged": {k: stats.get(k) for k in
                               ("ups", "wps", "loss", "gnorm", "lr")
                               if k in stats},
        }
        print(json.dumps(result), flush=True)
        if not args.keep_dir:
            import shutil

            shutil.rmtree(work, ignore_errors=True)
        else:
            print(f"kept: {work}")
        return

    t0 = time.perf_counter()
    build_corpus(data, args.n_utts)
    print(f"corpus: {args.n_utts} x {AUDIO_SECONDS:.0f}s wavs in "
          f"{time.perf_counter()-t0:.1f}s at {data}", flush=True)

    save_dir = work / "ckpt"
    cmd = [
        sys.executable, "-m", "chimera_st_tpu.cli.train", str(data),
        "--task", "triplet", "--config-yaml", "config_wave.yaml",
        "--arch", "s2t_transformer_w2v2_interlingua_base",
        "--criterion", "triplet_st_mt_contrastive", "--label-smoothing", "0.1",
        "--loss-ratio", "1.0", "1.0", "1.0",
        "--optimizer", "adam", "--adam-betas", "(0.9, 0.98)",
        "--lr", "1e-4", "--lr-scheduler", "inverse_sqrt",
        "--warmup-updates", "25000",
        "--max-tokens", str(args.batch * int(AUDIO_SECONDS * SAMPLE_RATE)),
        "--max-update", str(args.updates),
        "--num-length-buckets", "1",
        "--log-format", "json", "--log-interval", str(args.log_interval),
        "--disable-validation", "--no-save",
        "--save-dir", str(save_dir),
        *extra,
    ]
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          cwd=str(REPO), timeout=3600)
    wall = time.perf_counter() - t0
    out = proc.stdout + "\n" + proc.stderr
    if proc.returncode != 0:
        print(out[-4000:])
        raise SystemExit(f"chimera-train failed rc={proc.returncode}")

    # last json progress line carries the smoothed ups/wps the harness logs
    stats = None
    for line in out.splitlines():
        m = re.search(r"\{.*\"ups\".*\}", line)
        if m:
            try:
                stats = json.loads(m.group(0))
            except json.JSONDecodeError:
                pass
    print(f"total wall (incl. compile + corpus scan): {wall:.1f}s", flush=True)
    if not stats:
        print(out[-3000:])
        raise SystemExit("no json progress line with ups found")
    result = {
        "metric": "train_cli_sustained_ups",
        "value": float(stats.get("ups", 0.0)),
        "unit": "updates/s",
        "batch_sentences": args.batch,
        "updates": args.updates,
        "harness_logged": {k: stats.get(k) for k in
                           ("ups", "wps", "loss", "gnorm", "lr") if k in stats},
        "audio_s_per_sec": round(
            float(stats.get("ups", 0.0)) * args.batch * AUDIO_SECONDS, 1),
    }
    print(json.dumps(result), flush=True)
    if not args.keep_dir:
        import shutil

        shutil.rmtree(work, ignore_errors=True)
    else:
        print(f"kept: {work}")


if __name__ == "__main__":
    main()
