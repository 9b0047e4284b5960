"""Synthetic tiny-corpus builders for end-to-end tests (the reference's
dummy-task pattern, fairseq/benchmark/dummy_*.py)."""

from pathlib import Path

import numpy as np

from chimera_st_tpu.data.audio import write_wav

SRC_WORDS = ["der", "die", "das", "hund", "katze", "haus", "baum", "auto"]
TGT_WORDS = ["the", "dog", "cat", "house", "tree", "car", "a", "runs"]

TINY_ARCH_FLAGS = [
    "--encoder-embed-dim", "16", "--encoder-ffn-dim", "32",
    "--encoder-layers", "1", "--encoder-heads", "2",
    "--decoder-embed-dim", "16", "--decoder-ffn-dim", "32",
    "--decoder-layers", "1", "--decoder-heads", "2",
    "--interlingua-length", "4", "--interlingua-layers", "1",
    "--conv-channels", "8",
    "--w2v2-embed-dim", "16", "--w2v2-ffn-dim", "32",
    "--w2v2-layers", "1", "--w2v2-heads", "2",
    "--w2v2-conv-spec", "((8,10,5),(12,3,2))",
    "--w2v2-conv-pos", "8", "--w2v2-conv-pos-groups", "4",
]


def make_triplet_dir(root: str, n: int = 8, seed: int = 0) -> str:
    root = Path(root)
    (root / "wavs").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    vocab = set()
    rows = []
    for i in range(n):
        ns = int(rng.integers(400, 900))
        write_wav(str(root / "wavs" / f"u{i}.wav"),
                  (rng.normal(size=ns) * 0.1).astype(np.float32))
        src = " ".join(rng.choice(SRC_WORDS, size=rng.integers(2, 5)))
        tgt = " ".join(rng.choice(TGT_WORDS, size=rng.integers(2, 5)))
        vocab.update(src.split())
        vocab.update(tgt.split())
        rows.append((f"u{i}", f"wavs/u{i}.wav:0:{ns}", ns, src, tgt))
    for split in ("train", "valid", "test"):
        with open(root / f"{split}.tsv", "w") as f:
            f.write("id\taudio\tn_frames\tsrc_text\ttgt_text\n")
            for r in rows:
                f.write("\t".join(map(str, r)) + "\n")
    with open(root / "dict.txt", "w") as f:
        for w in sorted(vocab):
            f.write(f"{w} 1\n")
    with open(root / "config_wave.yaml", "w") as f:
        f.write(
            f"audio_root: {root}\nuse_audio_input: true\n"
            "vocab_filename: dict.txt\nsrc_vocab_filename: dict.txt\n"
        )
    return str(root)


def make_parallel_text(root: str, n: int = 32, seed: int = 0):
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    for split, count in [("train", n), ("valid", max(n // 4, 2))]:
        with open(root / f"{split}.de", "w") as fs, open(root / f"{split}.en", "w") as ft:
            for _ in range(count):
                fs.write(" ".join(rng.choice(SRC_WORDS, size=rng.integers(2, 6))) + "\n")
                ft.write(" ".join(rng.choice(TGT_WORDS, size=rng.integers(2, 6))) + "\n")
    return str(root)


def make_labeled_audio_dir(root: str, n: int = 4, seed: int = 7) -> str:
    """TSV+letter-label fixture for the audio_pretraining --labels fine-tune
    path (reference: examples/wav2vec manifest + .ltr files)."""
    import numpy as np
    from pathlib import Path

    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    with open(root / "dict.ltr.txt", "w") as f:
        for ch in list("abcdef") + ["|"]:
            f.write(f"{ch} 1\n")
    texts = ["a b c", "d e", "a f a", "c c d"][:n]
    for split in ("train", "valid", "test"):
        rows, lines = [], []
        for i, t in enumerate(texts):
            nsamp = int(rng.integers(600, 900))
            write_wav(str(root / f"{split}_u{i}.wav"),
                      rng.normal(size=nsamp).astype(np.float32) * 0.1)
            rows.append(f"{split}_u{i}.wav\t{nsamp}")
            # letter labels: spell words, '|' word boundary
            lines.append(" ".join("|".join(t.split())))
        with open(root / f"{split}.tsv", "w") as f:
            f.write("audio\tn_frames\n" + "\n".join(rows) + "\n")
        with open(root / f"{split}.ltr", "w") as f:
            f.write("\n".join(lines) + "\n")
    return str(root)
