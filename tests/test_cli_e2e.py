"""End-to-end CLI smoke tests on tiny synthetic data (the reference's
test_binaries.py pattern): train -> resume -> generate -> validate, and
preprocess -> MT train."""

import os
from pathlib import Path

import numpy as np
import pytest

from tests.synthetic_data import TINY_ARCH_FLAGS, make_parallel_text, make_triplet_dir


@pytest.fixture(scope="module")
def triplet_dir(tmp_path_factory):
    return make_triplet_dir(str(tmp_path_factory.mktemp("triplet")))


def _train_args(data_dir, save_dir, extra=None):
    return [
        data_dir, "--task", "triplet",
        "--arch", "s2t_transformer_w2v2_interlingua_base",
        *TINY_ARCH_FLAGS,
        "--criterion", "triplet_st_mt_contrastive",
        "--label-smoothing", "0.1",
        "--optimizer", "adam", "--lr", "1e-3",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "2",
        "--batch-size", "4", "--update-freq", "2",
        "--save-dir", save_dir, "--log-interval", "1",
        "--dtype", "float32", "--num-length-buckets", "2",
        "--best-checkpoint-metric", "st_loss",
        *(extra or []),
    ]


def test_train_generate_validate_roundtrip(triplet_dir, tmp_path):
    from chimera_st_tpu.cli import generate, train, validate

    save_dir = str(tmp_path / "ckpt")
    train.main(_train_args(triplet_dir, save_dir, ["--max-update", "3"]))
    assert (Path(save_dir) / "checkpoint_last.ckpt").is_file()
    assert (Path(save_dir) / "checkpoint_best.ckpt").is_file()

    # resume: 2 more updates from checkpoint_last
    train.main(_train_args(triplet_dir, save_dir, ["--max-update", "5"]))

    import pickle

    with open(Path(save_dir) / "checkpoint_last.ckpt", "rb") as f:
        payload = pickle.load(f)
    assert payload["step"] == 5
    assert payload["extra"]["model_cfg"]["arch"] == "s2t_transformer_w2v2_interlingua_base"

    # generate from the native checkpoint
    out_dir = str(tmp_path / "gen")
    os.makedirs(out_dir, exist_ok=True)
    generate.main([
        triplet_dir, "--task", "triplet",
        "--path", str(Path(save_dir) / "checkpoint_best.ckpt"),
        "--gen-subset", "test", "--beam", "2", "--max-decode-len", "8",
        "--batch-size", "4", "--dtype", "float32",
        "--results-path", out_dir, "--num-length-buckets", "2",
    ])
    text = (Path(out_dir) / "generate-test.txt").read_text()
    assert "H-" in text and "Generate test with beam=2" in text

    # validate CLI on the checkpoint
    validate.main([
        triplet_dir, "--task", "triplet",
        "--path", str(Path(save_dir) / "checkpoint_best.ckpt"),
        "--criterion", "triplet_st_mt_contrastive",
        "--valid-subset", "valid", "--batch-size", "4",
        "--dtype", "float32", "--num-length-buckets", "2",
    ])


def test_preprocess_and_mt_train(tmp_path):
    from chimera_st_tpu.cli import preprocess, train

    raw = make_parallel_text(str(tmp_path / "raw"))
    bin_dir = str(tmp_path / "bin")
    preprocess.main([
        "-s", "de", "-t", "en",
        "--trainpref", f"{raw}/train", "--validpref", f"{raw}/valid",
        "--destdir", bin_dir, "--joined-dictionary",
    ])
    assert (Path(bin_dir) / "train.de-en.de.bin").is_file()
    assert (Path(bin_dir) / "dict.de.txt").is_file()

    # fairseq-format readback
    from chimera_st_tpu.data.indexed_dataset import MMapIndexedDataset

    ds = MMapIndexedDataset(str(Path(bin_dir) / "train.de-en.de"))
    assert len(ds) == 32
    assert ds[0][-1] == 2  # eos

    save_dir = str(tmp_path / "mt_ckpt")
    train.main([
        bin_dir, "--task", "translation", "-s", "de", "-t", "en",
        "--arch", "s2t_transformer_w2v2_interlingua_base",
        *TINY_ARCH_FLAGS,
        "--criterion", "label_smoothed_cross_entropy",
        "--label-smoothing", "0.1",
        "--optimizer", "adam", "--lr", "1e-3", "--lr-scheduler", "inverse_sqrt",
        "--warmup-updates", "2", "--batch-size", "8",
        "--save-dir", save_dir, "--max-update", "2",
        "--dtype", "float32", "--log-interval", "1",
        "--num-length-buckets", "2",
    ])
    assert (Path(save_dir) / "checkpoint_last.ckpt").is_file()


def test_preprocess_only_source_and_srcdict_semantics(tmp_path):
    """--only-source emits the LM layout (dict.txt + {split}.bin/idx) the
    language_modeling task reads, and --srcdict WITHOUT --tgtdict builds the
    target dictionary from train data instead of silently joining
    (reference: fairseq_cli/preprocess.py dictionary branches)."""
    from chimera_st_tpu.cli import preprocess
    from chimera_st_tpu.data.dictionary import Dictionary
    from chimera_st_tpu.data.indexed_dataset import MMapIndexedDataset

    raw = make_parallel_text(str(tmp_path / "raw"))

    # LM path: no language pair in filenames
    lm_dir = tmp_path / "lm_bin"
    preprocess.main([
        "--only-source",
        "--trainpref", f"{raw}/train.en", "--validpref", f"{raw}/valid.en",
        "--destdir", str(lm_dir),
    ])
    assert (lm_dir / "dict.txt").is_file()
    assert (lm_dir / "train.bin").is_file() and (lm_dir / "valid.idx").is_file()
    assert not list(lm_dir.glob("dict.*.*.txt"))
    ds = MMapIndexedDataset(str(lm_dir / "train"))
    assert len(ds) == 32 and ds[0][-1] == 2  # eos-terminated

    from chimera_st_tpu.tasks import setup_task

    task = setup_task({"_name": "language_modeling", "data": str(lm_dir),
                       "tokens_per_sample": 16})
    task.load_dataset("train")
    assert len(task.dataset("train")) > 0

    # --srcdict alone: target dict is built from train data, not joined
    pair_dir = tmp_path / "pair_bin"
    preprocess.main([
        "-s", "en", "-t", "de",
        "--trainpref", f"{raw}/train",
        "--destdir", str(pair_dir), "--srcdict", str(lm_dir / "dict.txt"),
    ])
    src_d = Dictionary.load(str(pair_dir / "dict.en.txt"))
    tgt_d = Dictionary.load(str(pair_dir / "dict.de.txt"))
    # srcdict holds the English LM vocab; the target dict must be freshly
    # built from the German train side (the old behavior reused src_dict)
    assert [src_d[i] for i in range(len(src_d))] != [tgt_d[i] for i in range(len(tgt_d))]

    # --only-source --joined-dictionary: both "langs" resolve to the same
    # training file; counts must not be doubled (reference preprocess.py:92
    # dedupes via a set). A word appearing exactly twice must fail a
    # threshold of 3 — the double-count bug let it through as 4.
    onceword_dir = tmp_path / "thresh_raw"
    onceword_dir.mkdir()
    (onceword_dir / "train.txt").write_text(
        "common common common common rare rare\n")
    joined_dir = tmp_path / "joined_only_src"
    preprocess.main([
        "--only-source", "--joined-dictionary", "--thresholdsrc", "3",
        "--trainpref", str(onceword_dir / "train.txt"),
        "--destdir", str(joined_dir),
    ])
    joined_d = Dictionary.load(str(joined_dir / "dict.txt"))
    syms = [joined_d[i] for i in range(len(joined_d))]
    assert "common" in syms
    assert "rare" not in syms


def test_score_cli(tmp_path, capsys):
    from chimera_st_tpu.cli import score

    sys_f = tmp_path / "sys.txt"
    ref_f = tmp_path / "ref.txt"
    sys_f.write_text("the cat sat on the mat\nhello world\n")
    ref_f.write_text("the cat sat on the mat\nhello there world\n")
    score.main(["-s", str(sys_f), "-r", str(ref_f), "--scoring", "sacrebleu"])
    out = capsys.readouterr().out
    assert "BLEU" in out


def test_generate_print_alignment(triplet_dir, tmp_path):
    """--print-alignment emits A- lines with src-tgt pairs (reference:
    SequenceGeneratorWithAlignment, fairseq_cli/generate.py A- output)."""
    import re

    from chimera_st_tpu.cli import generate, train

    save_dir = str(tmp_path / "ckpt")
    train.main(_train_args(triplet_dir, save_dir, ["--max-update", "2"]))
    out_dir = tmp_path / "gen"
    out_dir.mkdir()
    generate.main([
        triplet_dir, "--task", "triplet",
        "--path", str(Path(save_dir) / "checkpoint_last.ckpt"),
        "--gen-subset", "test", "--beam", "2", "--max-decode-len", "8",
        "--batch-size", "4", "--dtype", "float32",
        "--results-path", str(out_dir), "--num-length-buckets", "2",
        "--print-alignment",
    ])
    text = (out_dir / "generate-test.txt").read_text()
    a_lines = [l for l in text.splitlines() if l.startswith("A-")]
    assert a_lines, "no A- lines emitted"
    assert re.match(r"A-\d+\t(\d+-\d+ ?)*$", a_lines[0]), a_lines[0]


def test_validate_dump_features(triplet_dir, tmp_path):
    """--dump-feature-to-file writes memory banks (reference: triplet.py
    valid_step --dump-feature-to-file)."""
    import pickle

    from chimera_st_tpu.cli import train, validate

    save_dir = str(tmp_path / "ckpt")
    train.main(_train_args(triplet_dir, save_dir, ["--max-update", "1"]))
    dump = tmp_path / "mem.pkl"
    validate.main([
        triplet_dir, "--task", "triplet",
        "--path", str(Path(save_dir) / "checkpoint_last.ckpt"),
        "--criterion", "triplet_st_mt_contrastive",
        "--valid-subset", "valid", "--batch-size", "4",
        "--dtype", "float32", "--num-length-buckets", "2",
        "--dump-feature-to-file", str(dump),
    ])
    with open(dump, "rb") as f:
        batches = pickle.load(f)
    assert batches and "audio_memory" in batches[0]
    assert batches[0]["audio_memory"].ndim == 3  # [B, M, C]
    assert "text_memory" in batches[0]


def test_train_freeze_controls_cli(triplet_dir, tmp_path):
    """--fix-* / --feature-grad-mult / --reset-encoder through the real CLI
    (reference: w2v2_transformer_interlingua.py:106-124)."""
    import pickle

    import numpy as np

    from chimera_st_tpu.cli import train

    save_dir = str(tmp_path / "ckpt_fix")
    train.main(_train_args(triplet_dir, save_dir, [
        "--max-update", "2",
        "--fix-wav2vec", "--fix-decoder-transformers",
        "--feature-grad-mult", "0.1",
    ]))
    with open(Path(save_dir) / "checkpoint_last.ckpt", "rb") as f:
        p1 = pickle.load(f)

    # second leg resumes and trains 1 more update with the same freezes
    train.main(_train_args(triplet_dir, save_dir, [
        "--max-update", "3",
        "--fix-wav2vec", "--fix-decoder-transformers",
        "--feature-grad-mult", "0.1",
    ]))
    with open(Path(save_dir) / "checkpoint_last.ckpt", "rb") as f:
        p2 = pickle.load(f)
    assert p2["step"] == 3
    w1 = p1["params"]["params"]["wav2vec_model"]
    w2 = p2["params"]["params"]["wav2vec_model"]
    flat1 = [x for x in _tree_leaves(w1)]
    flat2 = [x for x in _tree_leaves(w2)]
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(a, b)

    # --reset-encoder on restore: encoder transformer stack re-initialized
    # (differs from the checkpoint), everything else restored
    save_dir2 = str(tmp_path / "ckpt_reset")
    import shutil

    shutil.copytree(save_dir, save_dir2)
    train.main(_train_args(triplet_dir, save_dir2, [
        "--max-update", "3", "--reset-encoder",
    ]))  # already at 3 updates: restores (with reset) and stops immediately


def _tree_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _tree_leaves(v)
    else:
        yield tree


def test_train_pipeline_parallel_lm(tmp_path):
    """--pipeline-stages on transformer_lm: 2 updates of GPipe training on a
    (2 data x 4 pipe) mesh of the 8 virtual CPU devices (reference surface:
    --pipeline-balance/--pipeline-chunks via fairscale Pipe)."""
    from chimera_st_tpu.cli import train

    save_dir = str(tmp_path / "pp_ckpt")
    train.main([
        "dummy", "--task", "dummy_lm",
        "--dict-size", "32", "--tokens-per-sample", "12",
        "--dataset-size", "32",
        "--arch", "transformer_lm",
        "--embed-dim", "16", "--ffn-dim", "32", "--layers", "4",
        "--heads", "2", "--dropout", "0.0",
        "--attention-dropout", "0.0", "--activation-dropout", "0.0",
        "--pipeline-stages", "4", "--pipeline-chunks", "4",
        "--criterion", "cross_entropy",
        "--optimizer", "adam", "--lr", "1e-3",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "2",
        "--batch-size", "8", "--max-update", "2",
        "--save-dir", save_dir, "--dtype", "float32",
        "--disable-validation", "--num-length-buckets", "1",
    ])
    assert (Path(save_dir) / "checkpoint_last.ckpt").is_file()


def test_train_capacity_pipeline_lm(tmp_path):
    """--arch transformer_lm_pipe: stacked-param (capacity) pipeline LM
    trains through the CLI; params + moments shard over the pipe axis."""
    from chimera_st_tpu.cli import train

    save_dir = str(tmp_path / "ppc_ckpt")
    train.main([
        "dummy", "--task", "dummy_lm",
        "--dict-size", "32", "--tokens-per-sample", "12",
        "--dataset-size", "32",
        "--arch", "transformer_lm_pipe",
        "--embed-dim", "16", "--ffn-dim", "32", "--layers", "4",
        "--heads", "2",
        "--pipeline-stages", "4", "--pipeline-chunks", "4",
        "--criterion", "cross_entropy",
        "--optimizer", "adam", "--lr", "1e-3",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "2",
        "--batch-size", "8", "--max-update", "2",
        "--save-dir", save_dir, "--dtype", "float32",
        "--disable-validation", "--num-length-buckets", "1",
    ])
    assert (Path(save_dir) / "checkpoint_last.ckpt").is_file()


def test_train_audio_pretraining_kmeans(tmp_path):
    """--task audio_pretraining with the straight-through kmeans VQ
    (reference: tasks/audio_pretraining.py + modules/kmeans_vector_quantizer.py):
    the wav2vec criterion's kmeans latent+commitment term is live and the
    run checkpoints."""
    import jax.numpy as jnp

    from chimera_st_tpu.cli import train
    from chimera_st_tpu.data.audio import write_wav

    rng = np.random.default_rng(11)
    data = tmp_path / "raw"
    data.mkdir()
    rows = ["audio\tn_frames"]
    for i in range(6):
        n = int(rng.integers(1500, 2500))
        write_wav(str(data / f"u{i}.wav"), (rng.normal(size=n) * 0.1).astype(np.float32))
        rows.append(f"u{i}.wav\t{n}")
    for split in ("train", "valid"):
        (data / f"{split}.tsv").write_text("\n".join(rows) + "\n")

    save_dir = str(tmp_path / "w2vk_ckpt")
    train.main([
        str(data), "--task", "audio_pretraining",
        "--arch", "wav2vec2_pretrain", "--criterion", "wav2vec",
        "--quantizer-type", "kmeans",
        "--encoder-embed-dim", "16", "--encoder-ffn-dim", "32",
        "--encoder-layers", "1", "--encoder-heads", "2",
        "--conv-spec", "((8,10,5),(12,3,2))",
        "--final-dim", "8", "--latent-vars", "16", "--latent-groups", "2",
        "--num-negatives", "4", "--conv-pos", "8", "--conv-pos-groups", "4",
        "--min-sample-size", "500", "--max-sample-size", "2500",
        "--optimizer", "adam", "--lr", "5e-4",
        "--lr-scheduler", "inverse_sqrt", "--warmup-updates", "2",
        "--max-sentences", "3", "--max-update", "2",
        "--save-dir", save_dir, "--dtype", "float32",
        "--log-interval", "1", "--no-progress-bar",
    ])
    assert (Path(save_dir) / "checkpoint_last.ckpt").is_file()

    import pickle

    with open(Path(save_dir) / "checkpoint_last.ckpt", "rb") as f:
        payload = pickle.load(f)
    # the kmeans codebook is a trained parameter in the checkpoint
    emb = payload["params"]["params"]["quantizer"]["embedding"]
    assert jnp.asarray(emb).shape == (16, 2, 6)


def test_generate_score_reference_and_replace_unk(tmp_path):
    """--score-reference emits H- lines scoring the gold target (reference
    fairseq_cli/generate.py:135-141 + sequence_scorer.py); --replace-unk
    rewrites hypothesis <unk> tokens via the cross-attention argmax with an
    optional src->tgt lexicon (utils.replace_unk)."""
    from chimera_st_tpu.cli import generate, preprocess, train

    raw = make_parallel_text(str(tmp_path / "raw"))
    bin_dir = str(tmp_path / "bin")
    preprocess.main([
        "-s", "de", "-t", "en",
        "--trainpref", f"{raw}/train", "--validpref", f"{raw}/valid",
        "--destdir", bin_dir, "--joined-dictionary",
    ])
    save_dir = str(tmp_path / "mt_ckpt")
    train.main([
        bin_dir, "--task", "translation", "-s", "de", "-t", "en",
        "--arch", "s2t_transformer_w2v2_interlingua_base",
        *TINY_ARCH_FLAGS,
        "--criterion", "label_smoothed_cross_entropy",
        "--optimizer", "adam", "--lr", "1e-3", "--lr-scheduler", "fixed",
        "--batch-size", "8", "--save-dir", save_dir, "--max-update", "2",
        "--dtype", "float32", "--num-length-buckets", "2",
    ])

    out_dir = tmp_path / "scoreref"
    out_dir.mkdir()
    generate.main([
        bin_dir, "--task", "translation", "-s", "de", "-t", "en",
        "--path", str(Path(save_dir) / "checkpoint_last.ckpt"),
        "--gen-subset", "valid", "--batch-size", "8", "--dtype", "float32",
        "--results-path", str(out_dir), "--num-length-buckets", "2",
        "--score-reference",
    ])
    text = (out_dir / "generate-valid.txt").read_text()
    h = [l for l in text.splitlines() if l.startswith("H-")]
    t = [l for l in text.splitlines() if l.startswith("T-")]
    p = [l for l in text.splitlines() if l.startswith("P-")]
    assert h and len(h) == len(t) == len(p)
    # H carries the reference words themselves plus a finite score
    sid, score, hyp = h[0].split("\t")
    assert float(score) <= 0.0
    assert hyp == t[0].split("\t")[1]

    out_dir2 = tmp_path / "repunk"
    out_dir2.mkdir()
    generate.main([
        bin_dir, "--task", "translation", "-s", "de", "-t", "en",
        "--path", str(Path(save_dir) / "checkpoint_last.ckpt"),
        "--gen-subset", "valid", "--batch-size", "8", "--dtype", "float32",
        "--beam", "2", "--max-decode-len", "8",
        "--results-path", str(out_dir2), "--num-length-buckets", "2",
        "--replace-unk",
    ])
    text2 = (out_dir2 / "generate-valid.txt").read_text()
    h2 = [l for l in text2.splitlines() if l.startswith("H-")]
    assert h2  # path exercised end to end (unks, if any, were replaced)
    assert all("<unk>" not in l for l in h2)


def test_ctc_finetune_wer_and_generate(tmp_path):
    """audio_pretraining --labels: CTC fine-tune with WER checkpoint
    selection, then the CTC recognition loop in chimera-generate (greedy and
    prefix-beam) — reference wav2vec2_asr.py + examples/speech_recognition."""
    from chimera_st_tpu.cli import generate, train
    from tests.synthetic_data import make_labeled_audio_dir

    data = make_labeled_audio_dir(str(tmp_path / "audio"))
    save_dir = str(tmp_path / "ckpt")
    train.main([
        data, "--task", "audio_pretraining", "--labels", "ltr",
        "--arch", "wav2vec_ctc", "--apply-mask", "--criterion", "ctc",
        "--optimizer", "adam", "--lr", "1e-3", "--lr-scheduler", "fixed",
        "--max-update", "2", "--batch-size", "2", "--save-dir", save_dir,
        "--best-checkpoint-metric", "wer",
        "--min-sample-size", "100", "--max-sample-size", "2000",
        "--w2v2-conv-spec", "((16,3,2),(16,3,2))",
        "--w2v2-embed-dim", "32", "--w2v2-ffn-dim", "64",
        "--w2v2-layers", "1", "--w2v2-heads", "2",
        "--w2v2-conv-pos", "8", "--w2v2-conv-pos-groups", "4",
        "--dtype", "float32",
    ])
    assert (Path(save_dir) / "checkpoint_best.ckpt").is_file()

    out_dir = tmp_path / "gen"
    out_dir.mkdir()
    for beam in ("1", "3"):
        generate.main([
            data, "--task", "audio_pretraining", "--labels", "ltr",
            "--path", str(Path(save_dir) / "checkpoint_best.ckpt"),
            "--gen-subset", "test", "--beam", beam, "--batch-size", "2",
            "--min-sample-size", "100", "--max-sample-size", "2000",
            "--results-path", str(out_dir), "--dtype", "float32",
        ])
        text = (out_dir / "generate-test.txt").read_text()
        assert [l for l in text.splitlines() if l.startswith("H-")]
        assert "WER" in text


def test_joint_training_cli_with_config_files(triplet_dir, tmp_path):
    """chimera-train --task joint_task_mtst --task-configs st.yaml mt.yaml:
    the reference §3.4 call stack through the real CLI — file-based per-task
    configs, ratio-interleaved task-tagged batches, per-task compiled steps,
    main-task validation."""
    from chimera_st_tpu.cli import preprocess, train

    raw = make_parallel_text(str(tmp_path / "raw"))
    bin_dir = str(tmp_path / "bin")
    preprocess.main([
        "-s", "de", "-t", "en",
        "--trainpref", f"{raw}/train", "--validpref", f"{raw}/valid",
        "--destdir", bin_dir,
        # joint_task_mtst shares the decoder, so the MT sub-task must use
        # the SAME (joint) vocabulary as the triplet task — pass the dict
        # for both sides (--srcdict alone builds the target dict from data
        # like the reference, which would diverge from the triplet dict)
        "--srcdict", f"{triplet_dir}/dict.txt",
        "--tgtdict", f"{triplet_dir}/dict.txt",
    ])
    st_yaml = tmp_path / "task_st.yaml"
    st_yaml.write_text(
        "task_name: st\nsample_ratio: 1.0\nweight: 1.0\n"
        f"task: {{_name: triplet, data: {triplet_dir}}}\n"
        "criterion: {_name: triplet_st_mt_contrastive, label_smoothing: 0.1}\n"
    )
    mt_json = tmp_path / "task_mt.json"
    mt_json.write_text(
        '{"task_name": "mt", "sample_ratio": 0.5, "weight": 0.5, '
        f'"task": {{"_name": "translation", "data": "{bin_dir}", '
        '"source_lang": "de", "target_lang": "en"}, '
        '"criterion": {"_name": "label_smoothed_cross_entropy", '
        '"label_smoothing": 0.1}}'
    )

    save_dir = str(tmp_path / "joint_ckpt")
    train.main([
        triplet_dir, "--task", "joint_task_mtst",
        "--task-configs", str(st_yaml), str(mt_json), "--main-task", "st",
        "--arch", "s2t_transformer_w2v2_interlingua_base", *TINY_ARCH_FLAGS,
        "--criterion", "label_smoothed_cross_entropy",
        "--optimizer", "adam", "--lr", "1e-3", "--lr-scheduler", "fixed",
        "--batch-size", "4", "--max-update", "4",
        "--save-dir", save_dir, "--dtype", "float32",
        "--num-length-buckets", "2",
    ])
    assert (Path(save_dir) / "checkpoint_last.ckpt").is_file()
    assert (Path(save_dir) / "checkpoint_best.ckpt").is_file()  # validated


def test_generate_match_source_len_and_unnormalized(tmp_path):
    """--match-source-len pins each hypothesis to its source length
    (reference sequence_generator.py match_source_len); --unnormalized ranks
    by raw log-prob sum (== lenpen 0). Also regression-covers the
    --min-len-a/b forwarding fix (the flags previously parsed but never
    reached the generator)."""
    from chimera_st_tpu.cli import generate, preprocess, train

    raw = make_parallel_text(str(tmp_path / "raw"))
    bin_dir = str(tmp_path / "bin")
    preprocess.main([
        "-s", "de", "-t", "en",
        "--trainpref", f"{raw}/train", "--validpref", f"{raw}/valid",
        "--destdir", bin_dir, "--joined-dictionary",
    ])
    save_dir = str(tmp_path / "mt_ckpt")
    train.main([
        bin_dir, "--task", "translation", "-s", "de", "-t", "en",
        "--arch", "s2t_transformer_w2v2_interlingua_base",
        *TINY_ARCH_FLAGS,
        "--criterion", "label_smoothed_cross_entropy",
        "--optimizer", "adam", "--lr", "1e-3", "--lr-scheduler", "fixed",
        "--batch-size", "8", "--save-dir", save_dir, "--max-update", "2",
        "--dtype", "float32", "--num-length-buckets", "2",
    ])

    out_dir = tmp_path / "msl"
    out_dir.mkdir()
    generate.main([
        bin_dir, "--task", "translation", "-s", "de", "-t", "en",
        "--path", str(Path(save_dir) / "checkpoint_last.ckpt"),
        "--gen-subset", "valid", "--batch-size", "8", "--dtype", "float32",
        "--beam", "2", "--max-decode-len", "24",
        "--results-path", str(out_dir), "--num-length-buckets", "2",
        "--match-source-len", "--unnormalized",
    ])
    text = (out_dir / "generate-valid.txt").read_text()
    lines = text.splitlines()
    src = {l.split("\t")[0][2:]: l.split("\t", 1)[1] for l in lines
           if l.startswith("S-")}
    hyp = {l.split("\t")[0][2:]: l.split("\t") for l in lines
           if l.startswith("H-")}
    assert hyp and len(hyp) == len(src)
    for sid, (_, _score, words) in hyp.items():
        assert len(words.split()) == len(src[sid].split()), (sid, words, src[sid])

    # --prefix-size 1: every hypothesis must START with the reference's
    # first token (review fix: the flag was parsed but never forwarded)
    pfx_dir = tmp_path / "pfx"
    pfx_dir.mkdir()
    generate.main([
        bin_dir, "--task", "translation", "-s", "de", "-t", "en",
        "--path", str(Path(save_dir) / "checkpoint_last.ckpt"),
        "--gen-subset", "valid", "--batch-size", "8", "--dtype", "float32",
        "--beam", "2", "--max-decode-len", "24", "--prefix-size", "1",
        "--results-path", str(pfx_dir), "--num-length-buckets", "2",
    ])
    lines = (pfx_dir / "generate-valid.txt").read_text().splitlines()
    refs = {l.split("\t")[0][2:]: l.split("\t", 1)[1] for l in lines
            if l.startswith("T-")}
    hyps = {l.split("\t")[0][2:]: l.split("\t")[2] for l in lines
            if l.startswith("H-")}
    assert hyps and len(hyps) == len(refs)
    for sid, words in hyps.items():
        ref_first = refs[sid].split()[0]
        assert words.split()[0] == ref_first, (sid, words, refs[sid])
