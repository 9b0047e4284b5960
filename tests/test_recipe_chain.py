"""Recipe-chain integration test: runs the actual `recipes/*.sh` shell
scripts end-to-end on fixture data — the reference's 6-step workflow
(README steps 2-6: binarize -> train-en2any-MT.sh -> train-en2any-ST.sh with
warm start + background auto-generate -> average checkpoints -> final eval;
reference: chimera/scripts/train-en2any-{MT,ST}.sh:1-67,
chimera/generate/auto-generate.py:17-80,
chimera/tools/eval-average-checkpoint.py).

Each *stage* already has CLI-level coverage; THIS test proves the scripts
themselves — env-var plumbing, the MT-best -> ST-last warm-start `cp` +
--reset-optimizer, the auto-generate trap/suicide-flag lifecycle, and the
averaging window — by executing them as scripts with shimmed entry points.
"""

import os
import pickle
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tests.synthetic_data import TINY_ARCH_FLAGS, make_parallel_text, make_triplet_dir

REPO = Path(__file__).resolve().parents[1]
RECIPES = REPO / "recipes"

# console-script shims (the recipes call the installed entry points from
# pyproject [project.scripts]; tests must not require a pip install)
SHIMS = {
    "chimera-train": "chimera_st_tpu.cli.train",
    "chimera-generate": "chimera_st_tpu.cli.generate",
    "chimera-preprocess": "chimera_st_tpu.cli.preprocess",
    "chimera-auto-generate": "chimera_st_tpu.tools.auto_generate",
    "chimera-average-checkpoints": "chimera_st_tpu.tools.average_checkpoints",
}

# appended after each recipe's own flags; argparse last-wins shrinks the
# model and the run to fixture scale without editing the scripts
TINY_EXTRA = [
    *TINY_ARCH_FLAGS,
    "--dtype", "float32", "--log-interval", "1", "--num-length-buckets", "2",
    # --cpu is the only reliable way to keep the subprocesses off a real
    # accelerator: the axon TPU plugin overrides the JAX_PLATFORMS env var,
    # and only jax.config.update("jax_platforms", "cpu") (what --cpu does)
    # wins
    "--cpu",
]


@pytest.fixture(scope="module")
def shim_bin(tmp_path_factory):
    bin_dir = tmp_path_factory.mktemp("bin")
    for name, mod in SHIMS.items():
        sh = bin_dir / name
        sh.write_text(f'#!/usr/bin/env bash\nexec {sys.executable} -m {mod} "$@"\n')
        sh.chmod(0o755)
    return str(bin_dir)


def _env(shim_bin, **extra):
    env = dict(os.environ)
    env["PATH"] = shim_bin + os.pathsep + env["PATH"]
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    # belt (the real guard is --cpu in TINY_EXTRA/AUTOGEN_EXTRA — env vars
    # alone are overridden by the axon plugin) and braces
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # no 8-device mesh in the subprocesses
    env.update({k: str(v) for k, v in extra.items()})
    return env


def _run(cmd, env, timeout=900):
    proc = subprocess.run(
        cmd, env=env, cwd=str(REPO), capture_output=True, text=True,
        timeout=timeout,
    )
    if proc.returncode != 0:
        raise AssertionError(
            f"{cmd} failed rc={proc.returncode}\n--- stdout:\n{proc.stdout[-4000:]}"
            f"\n--- stderr:\n{proc.stderr[-6000:]}"
        )
    return proc


def _load(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def test_recipe_chain(tmp_path, shim_bin):
    import torch

    work = tmp_path
    triplet = make_triplet_dir(str(work / "mustc"))
    raw = make_parallel_text(str(work / "wmt_raw"))

    # ---- stage 1: binarize the parallel text against the JOINT dictionary
    # (the reference binarizes WMT with the SPM vocab shared with MuST-C so
    # the MT checkpoint's embeddings line up with the ST stage)
    bin_dir = work / "bin"
    _run(
        ["chimera-preprocess", "-s", "en", "-t", "de",
         "--trainpref", f"{raw}/train", "--validpref", f"{raw}/valid",
         "--destdir", str(bin_dir),
         "--srcdict", f"{triplet}/dict.txt", "--tgtdict", f"{triplet}/dict.txt"],
        _env(shim_bin),
    )
    assert (bin_dir / "train.en-de.en.bin").is_file()

    # ---- stage 2: MT pre-training via the actual script
    mt_dir = work / "mt"
    _run(
        ["bash", str(RECIPES / "train-en2any-MT.sh"),
         *TINY_EXTRA, "--batch-size", "8", "--warmup-updates", "2"],
        _env(shim_bin, DATA_BIN=bin_dir, SAVE_DIR=mt_dir, TGT="de",
             INTERLINGUA_LENGTH=4, MAX_UPDATE=2, UPDATE_FREQ=1),
    )
    mt_best = mt_dir / "checkpoint_best.ckpt"
    assert mt_best.is_file()
    assert _load(mt_best)["step"] == 2

    # ---- stage 3: ST fine-tune script — warm start + background auto-eval.
    # A tiny torch wav2vec2 .pt stands in for wav2vec_small.pt (the recipe's
    # --w2v2-model-path import path, reference w2v2_transformer.py:255-267).
    from argparse import Namespace

    from tests.torch_reference import TorchW2V2

    torch.manual_seed(0)
    tw = TorchW2V2(((8, 10, 5), (12, 3, 2)), 16, 32, 1, 2, 8, 4)
    w2v2_pt = work / "wav2vec_tiny.pt"
    torch.save(
        {"args": Namespace(encoder_embed_dim=16), "model": tw.state_dict()},
        str(w2v2_pt),
    )

    st_dir = work / "st"
    proc = _run(
        ["bash", "-x", str(RECIPES / "train-en2any-ST.sh"),
         *TINY_EXTRA, "--batch-size", "4", "--warmup-updates", "2"],
        _env(
            shim_bin, DATA_DIR=triplet, SAVE_DIR=st_dir, MT_CKPT=mt_best,
            W2V2=w2v2_pt, MAX_UPDATE=4, UPDATE_FREQ=1, GEN_SUBSET="valid",
            AUTOGEN_EXTRA=("--poll-interval 1 --batch-size 4 --beam 2 "
                           "--max-decode-len 8 --dtype float32 "
                           "--num-length-buckets 2 --cpu"),
        ),
        timeout=1800,
    )
    # bash -x traces go to stderr; the train CLI and auto-generate log lines
    # go to stdout — assert over the union
    trace = proc.stderr + "\n" + proc.stdout
    # the warm-start copy ran (bash -x shows it), and training restored it
    # with a fresh optimizer (reference: reset_optimizer="--reset-optimizer")
    assert f"cp {mt_best}" in trace.replace("'", "")
    assert "--reset-optimizer" in trace
    assert "restored" in trace and "checkpoint_last.ckpt" in trace
    # fresh-optimizer semantics: step restarts at 0, so the final step count
    # is MAX_UPDATE, not MT's 2 + 4
    assert _load(st_dir / "checkpoint_last.ckpt")["step"] == 4
    # ... and the restored params really came from the MT stage: the ST log
    # reports the restore BEFORE any update, of a model whose arch matches
    assert _load(st_dir / "checkpoint_last.ckpt")["extra"]["model_cfg"][
        "arch"] == _load(mt_best)["extra"]["model_cfg"]["arch"]

    # epoch checkpoints for the averaging window (2 updates/epoch at B=4,
    # n=8 -> epochs end at steps 2 and 4)
    epoch_ckpts = sorted(st_dir.glob("checkpoint[0-9]*.ckpt"))
    assert len(epoch_ckpts) >= 2, [p.name for p in st_dir.iterdir()]

    # the auto-evaluator produced per-checkpoint BLEU reports and died via
    # the suicide flag raised by the script's EXIT trap
    auto_eval = st_dir / "auto_eval"
    reports = sorted(auto_eval.glob("checkpoint*.valid.txt"))
    assert reports, list(auto_eval.iterdir()) if auto_eval.is_dir() else "no auto_eval dir"
    assert any("Generate valid with beam=2" in r.read_text() for r in reports)
    assert "suicide flag" in trace and (st_dir / "auto_gen_stop").is_file()

    # ---- stage 4: checkpoint averaging (reference eval-average-checkpoint)
    avg = work / "avg.ckpt"
    _run(
        ["chimera-average-checkpoints",
         "--inputs", *[str(p) for p in epoch_ckpts[-2:]],
         "--output", str(avg)],
        _env(shim_bin),
    )
    pay = _load(avg)
    a, b = _load(epoch_ckpts[-2]), _load(epoch_ckpts[-1])

    def _flat(t):
        if isinstance(t, dict):
            for k in sorted(t):
                yield from _flat(t[k])
        else:
            yield np.asarray(t)

    la, lb, lavg = (list(_flat(p["params"])) for p in (a, b, pay))
    assert len(la) == len(lavg)
    for xa, xb, xm in zip(la, lb, lavg):
        np.testing.assert_allclose(xm, (xa + xb) / 2, atol=1e-5)

    # ---- stage 5: the final-eval script on the averaged checkpoint
    out = work / "pt_eval"
    proc = _run(
        ["bash", str(RECIPES / "eval-mustc-final.sh"),
         "--batch-size", "4", "--dtype", "float32",
         "--max-decode-len", "8", "--num-length-buckets", "2", "--cpu"],
        _env(shim_bin, CKPT=avg, DATA_DIR=triplet, OUT=out, GEN_SUBSET="test"),
    )
    assert "Generate test with beam=10" in proc.stdout
    assert list(out.glob("generate-test.txt"))
