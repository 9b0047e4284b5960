"""wav2vec 2.0 ASR fine-tuning: CTC + seq2seq heads, labeled dataset, task.

reference: fairseq/models/wav2vec/wav2vec2_asr.py (Wav2VecCtc :146-184,
wav2vec_seq2seq :186-302, freeze_finetune_updates :366-369),
fairseq/data/add_target_dataset.py, fairseq/tasks/audio_pretraining.py:85-124
(the ``--labels`` fine-tune path of the same task)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_st_tpu.models.wav2vec2 import extractor_output_length
from chimera_st_tpu.models.wav2vec2_asr import (
    Wav2VecAsrConfig,
    Wav2VecCtcModel,
    Wav2VecSeq2SeqModel,
)

CONV = ((16, 3, 2), (16, 3, 2))

TINY = dict(
    vocab_size=12,
    w2v2_embed_dim=32,
    w2v2_ffn_dim=64,
    w2v2_layers=2,
    w2v2_heads=4,
    w2v2_conv_spec=CONV,
    w2v2_conv_pos=8,
    w2v2_conv_pos_groups=4,
    decoder_embed_dim=32,
    decoder_ffn_dim=64,
    decoder_layers=2,
    decoder_heads=4,
)


def _batch(B=2, T=160, with_mask=True):
    key = jax.random.PRNGKey(0)
    src = jax.random.normal(key, (B, T))
    pad = jnp.zeros((B, T), bool).at[1, 120:].set(True)
    Tp = extractor_output_length(T, CONV)
    mask = np.zeros((B, Tp), bool)
    mask[:, 3:6] = True
    batch = {
        "audio": src,
        "audio_padding_mask": pad,
        "target": jnp.asarray([[4, 5, 6, 1], [4, 5, 1, 1]], jnp.int32),
        "ntokens": 5.0,
        "nsentences": B,
    }
    if with_mask:
        batch["mask_indices"] = jnp.asarray(mask)
    return batch


@pytest.fixture(scope="module")
def ctc_setup():
    cfg = Wav2VecAsrConfig(apply_mask=True, freeze_finetune_updates=2, **TINY)
    model = Wav2VecCtcModel(cfg)
    batch = _batch()
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch["audio"],
        batch["audio_padding_mask"],
    )
    return model, params, batch


def test_ctc_head_shapes_and_loss(ctc_setup):
    from chimera_st_tpu.criterions.ctc import make_ctc_criterion

    model, params, batch = ctc_setup
    logits, out_mask = model.apply(
        params, batch["audio"], batch["audio_padding_mask"]
    )
    Tp = extractor_output_length(160, CONV)
    assert logits.shape == (2, Tp, 12) and logits.dtype == jnp.float32
    # second utterance is padded: fewer valid frames
    assert int(out_mask[1].sum()) > int(out_mask[0].sum())

    crit = make_ctc_criterion({"padding_idx": 1, "blank_idx": 0})
    loss, sample_size, logging = crit(
        model,
        params,
        batch,
        rngs={"dropout": jax.random.PRNGKey(1)},
        num_updates=jnp.asarray(0),
        train=True,
    )
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert float(sample_size) == batch["ntokens"]


def test_freeze_finetune_updates_gate(ctc_setup):
    """reference :366-369: trunk runs grad-free for the first N updates; the
    projection head still learns. One compiled step serves both phases."""
    from chimera_st_tpu.criterions.ctc import make_ctc_criterion

    model, params, batch = ctc_setup
    crit = make_ctc_criterion({"padding_idx": 1, "blank_idx": 0})

    def loss_fn(p, num_updates):
        return crit(
            model,
            p,
            batch,
            rngs={"dropout": jax.random.PRNGKey(1)},
            num_updates=num_updates,
            train=True,
        )[0]

    g_frozen = jax.grad(loss_fn)(params, jnp.asarray(0))
    g_live = jax.grad(loss_fn)(params, jnp.asarray(5))
    trunk_frozen = jax.tree_util.tree_leaves(g_frozen["params"]["trunk"])
    trunk_live = jax.tree_util.tree_leaves(g_live["params"]["trunk"])
    assert all(float(jnp.abs(x).max()) == 0.0 for x in trunk_frozen)
    assert any(float(jnp.abs(x).max()) > 0.0 for x in trunk_live)
    # head learns in both phases
    assert float(jnp.abs(g_frozen["params"]["proj"]["kernel"]).max()) > 0.0


def test_mask_emb_applied_only_in_train(ctc_setup):
    """Span-masked frames take the learned embedding at train time; eval
    ignores host mask indices (reference apply_mask :321-340)."""
    model, params, batch = ctc_setup
    kw = dict(num_updates=jnp.asarray(5), rngs={"dropout": jax.random.PRNGKey(1)})
    l_eval, _ = model.apply(
        params,
        batch["audio"],
        batch["audio_padding_mask"],
        mask_indices=batch["mask_indices"],
        deterministic=True,
        method=Wav2VecCtcModel.ctc_logits,
        **kw,
    )
    l_eval_nomask, _ = model.apply(
        params,
        batch["audio"],
        batch["audio_padding_mask"],
        mask_indices=None,
        deterministic=True,
        method=Wav2VecCtcModel.ctc_logits,
        **kw,
    )
    np.testing.assert_allclose(
        np.asarray(l_eval), np.asarray(l_eval_nomask), rtol=1e-6
    )
    l_train, _ = model.apply(
        params,
        batch["audio"],
        batch["audio_padding_mask"],
        mask_indices=batch["mask_indices"],
        deterministic=False,
        method=Wav2VecCtcModel.ctc_logits,
        **kw,
    )
    assert float(jnp.abs(l_train - l_eval).max()) > 1e-6


def test_seq2seq_ce_and_generate():
    from chimera_st_tpu.criterions.label_smoothed_ce import make_label_smoothed_ce
    from chimera_st_tpu.generation.generator import (
        GeneratorSettings,
        SequenceGenerator,
    )

    cfg = Wav2VecAsrConfig(**TINY)
    model = Wav2VecSeq2SeqModel(cfg)
    batch = _batch(with_mask=False)
    prev = jnp.asarray([[2, 4, 5], [2, 4, 5]], jnp.int32)
    batch["prev_output_tokens"] = prev
    batch["target"] = jnp.asarray([[4, 5, 2], [4, 5, 2]], jnp.int32)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch["audio"],
        batch["audio_padding_mask"],
        prev,
    )
    crit = make_label_smoothed_ce({"label_smoothing": 0.1, "padding_idx": 1})
    loss, ss, logging = crit(
        model, params, batch, rngs={"dropout": jax.random.PRNGKey(1)}, train=True
    )
    assert np.isfinite(float(loss)) and float(loss) > 0

    gen = SequenceGenerator(
        model,
        GeneratorSettings(beam_size=2, max_decode_len=8, max_len_b=8),
        pad=1,
        eos=2,
        unk=3,
    )
    tokens, scores, lens = gen.generate_audio(
        params, batch["audio"], batch["audio_padding_mask"]
    )
    assert np.asarray(tokens).shape[0] == 2


def test_add_target_dataset_collater(tmp_path):
    from chimera_st_tpu.data.audio import write_wav
    from chimera_st_tpu.data.raw_audio_dataset import (
        AddTargetDataset,
        RawAudioDataset,
    )

    rng = np.random.default_rng(4)
    rows = []
    lens = [900, 600, 750]
    for i, n in enumerate(lens):
        write_wav(
            str(tmp_path / f"u{i}.wav"),
            rng.normal(size=n).astype(np.float32) * 0.1,
        )
        rows.append({"audio": f"u{i}.wav", "n_frames": str(n)})
    base = RawAudioDataset(
        rows,
        audio_root=str(tmp_path),
        max_sample_size=2000,
        min_sample_size=100,
        frames_fn=lambda n: max(n // 10, 4),
    )
    labels = [
        np.asarray([4, 5, 6, 2], np.int32),
        np.asarray([4, 2], np.int32),
        np.asarray([5, 5, 2], np.int32),
    ]
    ds = AddTargetDataset(base, labels, pad_idx=1, eos_idx=2)
    batch = ds.collater([ds[i] for i in range(3)])
    # fine-tune collater pads to batch max (no labeled frames cropped away)
    assert batch["audio"].shape == (3, 900)
    assert not batch["audio_padding_mask"][0].any()
    assert batch["audio_padding_mask"][1, 600:].all()
    assert batch["target"].shape == (3, 4)
    np.testing.assert_array_equal(batch["target"][1], [4, 2, 1, 1])
    # eos-rotated decoder inputs
    np.testing.assert_array_equal(batch["prev_output_tokens"][0], [2, 4, 5, 6])
    assert batch["ntokens"] == 9.0
    # per-utterance frame mask stays inside valid frames
    frame_lens = np.asarray([90, 60, 75])
    for i in range(3):
        masked = np.nonzero(batch["mask_indices"][i])[0]
        if masked.size:
            assert masked.max() < frame_lens[i]


def test_audio_finetuning_task_e2e(tmp_path):
    """Task surface: ``--task audio_pretraining --labels ltr`` loads
    AddTargetDataset + label dict and builds registry fine-tune models
    (reference audio_pretraining.py:85-124)."""
    from chimera_st_tpu.config.registry import TASKS
    from chimera_st_tpu.data.audio import write_wav
    import chimera_st_tpu.tasks  # noqa: F401 — registration

    rng = np.random.default_rng(7)
    with open(tmp_path / "dict.ltr.txt", "w") as f:
        for ch in "abcdef":
            f.write(f"{ch} 1\n")
    rows, lines = [], []
    texts = ["a b c", "d e", "a f a", "c c d"]
    for i, t in enumerate(texts):
        n = int(rng.integers(600, 900))
        write_wav(
            str(tmp_path / f"u{i}.wav"),
            rng.normal(size=n).astype(np.float32) * 0.1,
        )
        rows.append(f"u{i}.wav\t{n}")
        lines.append(t)
    with open(tmp_path / "train.tsv", "w") as f:
        f.write("audio\tn_frames\n" + "\n".join(rows) + "\n")
    with open(tmp_path / "train.ltr", "w") as f:
        f.write("\n".join(lines) + "\n")

    task = TASKS.get("audio_pretraining").setup_task(
        {
            "data": str(tmp_path),
            "labels": "ltr",
            "min_sample_size": 100,
            "max_sample_size": 2000,
            "conv_spec": CONV,
        }
    )
    assert task.target_dictionary is not None
    task.load_dataset("train")
    ds = task.dataset("train")
    assert len(ds) == 4

    arch_cfg = {k: v for k, v in TINY.items() if k != "vocab_size"}
    model = task.build_model(dict(arch="wav2vec_ctc", apply_mask=True, **arch_cfg))
    # vocab injected from the label dictionary
    assert model.cfg.vocab_size == len(task.target_dictionary)

    it = task.make_batch_iterator(ds, max_sentences=2, seed=3)
    batch = next(iter(it.next_epoch_itr(shuffle=False)))
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(batch["audio"]),
        jnp.asarray(batch["audio_padding_mask"]),
    )
    crit = task.build_criterion({"_name": "ctc"})
    loss, ss, logging = crit(
        model,
        params,
        jax.tree_util.tree_map(jnp.asarray, batch),
        rngs={"dropout": jax.random.PRNGKey(1)},
        num_updates=jnp.asarray(0),
        train=True,
    )
    assert np.isfinite(float(loss)) and float(loss) > 0


# ---------------------------------------------------------------- torch import


def test_ctc_checkpoint_import_parity():
    """fairseq Wav2VecCtc state dict -> importer -> identical logits
    (reference wav2vec2_asr.py:146-184 key layout)."""
    import torch

    from chimera_st_tpu.checkpoint.torch_import import (
        import_wav2vec_ctc_state_dict,
    )
    from tests.torch_reference import TorchWav2VecCtc

    torch.manual_seed(0)
    tref = TorchWav2VecCtc(CONV, 32, 64, 2, 4, vocab=12).eval()
    sd = tref.state_dict()
    params = {"params": import_wav2vec_ctc_state_dict(sd)}

    cfg = Wav2VecAsrConfig(apply_mask=True, **TINY)
    model = Wav2VecCtcModel(cfg)

    rng = np.random.default_rng(0)
    wav = rng.normal(size=(2, 400)).astype(np.float32)
    mask = np.zeros((2, 400), bool)
    mask[1, 250:] = True
    with torch.no_grad():
        ref_logits, ref_mask = tref(torch.tensor(wav), torch.tensor(mask))
    logits, out_mask = model.apply(params, jnp.asarray(wav), jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(out_mask), ref_mask.numpy())
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits.numpy(), atol=2e-3
    )
    # mask_emb came through
    np.testing.assert_allclose(
        np.asarray(params["params"]["trunk"]["w2v_model"]["mask_emb"]),
        tref.w2v_encoder.w2v_model.mask_emb.detach().numpy(),
    )
    # apply_mask=False drops it instead of erroring
    p2 = import_wav2vec_ctc_state_dict(sd, apply_mask=False)
    assert "mask_emb" not in p2["trunk"]["w2v_model"]


def test_seq2seq_checkpoint_import_parity():
    """fairseq wav2vec_seq2seq state dict (encoder.proj dim bridge + untied
    embed_out) -> importer -> identical logits (wav2vec2_asr.py:186-302)."""
    import torch

    from chimera_st_tpu.checkpoint.torch_import import (
        import_wav2vec_seq2seq_state_dict,
    )
    from tests.torch_reference import TorchWav2VecSeq2Seq

    torch.manual_seed(1)
    tref = TorchWav2VecSeq2Seq(
        CONV, 32, 64, 2, 4, vocab=12, dec_d=48, dec_ffn=96,
        dec_layers=2, dec_heads=4,
    ).eval()
    sd = tref.state_dict()
    params = {"params": import_wav2vec_seq2seq_state_dict(sd)}

    cfg = Wav2VecAsrConfig(
        apply_mask=True,
        **{**TINY, "decoder_embed_dim": 48, "decoder_ffn_dim": 96},
        decoder_normalize_before=True,
        share_decoder_input_output_embed=False,
    )
    model = Wav2VecSeq2SeqModel(cfg)

    rng = np.random.default_rng(1)
    wav = rng.normal(size=(2, 400)).astype(np.float32)
    mask = np.zeros((2, 400), bool)
    mask[1, 250:] = True
    prev = np.array([[2, 4, 5, 6], [2, 7, 8, 1]], np.int64)
    with torch.no_grad():
        ref_logits = tref(
            torch.tensor(wav), torch.tensor(mask), torch.tensor(prev)
        )
    logits = model.apply(
        params,
        jnp.asarray(wav),
        jnp.asarray(mask),
        jnp.asarray(prev, jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits.numpy(), atol=2e-3
    )
