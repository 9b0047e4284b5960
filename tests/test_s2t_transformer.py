import jax
import jax.numpy as jnp
import numpy as np

from chimera_st_tpu.models import build_model_from_arch
from chimera_st_tpu.models.s2t_transformer import (
    S2TTransformerConfig,
    S2TTransformerModel,
)

TINY = S2TTransformerConfig(
    tgt_vocab_size=20, input_feat_per_channel=8,
    conv_channels=8, encoder_embed_dim=16, encoder_ffn_dim=32,
    encoder_layers=1, encoder_heads=2, decoder_embed_dim=16,
    decoder_ffn_dim=32, decoder_layers=1, decoder_heads=2,
)


def test_fbank_model_forward():
    model = S2TTransformerModel(TINY)
    feats = jnp.asarray(np.random.default_rng(0).normal(size=(2, 20, 8)), jnp.float32)
    mask = jnp.zeros((2, 20), bool).at[1, 14:].set(True)
    prev = jnp.asarray([[2, 4, 5], [2, 6, 7]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), feats, mask, prev)
    logits = model.apply(params, feats, mask, prev)
    assert logits.shape == (2, 3, 20)
    assert np.isfinite(np.asarray(logits)).all()


def test_on_device_fbank_path():
    import dataclasses

    cfg = dataclasses.replace(TINY, compute_fbank=True, input_feat_per_channel=80)
    model = S2TTransformerModel(cfg)
    wav = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8000)) * 0.1, jnp.float32)
    mask = jnp.zeros((1, 8000), bool)
    prev = jnp.asarray([[2, 4]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), wav, mask, prev)
    logits = model.apply(params, wav, mask, prev)
    assert logits.shape == (1, 2, 20)


def test_arch_presets():
    m = build_model_from_arch("s2t_transformer_s", {"tgt_vocab_size": 10, "encoder_layers": 1, "decoder_layers": 1})
    assert m.cfg.encoder_embed_dim == 256 and m.cfg.encoder_heads == 4
    m = build_model_from_arch("s2t_transformer_m", {"tgt_vocab_size": 10, "encoder_layers": 1, "decoder_layers": 1})
    assert m.cfg.encoder_embed_dim == 512


def test_speech_to_text_bleu_task_counts(tmp_path):
    """speech_to_text_bleu: valid-time beam decode -> summable BLEU count
    buckets -> corpus BLEU reconstruction (reference:
    tasks/speech_to_text_bleu.py:207-297 fast-stat-sync pattern)."""
    from chimera_st_tpu.tasks import setup_task
    from chimera_st_tpu.tasks.speech_to_text import SpeechToTextBLEUTask
    from tests.synthetic_data import make_triplet_dir

    root = make_triplet_dir(str(tmp_path / "data"), n=4)
    task = setup_task({"_name": "speech_to_text_bleu", "data": root})
    assert isinstance(task, SpeechToTextBLEUTask)
    task.load_dataset("valid")

    from chimera_st_tpu.models.interlingua import (
        ChimeraInterlinguaModel,
        InterlinguaConfig,
    )

    model = ChimeraInterlinguaModel(InterlinguaConfig(
        tgt_vocab_size=len(task.target_dictionary), src_vocab_size=None,
        encoder_embed_dim=16, encoder_ffn_dim=32, encoder_layers=1,
        encoder_heads=2, decoder_embed_dim=16, decoder_ffn_dim=32,
        decoder_layers=1, decoder_heads=2, interlingua_length=4,
        interlingua_layers=1, w2v2_embed_dim=16, w2v2_ffn_dim=32,
        w2v2_layers=1, w2v2_heads=2,
        w2v2_conv_spec=((8, 10, 5), (8, 3, 2)),
    ))

    class Cfg:
        beam = 2
        max_decode_len = 8

    gen = task.build_generator(model, Cfg)
    itr = task.make_batch_iterator(
        task.dataset("valid"), max_sentences=4, num_length_buckets=1
    ).next_epoch_itr(shuffle=False)
    batch = next(iter(itr))
    import jax

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["audio"][:1]),
        jnp.asarray(batch["audio_padding_mask"][:1]),
        None,
        jnp.full((1, 4), 2, jnp.int32),
        method=ChimeraInterlinguaModel.init_everything,
    )
    jb = {k: (jnp.asarray(v) if hasattr(v, "shape") else v)
          for k, v in batch.items()}
    counts = task.valid_bleu_counts(gen, params, jb, decode_fn=lambda s: s)
    assert all(f"_bleu_counts_{i}" in counts for i in range(4))
    score = SpeechToTextBLEUTask.bleu_from_counts(counts)
    assert 0.0 <= score <= 100.0


def test_triplet_infer_task_alias(tmp_path):
    """speech_to_text_triplet_infer is the interactive-config alias of the
    triplet task (reference: the config_wave.yaml task name used by
    interactive-en2any-ST.sh)."""
    from chimera_st_tpu.tasks import setup_task
    from chimera_st_tpu.tasks.triplet import TripletTask
    from tests.synthetic_data import make_triplet_dir

    root = make_triplet_dir(str(tmp_path / "data"), n=3)
    task = setup_task({"_name": "speech_to_text_triplet_infer", "data": root})
    assert isinstance(task, TripletTask)
    # interactive input: .wav paths resolve to waveforms
    import os

    wav = os.path.join(root, "wavs", "u0.wav")
    examples = task.get_interactive_examples([wav])
    assert len(examples) == 1 and examples[0].ndim == 1
