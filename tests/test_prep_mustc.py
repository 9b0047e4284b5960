import numpy as np
import pytest
import yaml

from chimera_st_tpu.data.audio import write_wav
from chimera_st_tpu.tools.prep_mustc_data import main as prep_main


@pytest.fixture
def fake_mustc(tmp_path):
    """Minimal en-de MuST-C layout with 3 segments over 2 wav files."""
    root = tmp_path / "mustc"
    d = root / "en-de" / "data" / "dev"
    (d / "wav").mkdir(parents=True)
    (d / "txt").mkdir(parents=True)
    sr = 16000
    rng = np.random.default_rng(0)
    write_wav(str(d / "wav" / "ted_1.wav"), rng.normal(size=sr * 3).astype(np.float32) * 0.1, sr)
    write_wav(str(d / "wav" / "ted_2.wav"), rng.normal(size=sr * 2).astype(np.float32) * 0.1, sr)
    segments = [
        {"wav": "ted_1.wav", "offset": 0.0, "duration": 1.5, "speaker_id": "s1"},
        {"wav": "ted_1.wav", "offset": 1.5, "duration": 1.2, "speaker_id": "s1"},
        {"wav": "ted_2.wav", "offset": 0.2, "duration": 1.0, "speaker_id": "s2"},
    ]
    with open(d / "txt" / "dev.yaml", "w") as f:
        yaml.safe_dump(segments, f)
    (d / "txt" / "dev.en").write_text("hello there\nsecond line\nthird one\n")
    (d / "txt" / "dev.de").write_text("hallo du\nzweite zeile\ndritte\n")
    # fake spm+vocab artifacts
    (root / "spm.model").write_bytes(b"\x0a\x00")
    (root / "vocab.txt").write_text("hallo 1\n")
    return root


def test_prep_mustc_wave(fake_mustc):
    prep_main([
        "--data-root", str(fake_mustc), "--langs", "de", "--task", "wave",
        "--spm-model", str(fake_mustc / "spm.model"),
        "--vocab", str(fake_mustc / "vocab.txt"),
    ])
    lang_root = fake_mustc / "en-de"
    tsv = (lang_root / "dev_wave.tsv").read_text().splitlines()
    assert tsv[0].split("\t") == ["id", "audio", "n_frames", "tgt_text", "speaker", "src_text"]
    assert len(tsv) == 4
    # wave addressing: path:offset:length with raw sample counts
    audio_col = tsv[1].split("\t")[1]
    path, off, length = audio_col.rsplit(":", 2)
    assert path.endswith("ted_1.wav") and off == "0" and length == str(int(1.5 * 16000))
    # config_wave.yaml written
    cfg = yaml.safe_load((lang_root / "config_wave.yaml").read_text())
    assert cfg["use_audio_input"] is True
    assert cfg["bpe_tokenizer"]["bpe"] == "sentencepiece"

    # the generated manifest loads as a dataset and yields sliced audio
    from chimera_st_tpu.data.manifests import TripletDataConfig, make_dataset_from_tsv
    from chimera_st_tpu.data.dictionary import Dictionary

    d = Dictionary()
    for w in "hallo du zweite zeile dritte".split():
        d.add_symbol(w)
    data_cfg = TripletDataConfig(str(lang_root / "config_wave.yaml"))
    ds = make_dataset_from_tsv(str(lang_root), "dev_wave", data_cfg, d, False,
                               src_dict=d, triplet=True)
    ex = ds[0]
    assert len(ex.audio) == int(1.5 * 16000)
    assert ex.target is not None and ex.source_text is not None


def test_prep_mustc_fbank(fake_mustc):
    prep_main([
        "--data-root", str(fake_mustc), "--langs", "de", "--task", "fbank80",
        "--spm-model", str(fake_mustc / "spm.model"),
        "--vocab", str(fake_mustc / "vocab.txt"),
    ])
    lang_root = fake_mustc / "en-de"
    tsv = (lang_root / "dev_fbank80.tsv").read_text().splitlines()
    assert len(tsv) == 4
    npy_path = tsv[1].split("\t")[1]
    feats = np.load(npy_path)
    assert feats.shape[1] == 80
    # n_frames column matches the feature length
    assert int(tsv[1].split("\t")[2]) == feats.shape[0]
    cfg = yaml.safe_load((lang_root / "config_fbank.yaml").read_text())
    assert cfg["use_audio_input"] is False
    assert "specaugment" in cfg.get("transforms", {})


def test_fbank_dataset_loads_with_transforms(fake_mustc):
    """fbank manifests load as 2-D feature datasets with specaugment/cmvn
    applied at train time and collate into [B, T, 80] batches."""
    prep_main([
        "--data-root", str(fake_mustc), "--langs", "de", "--task", "fbank80",
        "--spm-model", str(fake_mustc / "spm.model"),
        "--vocab", str(fake_mustc / "vocab.txt"),
    ])
    lang_root = fake_mustc / "en-de"
    from chimera_st_tpu.data.dictionary import Dictionary
    from chimera_st_tpu.data.manifests import S2TDataConfig, make_dataset_from_tsv

    d = Dictionary()
    for w in "hallo du zweite zeile dritte".split():
        d.add_symbol(w)
    cfg = S2TDataConfig(str(lang_root / "config_fbank.yaml"))
    ds = make_dataset_from_tsv(str(lang_root), "dev_fbank80", cfg, d, True)
    ex = ds[0]
    assert ex.audio.ndim == 2 and ex.audio.shape[1] == 80
    batch = ds.collater([ds[i] for i in range(3)], audio_target_len=256)
    assert batch["audio"].shape == (3, 256, 80)
    assert batch["audio_padding_mask"].shape == (3, 256)
