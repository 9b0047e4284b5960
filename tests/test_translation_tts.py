import numpy as np
import pytest

from chimera_st_tpu.data.audio import write_wav
from tests.synthetic_data import make_parallel_text


def test_translation_tts_audio_batches(tmp_path):
    from chimera_st_tpu.cli import preprocess
    from chimera_st_tpu.tasks import setup_task

    raw = make_parallel_text(str(tmp_path / "raw"), n=8)
    bin_dir = str(tmp_path / "bin")
    preprocess.main([
        "-s", "de", "-t", "en",
        "--trainpref", f"{raw}/train", "--destdir", bin_dir,
        "--joined-dictionary",
    ])
    # TTS audio for every index
    audio_dir = tmp_path / "tts"
    audio_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        write_wav(str(audio_dir / f"{i}.wav"),
                  rng.normal(size=int(rng.integers(500, 900))).astype(np.float32) * 0.1)

    task = setup_task({"_name": "translation_tts", "data": bin_dir,
                       "source_lang": "de", "target_lang": "en",
                       "audio_dirname": str(audio_dir)})
    task.load_dataset("train")
    itr = task.make_batch_iterator(task.dataset("train"), max_sentences=4,
                                   num_length_buckets=2).next_epoch_itr(shuffle=False)
    batch = next(iter(itr))
    # audio present -> triplet schema keys
    assert "audio" in batch and "audio_padding_mask" in batch
    assert "src_text" in batch and "target" in batch
    assert batch["audio"].shape[1] % 1280 == 0  # bucketed to w2v2 stride

    # without audio dir: plain text batches
    task2 = setup_task({"_name": "translation_tts", "data": bin_dir,
                        "source_lang": "de", "target_lang": "en"})
    task2.load_dataset("train")
    b2 = next(iter(task2.make_batch_iterator(task2.dataset("train"), max_sentences=4,
                                             num_length_buckets=2).next_epoch_itr(shuffle=False)))
    assert "audio" not in b2 and "src_tokens" in b2
