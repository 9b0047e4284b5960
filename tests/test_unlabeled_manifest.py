"""A manifest WITHOUT a tgt_text column is an unlabeled inference manifest:
the dataset must take the no-target path, not encode '' into eos-only
references (review fix — the collater used to emit target=[[eos]] rows and
count them as real label tokens)."""

import numpy as np

from chimera_st_tpu.data.manifests import S2TDataConfig, make_dataset_from_tsv


def test_no_tgt_text_column_means_no_targets(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(3):
        np.save(tmp_path / f"a{i}.npy", rng.normal(size=50).astype(np.float32))
    with open(tmp_path / "test.tsv", "w") as f:
        f.write("id\taudio\tn_frames\n")
        for i in range(3):
            f.write(f"u{i}\t{tmp_path}/a{i}.npy\t50\n")
    (tmp_path / "config_wave.yaml").write_text("use_audio_input: true\n")
    # minimal dict
    with open(tmp_path / "dict.txt", "w") as f:
        for w in ("a", "b", "c"):
            f.write(f"{w} 1\n")
    from chimera_st_tpu.data.dictionary import Dictionary

    tgt_dict = Dictionary.load(str(tmp_path / "dict.txt"))
    cfg = S2TDataConfig(str(tmp_path / "config_wave.yaml"))
    ds = make_dataset_from_tsv(
        str(tmp_path), "test", cfg, tgt_dict=tgt_dict, is_train=False
    )
    ex = ds[0]
    assert ex.target is None
    batch = ds.collater([ds[i] for i in range(3)])
    assert "target" not in batch or batch.get("target") is None
