"""Host input-pipeline tests: parallel collation (ParallelPrefetcher),
prefetch-thread device placement, the decoded-waveform LRU cache, and the
train-split host-wire economy format (int16 PCM + device-side padding mask).

Reference analogs: torch DataLoader workers + BufferedIterator
(fairseq/data/iterators.py:503-566) and pin_memory/non_blocking transfer;
the wire format has no reference analog (the reference ships float32 and a
host-built mask) — it exists because this framework's host->device hop is a
network tunnel, not a PCIe bus.
"""

import threading
import time

import numpy as np
import pytest

from chimera_st_tpu.data.audio import (
    _LRUByteCache,
    configure_wav_cache,
    get_features_or_waveform,
    read_wav,
    write_wav,
)
from chimera_st_tpu.data.iterators import EpochBatchIterator, ParallelPrefetcher

pytestmark = pytest.mark.quick


# ------------------------------------------------------- ParallelPrefetcher


def test_parallel_prefetcher_preserves_order():
    items = list(range(64))

    def work(i):
        # adversarial scheduling: early items finish last
        time.sleep(0.002 * (64 - i) / 64)
        return i * i

    pf = ParallelPrefetcher(items, work, num_workers=8, buffer_size=4)
    assert len(pf) == 64
    assert list(pf) == [i * i for i in items]


def test_parallel_prefetcher_matches_serial_stream():
    def work(i):
        return {"x": np.full((3,), i)}

    serial = [work(i) for i in range(17)]
    par = list(ParallelPrefetcher(range(17), work, num_workers=4, buffer_size=2))
    assert len(par) == len(serial)
    for a, b in zip(par, serial):
        np.testing.assert_array_equal(a["x"], b["x"])


def test_parallel_prefetcher_error_at_position():
    def work(i):
        if i == 5:
            raise ValueError("boom at 5")
        return i

    pf = ParallelPrefetcher(range(10), work, num_workers=4, buffer_size=2)
    got = []
    with pytest.raises(ValueError, match="boom at 5"):
        for x in pf:
            got.append(x)
    assert got == [0, 1, 2, 3, 4]
    # exhausted: further next() re-raises StopIteration, no hang
    with pytest.raises(StopIteration):
        next(pf)


def test_parallel_prefetcher_post_fn_runs_on_stager_thread():
    main = threading.get_ident()
    seen = []

    def post(x):
        seen.append(threading.get_ident())
        return x + 100

    pf = ParallelPrefetcher(range(8), lambda i: i, num_workers=2,
                            buffer_size=2, post_fn=post)
    assert list(pf) == [i + 100 for i in range(8)]
    assert all(t != main for t in seen)


def test_epoch_iterator_parallel_equals_serial():
    batches = [np.asarray([i, i + 1]) for i in range(0, 20, 2)]

    def collate(idx):
        return {"sum": int(np.sum(idx)), "idx": np.asarray(idx)}

    a = EpochBatchIterator(collate, batches, seed=3, num_workers=1)
    b = EpochBatchIterator(collate, batches, seed=3, num_workers=4)
    xs = list(a.next_epoch_itr(shuffle=True))
    ys = list(b.next_epoch_itr(shuffle=True))
    assert [x["sum"] for x in xs] == [y["sum"] for y in ys]
    for x, y in zip(xs, ys):
        np.testing.assert_array_equal(x["idx"], y["idx"])


def test_epoch_iterator_device_put_fn_applied_both_paths():
    batches = [np.asarray([i]) for i in range(6)]
    collate = lambda idx: {"v": int(idx[0])}  # noqa: E731
    for workers in (1, 3):
        it = EpochBatchIterator(collate, batches, num_workers=workers)
        it.device_put_fn = lambda b: {**b, "placed": True}
        out = list(it.next_epoch_itr(shuffle=False))
        assert all(b.get("placed") for b in out)
        assert [b["v"] for b in out] == list(range(6))


def test_epoch_iterator_parallel_resume_offset():
    batches = [np.asarray([i]) for i in range(10)]
    collate = lambda idx: int(idx[0])  # noqa: E731
    it = EpochBatchIterator(collate, batches, seed=1, num_workers=4)
    full = list(it.next_epoch_itr(shuffle=True))
    it2 = EpochBatchIterator(collate, batches, seed=1, num_workers=4)
    itr = it2.next_epoch_itr(shuffle=True, offset=7)
    assert itr.n == 7
    assert list(itr) == full[7:]


# ------------------------------------------------------------- wav cache


def test_lru_byte_cache_eviction_and_stats():
    c = _LRUByteCache(max_bytes=3 * 8 * 10)  # room for 3 float64[10]
    for k in "abc":
        c.put(k, np.zeros(10))
    assert c.get("a") is not None  # refresh a
    c.put("d", np.zeros(10))  # evicts b (LRU)
    assert c.get("b") is None
    assert c.get("a") is not None and c.get("d") is not None
    big = np.zeros(1000)
    c.put("huge", big)  # larger than capacity: rejected outright
    assert c.get("huge") is None


def test_wav_cache_serves_repeat_reads(tmp_path):
    wav = (np.sin(np.arange(400) / 10) * 0.3).astype(np.float32)
    p = str(tmp_path / "c.wav")
    write_wav(p, wav)
    configure_wav_cache(64)  # fresh, empty cache
    try:
        a = get_features_or_waveform(p)
        b = get_features_or_waveform(p)
        assert a is b  # second read is the cached array
        np.testing.assert_allclose(a, wav, atol=1e-3)
        # disabling the cache turns every read into a fresh decode
        configure_wav_cache(0)
        c = get_features_or_waveform(p)
        d = get_features_or_waveform(p)
        assert c is not d
    finally:
        configure_wav_cache(512)


def test_int16_read_is_lossless(tmp_path):
    wav = (np.sin(np.arange(1000) / 7) * 0.8).astype(np.float32)
    p = str(tmp_path / "i.wav")
    write_wav(p, wav)
    configure_wav_cache(0)
    try:
        f32, _ = read_wav(p)
        i16, _ = read_wav(p, int16=True)
        assert i16.dtype == np.int16
        np.testing.assert_array_equal(
            i16.astype(np.float32) / 32768.0, f32
        )
        # slice path agrees too
        i16s, _ = read_wav(p, frame_offset=100, frames=50, int16=True)
        np.testing.assert_array_equal(i16s, i16[100:150])
    finally:
        configure_wav_cache(512)


# ---------------------------------------------------------- wire format e2e


def _tiny_s2t(tmp_path, n=5):
    from chimera_st_tpu.data.dictionary import Dictionary
    from chimera_st_tpu.data.manifests import S2TDataConfig, make_dataset_from_tsv

    rng = np.random.default_rng(0)
    (tmp_path / "wavs").mkdir(exist_ok=True)
    with open(tmp_path / "train.tsv", "w") as f:
        f.write("id\taudio\tn_frames\ttgt_text\n")
        for i in range(n):
            ns = 320 + 64 * i  # ragged lengths -> real padding
            write_wav(str(tmp_path / "wavs" / f"{i}.wav"),
                      (rng.normal(size=ns) * 0.2).astype(np.float32))
            f.write(f"u{i}\twavs/{i}.wav:0:{ns}\t{ns}\tein haus\n")
    (tmp_path / "dict.txt").write_text("ein 1\nhaus 1\n")
    (tmp_path / "config.yaml").write_text(
        f"audio_root: {tmp_path}\nuse_audio_input: true\n"
        "vocab_filename: dict.txt\n"
    )
    d = Dictionary.load(str(tmp_path / "dict.txt"))
    cfg = S2TDataConfig(str(tmp_path / "config.yaml"))
    return make_dataset_from_tsv(str(tmp_path), "train", cfg, d, is_train=True)


def test_wire_format_prepare_batch_equivalence(tmp_path):
    """int16-wire batch + device-side prepare_batch == float batch exactly."""
    import jax.numpy as jnp

    from chimera_st_tpu.data.manifests import set_wire_format
    from chimera_st_tpu.train.train_step import prepare_batch

    configure_wav_cache(0)  # isolate from other tests' cache state
    try:
        ds = _tiny_s2t(tmp_path)
        idx = list(range(len(ds)))
        ref = ds.collater([ds[i] for i in idx], audio_target_len=720)
        assert ref["audio"].dtype == np.float32
        assert "audio_padding_mask" in ref

        set_wire_format(ds)
        wire = ds.collater([ds[i] for i in idx], audio_target_len=720)
        assert wire["audio"].dtype == np.int16
        assert "audio_padding_mask" not in wire

        out = prepare_batch({k: jnp.asarray(v) for k, v in wire.items()})
        np.testing.assert_array_equal(np.asarray(out["audio"]), ref["audio"])
        np.testing.assert_array_equal(
            np.asarray(out["audio_padding_mask"]), ref["audio_padding_mask"]
        )
        np.testing.assert_array_equal(np.asarray(out["target"]), ref["target"])
        # float batches pass through prepare_batch untouched
        out2 = prepare_batch({k: jnp.asarray(v) for k, v in ref.items()})
        np.testing.assert_array_equal(np.asarray(out2["audio"]), ref["audio"])
    finally:
        configure_wav_cache(512)


def test_wire_format_walks_wrappers(tmp_path):
    from chimera_st_tpu.data.manifests import set_wire_format
    from chimera_st_tpu.data.wrappers import ConcatDataset

    (tmp_path / "a").mkdir(exist_ok=True)
    (tmp_path / "b").mkdir(exist_ok=True)
    ds1 = _tiny_s2t(tmp_path / "a")
    ds2 = _tiny_s2t(tmp_path / "b")
    cat = ConcatDataset([ds1, ds2])
    set_wire_format(cat)
    assert ds1.wire_int16 and ds2.wire_int16
    assert ds1.device_mask and ds2.device_mask


def test_to_device_keeps_host_metadata_on_mesh():
    """Prefetch-thread placement sees task_name tags before train_step pops
    them — shard_batch must never receive the string (review-risk guard)."""
    import jax
    import optax

    from chimera_st_tpu.parallel import make_mesh
    from chimera_st_tpu.train.trainer import Trainer

    mesh = make_mesh(model_parallel=1, devices=jax.devices()[:2])
    params = {"w": np.zeros((4,), np.float32)}
    tr = Trainer(
        model=None, criterion=lambda *a, **k: None,
        tx=optax.sgd(0.1), params=params, mesh=mesh,
    )
    batch = {
        "audio": np.zeros((4, 8), np.int16),
        "audio_lengths": np.asarray([8, 8, 8, 8], np.int32),
        "task_name": "st",
        "nsentences": 4,
    }
    placed = tr.to_device(batch)
    assert placed["task_name"] == "st"
    assert isinstance(placed["audio"], jax.Array)
    assert placed["audio"].dtype == np.int16
    # idempotent second pass
    again = tr.to_device(placed)
    assert again["audio"] is placed["audio"]


# ----------------------------------------------- bench mixed-length harness


def test_bench_mixed_lengths_smoke(monkeypatch):
    """run_mixed_lengths end to end on a tiny model/corpus: per-bucket batch
    sizes, length-scaled decode budgets, fill accounting, pass spread."""
    import sys

    sys.path.insert(0, "/root/repo")
    import bench
    import jax.numpy as jnp

    def tiny_flagship(probe_len):
        import jax

        from chimera_st_tpu.generation.generator import (
            GeneratorSettings,
            SequenceGenerator,
        )
        from chimera_st_tpu.models.interlingua import (
            ChimeraInterlinguaModel,
            InterlinguaConfig,
        )

        cfg = InterlinguaConfig(
            tgt_vocab_size=32, src_vocab_size=32,
            encoder_embed_dim=16, encoder_ffn_dim=32, encoder_layers=1,
            encoder_heads=2, decoder_embed_dim=16, decoder_ffn_dim=32,
            decoder_layers=1, decoder_heads=2, interlingua_length=4,
            interlingua_layers=1, w2v2_embed_dim=16, w2v2_ffn_dim=32,
            w2v2_layers=1, w2v2_heads=2, conv_channels=16,
        )
        model = ChimeraInterlinguaModel(cfg, dtype=jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, probe_len), jnp.float32),
            jnp.zeros((1, probe_len), bool),
            jnp.full((1, 4), 2, jnp.int32),
            jnp.full((1, 4), 2, jnp.int32),
            method=ChimeraInterlinguaModel.init_everything,
        )
        gen = SequenceGenerator(
            model, GeneratorSettings(beam_size=2, max_decode_len=8)
        )
        return model, params, gen

    monkeypatch.setattr(bench, "build_flagship", tiny_flagship)
    monkeypatch.setattr(bench, "BEAM", 2)
    monkeypatch.setattr(bench, "SAMPLE_RATE", 160)  # "2-15s" = 320-2400 samp
    r = bench.run_mixed_lengths(
        n_buckets=3, n_utts=24, work_s=40.0, budget_s=600.0, passes=2
    )
    assert r is not None and r["buckets_skipped"] == 0
    assert r["n_utts"] == 24
    assert r["utt_per_sec"] > 0
    assert len(r["utt_per_sec_spread"]) == 2
    assert 0 < r["bucket_fill"] <= 1
    assert r["n_compiled_shapes"] == len(r["edges_sec"]) == 3
    # static decode caps scale with bucket duration, and the realistic
    # per-row terminal step count stays under each bucket's cap
    pairs = [v for _, v in sorted(r["hyp_steps_and_cap_per_bucket"].items(),
                                  key=lambda kv: float(kv[0]))]
    dls = [cap for _, cap in pairs]
    assert dls == sorted(dls) and dls[0] < dls[-1]
    assert all(steps <= cap for steps, cap in pairs)
    # shorter buckets run larger batches
    bs = [b for _, b in sorted(r["batch_per_bucket"].items(),
                               key=lambda kv: float(kv[0]))]
    assert bs == sorted(bs, reverse=True)
