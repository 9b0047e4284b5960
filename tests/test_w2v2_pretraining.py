import jax
import jax.numpy as jnp
import numpy as np
import pytest

from chimera_st_tpu.config.registry import CRITERIONS
import chimera_st_tpu.criterions  # noqa: F401
from chimera_st_tpu.models.wav2vec2_pretraining import (
    GumbelVectorQuantizer,
    KmeansVectorQuantizer,
    W2V2PretrainConfig,
    Wav2Vec2PretrainModel,
    compute_mask_indices,
    sample_negative_indices,
)

TINY = W2V2PretrainConfig(
    encoder_embed_dim=16,
    encoder_ffn_dim=32,
    encoder_layers=1,
    encoder_heads=2,
    conv_spec=((8, 10, 5), (12, 3, 2)),
    final_dim=8,
    latent_vars=16,
    latent_groups=2,
    num_negatives=4,
    conv_pos=8,
    conv_pos_groups=4,
)


def test_compute_mask_indices():
    rng = np.random.default_rng(0)
    pad = np.zeros((2, 100), bool)
    pad[1, 60:] = True
    mask = compute_mask_indices((2, 100), pad, mask_prob=0.5, mask_length=5, rng=rng)
    assert mask.shape == (2, 100)
    assert mask[0].sum() > 0
    assert not mask[1, 60:].any()  # no masks on padding


def test_sample_negative_indices_avoid_positive():
    rng = np.random.default_rng(1)
    neg = sample_negative_indices(2, 50, 8, rng=rng)
    pos = np.arange(50)[None, :, None]
    assert (neg != pos).all()
    assert (neg >= 0).all() and (neg < 50).all()


def test_quantizer_shapes_and_ppl():
    q = GumbelVectorQuantizer(12, num_vars=16, groups=2, vq_dim=8)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 10, 12)), jnp.float32)
    params = q.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = q.apply(params, x, train=False)
    assert out["x"].shape == (2, 10, 8)
    assert 1.0 <= float(out["prob_perplexity"]) <= 32.0
    # train mode with gumbel noise
    out2 = q.apply(params, x, train=True, rng=jax.random.PRNGKey(1))
    assert out2["x"].shape == (2, 10, 8)


def test_kmeans_quantizer_hard_assignment():
    """reference: modules/kmeans_vector_quantizer.py — output is the nearest
    codebook entry per group (hard VQ), with a straight-through gradient and
    a latent+commitment MSE."""
    q = KmeansVectorQuantizer(12, num_vars=16, groups=2, vq_dim=12)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 10, 12)), jnp.float32)
    params = q.init({"params": jax.random.PRNGKey(3)}, x, train=False)
    out = q.apply(params, x, train=False, produce_targets=True)
    assert out["x"].shape == (2, 10, 12)
    assert out["targets"].shape == (2, 10, 2)
    assert float(out["kmeans_loss"]) >= 0

    # oracle: recompute the projected/normed input and nearest entries in numpy
    ze = q.apply(
        params,
        x,
        method=lambda m, v: m.group_norm(m.proj(v).astype(jnp.float32)),
    )
    ze = np.asarray(ze).reshape(2, 10, 2, 6)
    emb = np.asarray(params["params"]["embedding"], np.float32)  # [V, G, D]
    got = np.asarray(out["x"], np.float32).reshape(2, 10, 2, 6)
    for b in range(2):
        for t in range(10):
            for g in range(2):
                d = np.linalg.norm(ze[b, t, g] - emb[:, g], axis=-1)
                v = int(np.argmin(d))
                assert int(out["targets"][b, t, g]) == v
                np.testing.assert_allclose(got[b, t, g], emb[v, g], rtol=1e-5)

    # straight-through: d(loss)/d(proj kernel) through the quantized output
    # is nonzero even though argmin is non-differentiable; embedding gets
    # gradient only through the kmeans loss
    def f(p):
        o = q.apply(p, x, train=True)
        return jnp.sum(o["x"] ** 2) + o["kmeans_loss"]

    g = jax.grad(f)(params)
    assert float(jnp.linalg.norm(g["params"]["proj"]["kernel"])) > 0
    assert float(jnp.linalg.norm(g["params"]["embedding"])) > 0


def test_kmeans_pretrain_model_trains():
    """quantizer_type='kmeans' end-to-end through the wav2vec criterion."""
    cfg = W2V2PretrainConfig(
        encoder_embed_dim=16,
        encoder_ffn_dim=32,
        encoder_layers=1,
        encoder_heads=2,
        conv_spec=((8, 10, 5), (12, 3, 2)),
        final_dim=8,
        latent_vars=16,
        latent_groups=2,
        num_negatives=4,
        conv_pos=8,
        conv_pos_groups=4,
        quantizer_type="kmeans",
    )
    model = Wav2Vec2PretrainModel(cfg)
    rng = np.random.default_rng(6)
    B, T = 2, 400
    audio = jnp.asarray(rng.normal(size=(B, T)), jnp.float32)
    from chimera_st_tpu.models.wav2vec2 import extractor_output_length

    frames = extractor_output_length(T, cfg.conv_spec)
    mask = jnp.asarray(compute_mask_indices((B, frames), None, 0.5, 3, rng=rng))
    negs = jnp.asarray(sample_negative_indices(B, frames, cfg.num_negatives, rng=rng))
    params = model.init(
        {"params": jax.random.PRNGKey(2), "gumbel": jax.random.PRNGKey(3)},
        audio, None, mask, negs,
    )
    batch = {
        "audio": audio,
        "audio_padding_mask": None,
        "mask_indices": mask,
        "negative_indices": negs,
        "ntokens": float(np.asarray(mask).sum()),
    }
    crit = CRITERIONS.get("wav2vec")({"loss_weights": (0.1, 10.0, 1.0)})
    loss, ss, logging = crit(
        model, params, batch, rngs={"dropout": jax.random.PRNGKey(0)}, train=True
    )
    assert np.isfinite(float(loss)) and float(ss) > 0
    assert float(logging["kmeans_loss"]) > 0

    def loss_fn(p):
        return crit(model, p, batch, rngs={"dropout": jax.random.PRNGKey(0)}, train=True)[0]

    g = jax.grad(loss_fn)(params)
    # hard VQ: codebook learns through the kmeans latent term
    gn = float(jnp.linalg.norm(g["params"]["quantizer"]["embedding"]))
    assert np.isfinite(gn) and gn > 0


@pytest.fixture(scope="module")
def pretrain_setup():
    model = Wav2Vec2PretrainModel(TINY)
    rng = np.random.default_rng(3)
    B, T = 2, 400
    audio = jnp.asarray(rng.normal(size=(B, T)), jnp.float32)
    from chimera_st_tpu.models.wav2vec2 import extractor_output_length

    frames = extractor_output_length(T, TINY.conv_spec)
    mask = jnp.asarray(compute_mask_indices((B, frames), None, 0.5, 3, rng=rng))
    negs = jnp.asarray(sample_negative_indices(B, frames, TINY.num_negatives, rng=rng))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        audio, None, mask, negs,
    )
    batch = {
        "audio": audio,
        "audio_padding_mask": None,
        "mask_indices": mask,
        "negative_indices": negs,
        "ntokens": float(np.asarray(mask).sum()),
    }
    return model, params, batch


def test_pretrain_forward(pretrain_setup):
    model, params, batch = pretrain_setup
    out = model.apply(
        params, batch["audio"], None, batch["mask_indices"],
        batch["negative_indices"], deterministic=True,
    )
    B, F = batch["mask_indices"].shape
    assert out["logits"].shape == (B, F, 1 + TINY.num_negatives)
    assert np.isfinite(np.asarray(out["features_pen"]))


def test_wav2vec_criterion_trains(pretrain_setup):
    model, params, batch = pretrain_setup
    crit = CRITERIONS.get("wav2vec")({})
    loss, ss, logging = crit(
        model, params, batch,
        rngs={"dropout": jax.random.PRNGKey(0)}, train=True,
    )
    assert np.isfinite(float(loss)) and float(ss) > 0
    assert 0 <= float(logging["n_correct"]) <= float(logging["total"])

    # gradient flows to codebook and mask embedding
    def loss_fn(p):
        return crit(model, p, batch, rngs={"dropout": jax.random.PRNGKey(0)}, train=True)[0]

    g = jax.grad(loss_fn)(params)
    gn = float(
        jnp.linalg.norm(g["params"]["quantizer"]["codebook"].astype(jnp.float32))
    )
    assert gn > 0
    assert float(jnp.linalg.norm(g["params"]["mask_emb"])) > 0


def test_raw_audio_dataset_collater(tmp_path):
    from chimera_st_tpu.data.audio import write_wav
    from chimera_st_tpu.data.raw_audio_dataset import RawAudioDataset

    rng = np.random.default_rng(4)
    rows = []
    for i in range(3):
        n = int(rng.integers(600, 1000))
        write_wav(str(tmp_path / f"u{i}.wav"), rng.normal(size=n).astype(np.float32) * 0.1)
        rows.append({"audio": f"u{i}.wav", "n_frames": str(n)})
    ds = RawAudioDataset(
        rows, audio_root=str(tmp_path), max_sample_size=800, min_sample_size=100,
        num_negatives=4, frames_fn=lambda n: max(n // 10, 4),
    )
    batch = ds.collater([ds[i] for i in range(3)])
    assert batch["audio"].shape[0] == 3
    assert batch["mask_indices"].shape[0] == 3
    assert batch["negative_indices"].shape[-1] == 4


def test_aligning_loss_bimodal(pretrain_setup):
    """reference: criterions/aligning_loss_bimodal.py — cosine/L2 alignment
    of the two modalities' unmasked context features."""
    model, params, batch = pretrain_setup
    rng = np.random.default_rng(9)
    bimodal = dict(batch)
    bimodal["audio2"] = jnp.asarray(
        rng.normal(size=batch["audio"].shape), jnp.float32
    )
    for loss_kind in ("cosine", "l2"):
        crit = CRITERIONS.get("aligning_loss_bimodal")({"loss": loss_kind})
        loss, ss, logging = crit(model, params, bimodal, train=False)
        assert np.isfinite(float(loss)) and float(ss) > 0
    # identical inputs give ~zero cosine distance
    same = dict(bimodal)
    same["audio2"] = batch["audio"]
    crit = CRITERIONS.get("aligning_loss_bimodal")({"loss": "cosine"})
    loss0, _, _ = crit(model, params, same, train=False)
    np.testing.assert_allclose(float(loss0), 0.0, atol=1e-4)

    # fix_side='text': no gradient reaches params through the text branch
    # alone when both sides share weights (still finite + nonzero overall)
    crit_fix = CRITERIONS.get("aligning_loss_bimodal")(
        {"loss": "cosine", "fix_side": "text"}
    )

    def loss_fn(p):
        return crit_fix(model, p, bimodal, train=False)[0]

    g = jax.grad(loss_fn)(params)
    gn = float(
        jnp.linalg.norm(
            g["params"]["wav2vec_model"]["layers_0"]["fc1"]["kernel"].astype(
                jnp.float32
            )
        )
    )
    assert np.isfinite(gn) and gn > 0


def test_bimodal_task_and_criterion_e2e(tmp_path):
    """bimodal_pretraining end to end: aligned audio+audio2 manifest rows ->
    shared mask/negative indices -> wav2vec_bimodal criterion (reference:
    tasks/bimodal_pretraining.py:22-163 + wav2vec2_quasiwave
    bimodal_forward)."""
    from chimera_st_tpu.data.audio import write_wav
    from chimera_st_tpu.tasks import setup_task

    rng = np.random.default_rng(11)
    rows = []
    for i in range(3):
        n = int(rng.integers(500, 800))
        write_wav(str(tmp_path / f"a{i}.wav"),
                  rng.normal(size=n).astype(np.float32) * 0.1)
        write_wav(str(tmp_path / f"b{i}.wav"),
                  rng.normal(size=n).astype(np.float32) * 0.1)
        rows.append(f"a{i}.wav\t{n}\tb{i}.wav\t{n}")
    with open(tmp_path / "train.tsv", "w") as f:
        f.write("audio\tn_frames\taudio2\tn_frames2\n" + "\n".join(rows) + "\n")

    task = setup_task({
        "_name": "bimodal_pretraining", "data": str(tmp_path),
        "min_sample_size": 100, "max_sample_size": 1000,
        "conv_spec": TINY.conv_spec, "num_negatives": TINY.num_negatives,
    })
    task.load_dataset("train")
    ds = task.dataset("train")
    assert len(ds) == 3
    batch = ds.collater([ds[i] for i in range(3)])
    assert batch["audio"].shape == batch["audio2"].shape
    assert batch["mask_indices"].shape[0] == 3  # one shared mask set

    model = task.build_model(
        {k: getattr(TINY, k) for k in (
            "encoder_embed_dim", "encoder_ffn_dim", "encoder_layers",
            "encoder_heads", "conv_spec", "final_dim", "latent_vars",
            "latent_groups", "num_negatives", "conv_pos", "conv_pos_groups",
        )}
    )
    params = model.init(
        {"params": jax.random.PRNGKey(0), "gumbel": jax.random.PRNGKey(1)},
        jnp.asarray(batch["audio"]), None,
        jnp.asarray(batch["mask_indices"]),
        jnp.asarray(batch["negative_indices"]),
    )
    crit = CRITERIONS.get("wav2vec_bimodal")({})
    jb = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
          for k, v in batch.items()}
    loss, ss, logging = crit(model, params, jb, train=False)
    assert np.isfinite(float(loss))
    assert "d0_contrastive" in logging or any(
        k.startswith("d0_") for k in logging
    )
