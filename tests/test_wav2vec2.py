import jax
import jax.numpy as jnp
import numpy as np

from chimera_st_tpu.models.wav2vec2 import (
    ConvFeatureExtractor,
    ConvPositionalEmbedding,
    Wav2Vec2Encoder,
    downsample_padding_mask,
    extractor_output_length,
)


def test_extractor_output_length():
    # 16kHz 1s audio -> ~49 frames (320x downsample, edge effects)
    assert extractor_output_length(16000) == 49
    assert extractor_output_length(320) == 0 or extractor_output_length(320) >= 0


def test_conv_extractor_matches_torch():
    import torch

    spec = ((8, 10, 5), (8, 3, 2))
    x = np.random.default_rng(0).normal(size=(2, 100)).astype(np.float32)
    fe = ConvFeatureExtractor(conv_spec=spec)
    params = fe.init(jax.random.PRNGKey(0), jnp.asarray(x))

    p = params["params"]
    conv0 = torch.nn.Conv1d(1, 8, 10, stride=5, bias=False)
    conv1 = torch.nn.Conv1d(8, 8, 3, stride=2, bias=False)
    gn = torch.nn.GroupNorm(8, 8)
    with torch.no_grad():
        # flax conv kernel [k, in, out] -> torch [out, in, k]
        conv0.weight.copy_(torch.tensor(np.asarray(p["conv_0"]["kernel"]).transpose(2, 1, 0)))
        conv1.weight.copy_(torch.tensor(np.asarray(p["conv_1"]["kernel"]).transpose(2, 1, 0)))
        gn.weight.copy_(torch.tensor(np.asarray(p["group_norm"]["scale"])))
        gn.bias.copy_(torch.tensor(np.asarray(p["group_norm"]["bias"])))
        t = torch.tensor(x).unsqueeze(1)
        t = torch.nn.functional.gelu(gn(conv0(t)))
        t = torch.nn.functional.gelu(conv1(t))
        ref = t.transpose(1, 2).numpy()

    out = np.asarray(fe.apply(params, jnp.asarray(x)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_pos_conv_matches_torch():
    import torch

    dim, kernel, groups = 16, 8, 4
    x = np.random.default_rng(1).normal(size=(2, 12, dim)).astype(np.float32)
    pe = ConvPositionalEmbedding(dim, kernel=kernel, groups=groups)
    params = pe.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = params["params"]["conv"]

    conv = torch.nn.Conv1d(dim, dim, kernel, padding=kernel // 2, groups=groups)
    with torch.no_grad():
        # flax grouped conv kernel [k, in/groups, out] -> torch [out, in/groups, k]
        conv.weight.copy_(torch.tensor(np.asarray(p["kernel"]).transpose(2, 1, 0)))
        conv.bias.copy_(torch.tensor(np.asarray(p["bias"])))
        y = conv(torch.tensor(x).transpose(1, 2))
        y = y[:, :, :-1]  # SamePad for even kernel
        ref = torch.nn.functional.gelu(y).transpose(1, 2).numpy()

    out = np.asarray(pe.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_downsample_padding_mask_rule():
    # reference rule: chop remainder, frame padded iff ALL samples in block padded
    mask = np.zeros((1, 10), bool)
    mask[0, 6:] = True  # 6 valid, 4 pad
    out = np.asarray(downsample_padding_mask(jnp.asarray(mask), 3))
    # blocks of 3 (last sample chopped): [0:3]=valid, [3:6]=valid, [6:9]=all pad
    assert out.tolist() == [[False, False, True]]


def test_w2v2_encoder_shapes_and_padding_invariance():
    enc = Wav2Vec2Encoder(
        encoder_embed_dim=16,
        encoder_ffn_dim=32,
        encoder_layers=2,
        encoder_heads=2,
        conv_spec=((8, 10, 5), (16, 3, 2)),
        conv_pos=8,
        conv_pos_groups=4,
    )
    rng = np.random.default_rng(2)
    wav = rng.normal(size=(2, 200)).astype(np.float32)
    mask = np.zeros((2, 200), bool)
    mask[1, 120:] = True
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(wav), jnp.asarray(mask))
    x, out_mask = enc.apply(params, jnp.asarray(wav), jnp.asarray(mask))
    assert x.shape[0] == 2 and x.shape[2] == 16
    assert out_mask.shape == x.shape[:2]
    assert np.isfinite(np.asarray(x)).all()
