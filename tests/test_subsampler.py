import jax
import jax.numpy as jnp
import numpy as np

from chimera_st_tpu.models.subsampler import Conv1dSubsampler, glu, subsampled_length


def test_subsampled_length_matches_reference_formula():
    # reference: ((L - 1) / 2 + 1).floor() per layer
    for L in [1, 2, 5, 10, 49, 100]:
        expect = L
        for _ in range(2):
            expect = int(np.floor((expect - 1) / 2 + 1))
        assert subsampled_length(L, 2) == expect


def test_subsampler_matches_torch():
    import torch

    B, T, cin, cmid, cout = 2, 20, 6, 8, 4
    x = np.random.default_rng(0).normal(size=(B, T, cin)).astype(np.float32)
    sub = Conv1dSubsampler(cin, cmid, cout, (5, 5))
    params = sub.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = params["params"]

    conv0 = torch.nn.Conv1d(cin, cmid, 5, stride=2, padding=2)
    conv1 = torch.nn.Conv1d(cmid // 2, cout * 2, 5, stride=2, padding=2)
    with torch.no_grad():
        conv0.weight.copy_(
            torch.tensor(np.asarray(p["conv_layers_0"]["kernel"]).transpose(2, 1, 0))
        )
        conv0.bias.copy_(torch.tensor(np.asarray(p["conv_layers_0"]["bias"])))
        conv1.weight.copy_(
            torch.tensor(np.asarray(p["conv_layers_1"]["kernel"]).transpose(2, 1, 0))
        )
        conv1.bias.copy_(torch.tensor(np.asarray(p["conv_layers_1"]["bias"])))
        t = torch.tensor(x).transpose(1, 2)
        t = torch.nn.functional.glu(conv0(t), dim=1)
        t = torch.nn.functional.glu(conv1(t), dim=1)
        ref = t.transpose(1, 2).numpy()

    out = np.asarray(sub.apply(params, jnp.asarray(x)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_glu():
    x = jnp.asarray([[1.0, 2.0, 0.0, 0.0]])
    y = np.asarray(glu(x))
    np.testing.assert_allclose(y, [[0.5, 1.0]], atol=1e-6)
