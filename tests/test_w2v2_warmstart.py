"""The ST recipe warm-start path: --w2v2-model-path loads a torch wav2vec2
checkpoint (reference: w2v2_transformer.py:255-267 torchHLoad + load_state_dict)
into the interlingua model's trunk."""

import numpy as np
import pytest
import torch

from tests.test_interlingua_model import TINY
from tests.torch_reference import TorchW2V2


def test_train_cli_w2v2_warmstart(tmp_path):
    import jax
    import jax.numpy as jnp

    from chimera_st_tpu.checkpoint.torch_import import (
        import_wav2vec2_state_dict,
        strip_w2v2_pretraining_keys,
    )
    from chimera_st_tpu.cli.train import init_params_for_task
    from chimera_st_tpu.models.interlingua import ChimeraInterlinguaModel

    # a raw wav2vec2 checkpoint: {args: Namespace, model: state_dict}
    torch.manual_seed(0)
    tw2v = TorchW2V2(
        TINY.w2v2_conv_spec, TINY.w2v2_embed_dim, TINY.w2v2_ffn_dim,
        TINY.w2v2_layers, TINY.w2v2_heads, TINY.w2v2_conv_pos,
        TINY.w2v2_conv_pos_groups,
    )
    from argparse import Namespace

    ckpt_path = str(tmp_path / "wav2vec_tiny.pt")
    torch.save({"args": Namespace(encoder_embed_dim=TINY.w2v2_embed_dim),
                "model": tw2v.state_dict()}, ckpt_path)

    model = ChimeraInterlinguaModel(TINY)

    class _Args:
        seed = 0
        w2v2_model_path = ckpt_path

    params = init_params_for_task(model, None, _Args())
    # the trunk now carries the torch weights
    imported = import_wav2vec2_state_dict(
        strip_w2v2_pretraining_keys(tw2v.state_dict())
    )
    got = params["params"]["wav2vec_model"]["post_extract_proj"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(imported["post_extract_proj"]["kernel"]),
        atol=1e-6,
    )

    # and the model still runs end to end with the warm-started trunk
    wav = jnp.asarray(np.random.default_rng(0).normal(size=(1, 400)), jnp.float32)
    logits = model.apply(
        params, wav, jnp.zeros((1, 400), bool), jnp.asarray([[2, 4]], jnp.int32)
    )
    assert np.isfinite(np.asarray(logits)).all()

    # trunk outputs match the torch reference exactly
    with torch.no_grad():
        ref_feat, _ = tw2v.extract_features(
            torch.tensor(np.asarray(wav)), torch.zeros(1, 400, dtype=torch.bool)
        )
    from chimera_st_tpu.models.wav2vec2 import Wav2Vec2Encoder

    trunk = Wav2Vec2Encoder(
        encoder_embed_dim=TINY.w2v2_embed_dim, encoder_ffn_dim=TINY.w2v2_ffn_dim,
        encoder_layers=TINY.w2v2_layers, encoder_heads=TINY.w2v2_heads,
        conv_spec=TINY.w2v2_conv_spec, conv_pos=TINY.w2v2_conv_pos,
        conv_pos_groups=TINY.w2v2_conv_pos_groups,
    )
    feat, _ = trunk.apply(
        {"params": params["params"]["wav2vec_model"]}, wav, jnp.zeros((1, 400), bool)
    )
    np.testing.assert_allclose(
        np.asarray(feat), ref_feat.numpy(), atol=2e-4
    )
