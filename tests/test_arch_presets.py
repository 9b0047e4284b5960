"""Reference arch-name parity: the preset names fairseq registers must
resolve here with the reference's parameter deltas, and the new lamb
optimizer / bpe + criterion aliases must be functional (reference:
models/transformer.py:988-1025, transformer_lm.py:310-393,
masked_lm.py:344-403, bart/model.py:356-370, nat/*.py presets,
optim/fused_lamb.py, data/encoders/hf_bert_bpe.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import chimera_st_tpu.criterions  # noqa: F401
import chimera_st_tpu.models  # noqa: F401
import chimera_st_tpu.tasks  # noqa: F401
from chimera_st_tpu.config.registry import ARCHITECTURES, BPE, CRITERIONS


@pytest.mark.quick
def test_reference_preset_deltas():
    """Spot-check the parameter deltas against the reference bodies."""
    def resolve(name, cfg=None):
        model_name, preset = ARCHITECTURES.get(name)
        return model_name, preset(dict(cfg or {}))

    _, big = resolve("transformer_vaswani_wmt_en_de_big")
    assert (big["encoder_embed_dim"], big["encoder_ffn_dim"],
            big["encoder_heads"], big["dropout"]) == (1024, 4096, 16, 0.3)
    # the reference pins DECODER heads/dims too (transformer.py:999-1001)
    assert (big["decoder_embed_dim"], big["decoder_ffn_dim"],
            big["decoder_heads"]) == (1024, 4096, 16)
    _, wmt_big = resolve("transformer_wmt_en_de_big")
    assert wmt_big["decoder_heads"] == 16 and wmt_big["attention_dropout"] == 0.1
    _, fr = resolve("transformer_vaswani_wmt_en_fr_big")
    assert fr["dropout"] == 0.1 and fr["encoder_embed_dim"] == 1024
    _, t2t = resolve("transformer_wmt_en_de_big_t2t")
    assert t2t["encoder_normalize_before"] and t2t["activation_dropout"] == 0.1

    _, gpt = resolve("transformer_lm_gpt")
    assert (gpt["embed_dim"], gpt["ffn_dim"], gpt["layers"], gpt["heads"],
            gpt["activation"]) == (768, 3072, 12, 12, "gelu")
    _, gpt2b = resolve("transformer_lm_gpt2_big")
    assert (gpt2b["embed_dim"], gpt2b["layers"], gpt2b["heads"]) == (1600, 48, 25)
    _, wiki = resolve("transformer_lm_wiki103")
    assert wiki["layers"] == 16 and wiki["adaptive_softmax_cutoffs"] == (20000, 60000)
    mn, gbw = resolve("transformer_lm_baevski_gbw")
    assert mn == "transformer_lm" and gbw["embed_dim"] == 512 and gbw["ffn_dim"] == 4096

    _, bb = resolve("bert_base")
    assert (bb["embed_dim"], bb["layers"], bb["sentence_class_num"]) == (768, 12, 2)
    _, bl = resolve("bert_large")
    assert (bl["embed_dim"], bl["layers"], bl["heads"]) == (1024, 24, 16)
    _, xlm = resolve("xlm_base")
    assert (xlm["embed_dim"], xlm["layers"], xlm["sentence_class_num"]) == (1024, 6, 0)

    _, mb = resolve("mbart_base")
    assert mb["no_scale_embedding"] is False and mb["encoder_embed_dim"] == 768
    _, mbw = resolve("mbart_base_wmt20")
    assert mbw["layernorm_embedding"] is False

    _, lev = resolve("levenshtein_transformer_vaswani_wmt_en_de_big")
    assert lev["encoder_embed_dim"] == 1024 and lev["dropout"] == 0.3
    assert lev["decoder_heads"] == 16
    _, levb = resolve("levenshtein_transformer_wmt_en_de_big")
    assert levb["encoder_normalize_before"] and levb["attention_dropout"] == 0.1

    _, sp = resolve("s2t_transformer_sp")
    assert sp["encoder_layers"] == 16 and sp["encoder_embed_dim"] == 256
    _, lp = resolve("s2t_transformer_lp")
    assert lp["encoder_layers"] == 16 and lp["encoder_embed_dim"] == 1024

    _, fr_conv = resolve("fconv_wmt_en_fr")
    assert fr_conv["embed_dim"] == 768 and len(fr_conv["encoder_layers"]) == 15
    _, gbw_conv = resolve("fconv_lm_dauphin_gbw")
    assert gbw_conv["embed_dim"] == 128 and len(gbw_conv["layers"]) == 40
    _, lc = resolve("lightconv_wmt_zh_en_big")
    assert lc["dropout"] == 0.2 and lc["embed_dim"] == 1024
    _, lclm = resolve("lightconv_lm_gbw")
    assert lclm["ffn_dim"] == 4096 and lclm["heads"] == 16

    # overrides always win over preset defaults (setdefault chaining)
    _, small = resolve("transformer_vaswani_wmt_en_de_big",
                       {"encoder_embed_dim": 16})
    assert small["encoder_embed_dim"] == 16


@pytest.mark.quick
def test_preset_builds_tiny_model():
    """A reference-named preset + tiny overrides builds and runs."""
    from chimera_st_tpu.models import build_model_from_arch

    model = build_model_from_arch("transformer_lm_gpt", {
        "vocab_size": 16, "embed_dim": 8, "ffn_dim": 16, "layers": 1,
        "heads": 2, "dropout": 0.0, "attention_dropout": 0.0,
    })
    toks = jnp.asarray([[2, 4, 5, 6]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), toks)
    logits = model.apply(params, toks)
    assert logits.shape == (1, 4, 16)
    assert model.cfg.activation == "gelu"


@pytest.mark.quick
def test_lamb_optimizer_updates():
    """reference: optim/fused_lamb.py 'lamb' — optax.lamb step changes params
    and respects weight decay config plumbing."""
    from chimera_st_tpu.optim.optimizers import build_optimizer

    tx = build_optimizer({"_name": "lamb", "weight_decay": 0.01},
                         lambda step: 1e-2, clip_norm=1.0)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    state = tx.init(params)
    grads = {"w": jnp.full((4, 4), 0.5), "b": jnp.full((4,), 0.1)}
    updates, state = tx.update(grads, state, params)
    import optax

    new = optax.apply_updates(params, updates)
    assert not np.allclose(np.asarray(new["w"]), np.asarray(params["w"]))
    assert np.isfinite(np.asarray(new["w"])).all()


@pytest.mark.quick
def test_registry_name_aliases():
    assert BPE.get("bert") is BPE.get("hf_bert_bpe")
    assert CRITERIONS.get("legacy_masked_lm_loss") is CRITERIONS.get("legacy_masked_lm")
