"""GPT-2 language model + HuggingFace checkpoint importer.

reference: fairseq/models/huggingface/hf_gpt2.py — the reference wraps
``transformers.GPT2LMHeadModel`` as a fairseq decoder so GPT-2 checkpoints
can drive the language_modeling task. A torch module cannot live inside a
jitted TPU program, so the TPU-native equivalent is (a) a faithful flax
GPT-2 (fused qkv, learned positions, gelu_new, pre-LN, tied lm head) and
(b) ``import_hf_gpt2_state_dict`` mapping ``GPT2LMHeadModel.state_dict()``
weights into it. Parity vs transformers is tested in tests/test_hf_gpt2.py.

Exposes the decoder-only ``(tokens) -> logits [B, T, V]`` surface the
language_modeling task / eval_lm CLI drive.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config.registry import register_model, register_model_architecture

Dtype = Any


@dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    dropout: float = 0.1
    layer_norm_eps: float = 1e-5
    padding_idx: int = 1  # only used for LM-criterion masking


class GPT2Block(nn.Module):
    cfg: GPT2Config
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        D = c.n_embd
        H = c.n_head
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ln1 = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="ln_1")
        ln2 = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype, name="ln_2")
        drop = nn.Dropout(c.dropout)

        residual = x
        h = ln1(x)
        qkv = nn.Dense(3 * D, name="c_attn", **common)(h)  # fused, HF layout
        q, k, v = jnp.split(qkv, 3, axis=-1)
        B, T = h.shape[0], h.shape[1]
        shape = (B, T, H, D // H)
        q, k, v = q.reshape(shape), k.reshape(shape), v.reshape(shape)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.float32(np.sqrt(D // H))
        qi = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        ki = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        logits = jnp.where(ki > qi, -1e9, logits)
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, D)
        attn = nn.Dense(D, name="attn_c_proj", **common)(attn)
        x = residual + drop(attn, deterministic=deterministic)

        residual = x
        h = ln2(x)
        h = nn.Dense(4 * D, name="mlp_c_fc", **common)(h)
        h = jax.nn.gelu(h, approximate=True)  # HF gelu_new
        h = nn.Dense(D, name="mlp_c_proj", **common)(h)
        return residual + drop(h, deterministic=deterministic)


class GPT2LM(nn.Module):
    cfg: GPT2Config
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.wte = nn.Embed(c.vocab_size, c.n_embd, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="wte")
        self.wpe = nn.Embed(c.n_positions, c.n_embd, dtype=self.dtype,
                            param_dtype=self.param_dtype, name="wpe")
        self.blocks = [
            GPT2Block(c, dtype=self.dtype, param_dtype=self.param_dtype,
                      name=f"h_{i}")
            for i in range(c.n_layer)
        ]
        self.ln_f = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                                 name="ln_f")
        self.dropout_layer = nn.Dropout(c.dropout)

    def __call__(self, tokens: jax.Array, deterministic: bool = True):
        """[B, T] -> logits [B, T, V] (causal; lm head tied to wte)."""
        T = tokens.shape[1]
        pos = jnp.arange(T, dtype=jnp.int32)[None, :]
        x = self.wte(tokens) + self.wpe(pos)
        x = self.dropout_layer(x, deterministic=deterministic)
        for block in self.blocks:
            x = block(x, deterministic=deterministic)
        x = self.ln_f(x)
        return self.wte.attend(x).astype(jnp.float32)


def import_hf_gpt2_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """transformers GPT2LMHeadModel.state_dict() -> flax param tree.

    HF's Conv1D stores weights as [in, out] (already the flax Dense kernel
    layout — no transpose); lm_head is tied to wte and skipped."""

    def np_(t):
        return np.ascontiguousarray(t.detach().cpu().numpy())

    p = lambda k: sd[f"transformer.{k}"]
    out: Dict[str, Any] = {
        "wte": {"embedding": np_(p("wte.weight"))},
        "wpe": {"embedding": np_(p("wpe.weight"))},
        "ln_f": {"scale": np_(p("ln_f.weight")), "bias": np_(p("ln_f.bias"))},
    }
    n_layer = 0
    while f"transformer.h.{n_layer}.ln_1.weight" in sd:
        n_layer += 1
    for i in range(n_layer):
        b = f"h.{i}."
        out[f"h_{i}"] = {
            "ln_1": {"scale": np_(p(b + "ln_1.weight")),
                     "bias": np_(p(b + "ln_1.bias"))},
            "ln_2": {"scale": np_(p(b + "ln_2.weight")),
                     "bias": np_(p(b + "ln_2.bias"))},
            "c_attn": {"kernel": np_(p(b + "attn.c_attn.weight")),
                       "bias": np_(p(b + "attn.c_attn.bias"))},
            "attn_c_proj": {"kernel": np_(p(b + "attn.c_proj.weight")),
                            "bias": np_(p(b + "attn.c_proj.bias"))},
            "mlp_c_fc": {"kernel": np_(p(b + "mlp.c_fc.weight")),
                         "bias": np_(p(b + "mlp.c_fc.bias"))},
            "mlp_c_proj": {"kernel": np_(p(b + "mlp.c_proj.weight")),
                           "bias": np_(p(b + "mlp.c_proj.bias"))},
        }
    return {"params": out}


@register_model("hf_gpt2")
def build_hf_gpt2(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    known = {f.name for f in dataclasses.fields(GPT2Config)}
    d = {k: v for k, v in cfg_dict.items() if k in known}
    # fairseq-style aliases (reference: hf_gpt2.py add_args embed-dim etc.)
    alias = {"embed_dim": "n_embd", "layers": "n_layer", "heads": "n_head",
             "max_target_positions": "n_positions"}
    for src, dst in alias.items():
        if src in cfg_dict and dst not in d:
            d[dst] = cfg_dict[src]
    return GPT2LM(GPT2Config(**d), dtype=dtype, param_dtype=param_dtype)


@register_model_architecture("hf_gpt2", "hf_gpt2")
def hf_gpt2_arch(cfg: Dict) -> Dict:
    return dict(cfg)


@register_model_architecture("hf_gpt2", "hf_gpt2_medium")
def hf_gpt2_medium(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("n_embd", 1024)
    d.setdefault("n_layer", 24)
    d.setdefault("n_head", 16)
    return d


@register_model_architecture("hf_gpt2", "hf_gpt2_large")
def hf_gpt2_large(cfg: Dict) -> Dict:
    """reference: models/huggingface/hf_gpt2.py:179-183."""
    d = dict(cfg)
    d.setdefault("n_embd", 1280)
    d.setdefault("n_layer", 36)
    d.setdefault("n_head", 20)
    return d


@register_model_architecture("hf_gpt2", "hf_gpt2_xl")
def hf_gpt2_xl(cfg: Dict) -> Dict:
    """reference: models/huggingface/hf_gpt2.py:187-191."""
    d = dict(cfg)
    d.setdefault("n_embd", 1600)
    d.setdefault("n_layer", 48)
    d.setdefault("n_head", 25)
    return d
