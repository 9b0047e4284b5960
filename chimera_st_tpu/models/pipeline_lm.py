"""Capacity pipeline-parallel transformer LM: persistently stacked layers.

The reference's `pipeline_parallel_transformer` (reference:
fairseq/model_parallel/models/pipeline_parallel_transformer/model.py:44-120)
physically places module shards on different devices and rewrites state
dicts between the two layouts (`convert_to_pipeline_parallel_state_dict`,
model.py:336). The plain `--pipeline-stages` path on `transformer_lm`
keeps params in their per-layer subtrees (replicated; throughput-only —
see parallel/pipeline.py). THIS model is the capacity variant:

- the layer stack's params are created ALREADY STACKED on a leading
  ``[L, ...]`` axis via ``nn.scan`` (the TPU-idiomatic scan-over-layers
  layout), so a PartitionSpec of ``P('pipe')`` on that axis gives every
  device persistent residency of ONLY its own stage's layers — weights
  and optimizer moments included (`parallel/partition.py` applies the
  spec whenever the mesh carries a ``pipe`` axis),
- the forward either runs the GPipe schedule (`pipeline_apply`) over the
  stacked tree, or falls back to the sequential ``nn.scan`` body (init,
  ragged tail batches, no mesh),
- `stack_lm_params` / `unstack_lm_params` convert plain `transformer_lm`
  checkpoints to/from this layout — the analog of the reference's
  state-dict converter.

Arch name: ``transformer_lm_pipe`` (CLI: ``--arch transformer_lm_pipe
--pipeline-stages N``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.registry import register_model, register_model_architecture
from .embedding import Embed
from .layers import (
    LayerNorm,
    TransformerDecoderLayer,
    positional_embedding_from_mask,
)
from .transformer_mt import TransformerLMConfig

Dtype = Any


class _ScanLayer(nn.Module):
    """One causal decoder layer as an nn.scan body (inner name fixed to
    ``layer`` so the stacked param tree is ``scan_layers/layer/...``)."""

    embed_dim: int
    ffn_dim: int
    num_heads: int
    activation: str
    normalize_before: bool
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, _):
        x, pad_mask = carry
        y, _cache = TransformerDecoderLayer(
            self.embed_dim,
            self.ffn_dim,
            self.num_heads,
            dropout=0.0,
            attention_dropout=0.0,
            activation_dropout=0.0,
            activation=self.activation,
            normalize_before=self.normalize_before,
            causal=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="layer",
        )(
            x,
            encoder_out=None,
            encoder_padding_mask=None,
            self_attn_padding_mask=pad_mask,
            deterministic=True,
        )
        return (y, pad_mask), None


class PipelinedTransformerLM(nn.Module):
    """Decoder-only LM with a scanned (stacked-param) layer stack."""

    cfg: TransformerLMConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    pipeline_mesh: Any = None

    def setup(self):
        c = self.cfg
        self.embed_tokens = Embed(
            c.vocab_size, c.embed_dim, padding_idx=c.padding_idx,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="embed_tokens",
        )
        stack = nn.scan(
            _ScanLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=c.layers,
        )
        self.scan_layers = stack(
            c.embed_dim, c.ffn_dim, c.heads,
            activation=c.activation, normalize_before=c.normalize_before,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="scan_layers",
        )
        if c.normalize_before:
            self.layer_norm = LayerNorm(c.embed_dim, dtype=self.dtype)
        else:
            self.layer_norm = None
        self.embed_scale = math.sqrt(c.embed_dim)

    def __call__(self, tokens: jax.Array, deterministic: bool = True):
        """[B, T] tokens -> logits [B, T, V] (causal, tied output)."""
        c = self.cfg
        pad_mask = tokens == c.padding_idx
        x = self.embed_scale * self.embed_tokens(tokens)
        pos = positional_embedding_from_mask(
            pad_mask, c.embed_dim, c.padding_idx
        )
        x = x + pos.astype(x.dtype)

        piped = None
        if (
            self.pipeline_mesh is not None
            and c.pipeline_stages > 1
            and not self.is_initializing()
        ):
            piped = self._pipelined(x, pad_mask)
        if piped is not None:
            x = piped
        else:  # init pass, pipeline off, or ragged tail batch
            (x, _), _ = self.scan_layers((x, pad_mask), None)

        if self.layer_norm is not None:
            x = self.layer_norm(x)
        return self.embed_tokens.attend(x)

    def _pipelined(self, x: jax.Array, pad_mask: jax.Array):
        from ..parallel.pipeline import pipelined_layer_stack

        c = self.cfg
        stacked = self.variables["params"]["scan_layers"]["layer"]
        layer_tmpl = TransformerDecoderLayer(
            c.embed_dim, c.ffn_dim, c.heads,
            dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
            activation=c.activation, normalize_before=c.normalize_before,
            causal=True, dtype=self.dtype, param_dtype=self.param_dtype,
            parent=None,
        )

        def layer_apply(p, h, pmask):
            y, _ = layer_tmpl.apply(
                {"params": p}, h,
                encoder_out=None, encoder_padding_mask=None,
                self_attn_padding_mask=pmask, deterministic=True,
            )
            return y

        return pipelined_layer_stack(
            stacked, layer_apply, x, (pad_mask,),
            mesh=self.pipeline_mesh,
            stages=c.pipeline_stages,
            chunks=c.pipeline_chunks,
            remat=c.pipeline_remat,
        )


def stack_lm_params(lm_variables: Dict, num_layers: int) -> Dict:
    """Plain `transformer_lm` variables -> `transformer_lm_pipe` layout
    (reference analog: convert_to_pipeline_parallel_state_dict)."""
    dec = lm_variables["params"]["decoder"]
    per = [dec[f"layers_{i}"] for i in range(num_layers)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per)
    out = {
        "embed_tokens": dec["embed_tokens"],
        "scan_layers": {"layer": stacked},
    }
    if "layer_norm" in dec:
        out["layer_norm"] = dec["layer_norm"]
    return {"params": out}


def unstack_lm_params(pipe_variables: Dict) -> Dict:
    """Inverse of `stack_lm_params` (save back as plain transformer_lm)."""
    p = pipe_variables["params"]
    stacked = p["scan_layers"]["layer"]
    num_layers = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    dec = {"embed_tokens": p["embed_tokens"]}
    for i in range(num_layers):
        dec[f"layers_{i}"] = jax.tree_util.tree_map(
            lambda a, i=i: a[i], stacked
        )
    if "layer_norm" in p:
        dec["layer_norm"] = p["layer_norm"]
    return {"params": {"decoder": dec}}


@register_model("transformer_lm_pipe")
def build_transformer_lm_pipe(cfg_dict: Dict, dtype=jnp.float32,
                              param_dtype=jnp.float32):
    known = {f.name for f in dataclasses.fields(TransformerLMConfig)}
    d = dict(cfg_dict)
    d.setdefault("vocab_size", d.pop("tgt_vocab_size", 8))
    mesh = d.pop("pipeline_mesh", None)
    cfg = TransformerLMConfig(**{k: v for k, v in d.items() if k in known})
    if cfg.pipeline_stages > 1:
        assert mesh is not None and mesh.shape.get("pipe", 1) == cfg.pipeline_stages, (
            "pipeline_stages > 1 needs a mesh whose `pipe` axis equals the "
            "stage count (train CLI: --pipeline-stages builds it)"
        )
        assert cfg.layers % cfg.pipeline_stages == 0, (
            "layers must divide into pipeline_stages (uniform balance)"
        )
    return PipelinedTransformerLM(cfg, dtype=dtype, param_dtype=param_dtype,
                                  pipeline_mesh=mesh)


@register_model_architecture("transformer_lm_pipe", "transformer_lm_pipe")
def transformer_lm_pipe_base(cfg: Dict) -> Dict:
    cfg.setdefault("embed_dim", 512)
    cfg.setdefault("ffn_dim", 2048)
    cfg.setdefault("layers", 6)
    cfg.setdefault("heads", 8)
    # the scanned stack runs layers without dropout (see parallel/pipeline.py)
    cfg.setdefault("dropout", 0.0)
    return cfg
