"""Transformer decoder with tied embeddings and functional KV caches.

TPU-native rebuild of the reference decoder
(reference: fairseq/models/transformer.py:530-879 TransformerDecoder /
fairseq/models/speech_to_text/s2t_transformer.py TransformerDecoderScriptable):

- full-sequence teacher-forced forward for training,
- `step`: single-token incremental decode against preallocated HBM caches
  (replaces the reference's UUID-keyed incremental-state + dynamic reorder;
  beam reorder is a gather over the cache pytree done by the generator),
- sinusoidal positions with fairseq's padding_idx offset so positions match
  released checkpoints bit-for-bit (they are parameter-free).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .embedding import Embed
from .layers import (
    LayerNorm,
    TransformerDecoderLayer,
    position_at_step,
    positional_embedding_from_mask,
)

Dtype = Any


class TransformerDecoder(nn.Module):
    vocab_size: int
    embed_dim: int = 512
    ffn_dim: int = 2048
    num_layers: int = 6
    num_heads: int = 8
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    activation: str = "relu"
    normalize_before: bool = True
    padding_idx: int = 1
    share_input_output_embed: bool = True
    no_scale_embedding: bool = False
    max_target_positions: int = 1024
    causal: bool = True  # False: bidirectional (CMLM / mask-predict)
    learned_pos: bool = False  # BART-style learned positions
    layernorm_embedding: bool = False
    # train-time layer skipping (reference: --decoder-layerdrop +
    # fairseq/modules/layer_drop.py); inference always runs every layer
    layerdrop: float = 0.0
    # pipeline parallelism over the layer stack (parallel/pipeline.py;
    # reference capability: pipeline_parallel_transformer via fairscale Pipe,
    # model_parallel/models/pipeline_parallel_transformer/model.py:44-120).
    # pipeline_mesh must carry a `pipe` axis of size pipeline_stages (and
    # optionally a `data` axis the batch is sharded over). Engaged for the
    # teacher-forced full-sequence forward with no cross-attention and no
    # dropout; init and incremental decode always use the plain layer loop,
    # so the param tree is identical either way.
    pipeline_mesh: Any = None
    pipeline_stages: int = 0
    pipeline_chunks: int = 0
    pipeline_remat: bool = False
    # character-aware input embeddings (reference: --character-embeddings +
    # modules/character_token_embedder.py): dict with word_to_char /
    # char_embed_dim / filters / highway_layers; forces a separate output
    # projection (no input-output sharing)
    char_embedder_cfg: Any = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        if self.char_embedder_cfg is not None:
            from .character_embedder import (
                DEFAULT_FILTERS,
                CharacterTokenEmbedder,
            )

            cc = dict(self.char_embedder_cfg)
            self.embed_tokens = CharacterTokenEmbedder(
                word_to_char=cc["word_to_char"],
                word_embed_dim=self.embed_dim,
                char_embed_dim=int(cc.get("char_embed_dim", 4)),
                filters=tuple(cc.get("filters") or DEFAULT_FILTERS),
                highway_layers=int(cc.get("highway_layers", 2)),
                pad_idx=self.padding_idx,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="embed_tokens",
            )
        else:
            self.embed_tokens = Embed(
                self.vocab_size,
                self.embed_dim,
                padding_idx=self.padding_idx,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="embed_tokens",
            )
        if self.learned_pos:
            self.embed_positions = Embed(
                self.max_target_positions + self.padding_idx + 1,
                self.embed_dim,
                padding_idx=self.padding_idx,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="embed_positions",
            )
        if self.layernorm_embedding:
            self.layernorm_embedding_mod = LayerNorm(
                self.embed_dim, dtype=self.dtype
            )
        self.layers = [
            TransformerDecoderLayer(
                self.embed_dim,
                self.ffn_dim,
                self.num_heads,
                dropout=self.dropout,
                attention_dropout=self.attention_dropout,
                activation_dropout=self.activation_dropout,
                activation=self.activation,
                normalize_before=self.normalize_before,
                causal=self.causal,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layers_{i}",
            )
            for i in range(self.num_layers)
        ]
        if self.normalize_before:
            self.layer_norm = LayerNorm(self.embed_dim, dtype=self.dtype)
        else:
            self.layer_norm = None
        if not self.share_input_output_embed or self.char_embedder_cfg is not None:
            self.output_projection = nn.Dense(
                self.vocab_size,
                use_bias=False,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="output_projection",
            )
        self.embed_scale = 1.0 if self.no_scale_embedding else math.sqrt(self.embed_dim)
        self.dropout_layer = nn.Dropout(self.dropout)

    def _output_layer(self, x: jax.Array) -> jax.Array:
        if self.share_input_output_embed and self.char_embedder_cfg is None:
            return self.embed_tokens.attend(x)
        return self.output_projection(x)

    def __call__(
        self,
        prev_output_tokens: jax.Array,  # [B, T] int
        encoder_out: jax.Array,  # [B, S, C]
        encoder_padding_mask: Optional[jax.Array] = None,  # [B, S]
        deterministic: bool = True,
        features_only: bool = False,
    ) -> jax.Array:
        """Teacher-forced forward -> logits [B, T, V] (fp32)."""
        pad_mask = prev_output_tokens == self.padding_idx
        x = self.embed_scale * self.embed_tokens(prev_output_tokens)
        if self.learned_pos:
            nonpad = (~pad_mask).astype(jnp.int32)
            pos_ids = jnp.cumsum(nonpad, axis=1) * nonpad + self.padding_idx
            pos = self.embed_positions(pos_ids)
        else:
            pos = positional_embedding_from_mask(
                pad_mask, self.embed_dim, self.padding_idx
            )
        x = x + pos.astype(x.dtype)
        if self.layernorm_embedding:
            x = self.layernorm_embedding_mod(x)
        x = self.dropout_layer(x, deterministic=deterministic)

        if (
            self.pipeline_mesh is not None
            and self.pipeline_stages > 1
            and self.layerdrop == 0.0
            and not self.is_initializing()
        ):
            piped = self._pipelined_layers(
                x, pad_mask, encoder_out, encoder_padding_mask
            )
            if piped is not None:  # None: ragged batch -> sequential loop
                x = piped
                if self.layer_norm is not None:
                    x = self.layer_norm(x)
                if features_only:
                    return x
                return self._output_layer(x)

        for i, layer in enumerate(self.layers):
            if self.layerdrop > 0.0 and not deterministic:
                from .layers import maybe_layer_drop

                rng = jax.random.fold_in(self.make_rng("dropout"), 2000 + i)
                x = maybe_layer_drop(
                    lambda v: layer(
                        v,
                        encoder_out=encoder_out,
                        encoder_padding_mask=encoder_padding_mask,
                        self_attn_padding_mask=pad_mask,
                        deterministic=deterministic,
                    )[0],
                    x, self.layerdrop, rng, deterministic=deterministic,
                )
            else:
                x, _ = layer(
                    x,
                    encoder_out=encoder_out,
                    encoder_padding_mask=encoder_padding_mask,
                    self_attn_padding_mask=pad_mask,
                    deterministic=deterministic,
                )
        if self.layer_norm is not None:
            x = self.layer_norm(x)
        if features_only:
            return x
        return self._output_layer(x)

    def _pipelined_layers(
        self,
        x: jax.Array,
        pad_mask: jax.Array,
        encoder_out: Optional[jax.Array] = None,
        encoder_padding_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Run the layer stack through the GPipe schedule.

        The per-layer param subtrees are stacked at trace time and sharded
        over the `pipe` mesh axis by shard_map; grads flow back to the
        original per-layer subtrees, so the optimizer and checkpoints are
        unchanged. Cross-attention inputs ride along as per-microbatch
        extras (every stage attends to its microbatch's encoder states —
        the reference's pipeline_decoder_balance path moves encoder_out
        between devices the same way). Dropout inside the stack is
        unsupported on this path (all three dropout rates must be 0;
        asserted at build) — rng plumbing through the schedule is not
        worth the parity risk. Returns None for ragged batches (the caller
        falls back to the sequential loop)."""
        from ..parallel.pipeline import pipelined_layer_stack

        per_layer = [
            self.variables["params"][f"layers_{i}"]
            for i in range(self.num_layers)
        ]
        layer_tmpl = TransformerDecoderLayer(
            self.embed_dim,
            self.ffn_dim,
            self.num_heads,
            dropout=0.0,
            attention_dropout=0.0,
            activation_dropout=0.0,
            activation=self.activation,
            normalize_before=self.normalize_before,
            causal=self.causal,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            parent=None,
        )

        if encoder_out is None:  # decoder-only (LM)

            def layer_apply(p, h, pmask):
                y, _ = layer_tmpl.apply(
                    {"params": p}, h,
                    encoder_out=None, encoder_padding_mask=None,
                    self_attn_padding_mask=pmask, deterministic=True,
                )
                return y

            extras = (pad_mask,)
        else:
            if encoder_padding_mask is None:
                encoder_padding_mask = jnp.zeros(
                    encoder_out.shape[:2], bool
                )

            def layer_apply(p, h, pmask, enc, emask):
                y, _ = layer_tmpl.apply(
                    {"params": p}, h,
                    encoder_out=enc, encoder_padding_mask=emask,
                    self_attn_padding_mask=pmask, deterministic=True,
                )
                return y

            extras = (pad_mask, encoder_out, encoder_padding_mask)

        return pipelined_layer_stack(
            per_layer, layer_apply, x, extras,
            mesh=self.pipeline_mesh,
            stages=self.pipeline_stages,
            chunks=self.pipeline_chunks,
            remat=self.pipeline_remat,
        )

    def cross_attention_weights(
        self,
        prev_output_tokens: jax.Array,
        encoder_out: jax.Array,
        encoder_padding_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        """[B, T, S] head-averaged cross-attention of the LAST layer over a
        teacher-forced pass (reference: SequenceGeneratorWithAlignment,
        sequence_generator.py:906 — alignments from attention weights)."""
        pad_mask = prev_output_tokens == self.padding_idx
        x = self.embed_scale * self.embed_tokens(prev_output_tokens)
        if self.learned_pos:
            nonpad = (~pad_mask).astype(jnp.int32)
            pos_ids = jnp.cumsum(nonpad, axis=1) * nonpad + self.padding_idx
            pos = self.embed_positions(pos_ids)
        else:
            pos = positional_embedding_from_mask(
                pad_mask, self.embed_dim, self.padding_idx
            )
        x = x + pos.astype(x.dtype)
        if self.layernorm_embedding:
            x = self.layernorm_embedding_mod(x)
        for layer in self.layers[:-1]:
            x, _ = layer(
                x,
                encoder_out=encoder_out,
                encoder_padding_mask=encoder_padding_mask,
                self_attn_padding_mask=pad_mask,
            )
        return self.layers[-1].encoder_attn_weights(
            x, encoder_out, encoder_padding_mask, pad_mask
        )

    # ------------------------------------------------------- incremental API

    def init_cache(self, batch: int, max_len: int) -> List[Dict[str, jax.Array]]:
        # time-major [L, H, D, B]: beam dim minor (see MultiheadAttention
        # cached branch for the layout rationale)
        head_dim = self.embed_dim // self.num_heads
        shape = (max_len, self.num_heads, head_dim, batch)
        return [
            {
                "k": jnp.zeros(shape, self.dtype),
                "v": jnp.zeros(shape, self.dtype),
            }
            for _ in range(self.num_layers)
        ]

    def precompute_encoder_kv(
        self, encoder_out: jax.Array
    ) -> List[Tuple[jax.Array, jax.Array]]:
        return [layer.compute_encoder_kv(encoder_out) for layer in self.layers]

    def step(
        self,
        tokens_t: jax.Array,  # [B, 1] int — token at current step
        step_index: jax.Array,  # scalar int
        caches: List[Dict[str, jax.Array]],
        encoder_kv: List[Tuple[jax.Array, jax.Array]],
        encoder_padding_mask: Optional[jax.Array] = None,
        cache_ancestry: Optional[jax.Array] = None,  # [L, B]: lazy beam reorder
        ancestry_groups: int = 1,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, List[Dict[str, jax.Array]]]:
        """One decode step -> (logits [B, V] fp32, new caches).

        ``deterministic=False`` keeps dropout active inside the decode loop
        (--retain-dropout, reference sequence_generator.py retain_dropout);
        the caller must provide a 'dropout' rng via apply(rngs=...)."""
        x = self.embed_scale * self.embed_tokens(tokens_t)
        if self.learned_pos:
            pos = self.embed_positions(
                jnp.full((1, 1), 0, jnp.int32) + self.padding_idx + 1 + step_index
            )[0, 0]
        else:
            pos = position_at_step(
                step_index, self.embed_dim, self.padding_idx,
                self.max_target_positions,
            )
        x = x + pos[None, None, :].astype(x.dtype)
        if self.layernorm_embedding:
            x = self.layernorm_embedding_mod(x)
        if not deterministic:
            # embedding dropout, matching the full forward's placement
            # (extract_features applies it before the layer stack)
            x = self.dropout_layer(x, deterministic=False)

        if encoder_kv is None:  # decoder-only (LM) stepping
            encoder_kv = [None] * len(self.layers)
        new_caches = []
        for layer, cache, ekv in zip(self.layers, caches, encoder_kv):
            x, new_cache = layer(
                x,
                encoder_kv=ekv,
                encoder_padding_mask=encoder_padding_mask,
                self_cache=cache,
                cache_index=step_index,
                cache_ancestry=cache_ancestry,
                ancestry_groups=ancestry_groups,
                deterministic=deterministic,
            )
            new_caches.append(new_cache)
        if self.layer_norm is not None:
            x = self.layer_norm(x)
        return self._output_layer(x)[:, 0, :], new_caches
