"""Character-aware token embeddings (reference:
fairseq/modules/character_token_embedder.py:22-224, used by
``transformer_lm --character-embeddings`` and lightconv_lm).

Each vocabulary word is spelled as UTF-8 bytes (+1, 0 = char-pad) into a
static [V, max_char_len] table; token embeddings are produced by character
embedding -> per-width 1D convolutions -> max-over-time -> ReLU -> highway
layers -> projection. pad tokens embed to zero; eos/unk get dedicated
learned symbol vectors (reference :138-152).

TPU-native notes: the word->char spelling is a host-built constant folded
into the program (one [V, M] int32 gather per forward — contrast the
reference's per-call ``word_to_char`` CPU indexing), and the per-width
convolutions run as feature-grouped matmuls over the M axis via
lax.conv_general_dilated with BTC layout."""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# reference character_token_embedder.py:15-16
CHAR_PAD_IDX = 0
N_CHARS = 257  # bytes shifted by +1, 0 reserved for pad

DEFAULT_FILTERS: Tuple[Tuple[int, int], ...] = (
    (1, 64), (2, 128), (3, 192), (4, 256),
)


def build_word_to_char(dictionary, max_char_len: int = 50) -> np.ndarray:
    """[V, max_char_len] int32 spelling table (reference set_vocab :68-91):
    byte values + 1, zero-padded; special symbols spell as all-pad (their
    embeddings are overridden anyway)."""
    table = np.zeros((len(dictionary), max_char_len), np.int32)
    truncated = 0
    for i in range(len(dictionary)):
        if i < dictionary.nspecial:
            continue
        chars = dictionary[i].encode()
        if len(chars) > max_char_len:
            truncated += 1
            chars = chars[:max_char_len]
        table[i, : len(chars)] = np.frombuffer(chars, np.uint8).astype(
            np.int32
        ) + 1
    return table


class Highway(nn.Module):
    """Highway layer stack (reference :170-214, AllenNLP form): one Dense to
    2*dim per layer, second half is the carry gate (bias init +1 so the
    stack starts as identity)."""

    dim: int
    num_layers: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            proj = nn.Dense(
                2 * self.dim,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                bias_init=lambda key, shape, dtype: jnp.concatenate(
                    [jnp.zeros(self.dim, dtype), jnp.ones(self.dim, dtype)]
                ),
                name=f"layer_{i}",
            )(x)
            proj_x, gate = jnp.split(proj, 2, axis=-1)
            gate = jax.nn.sigmoid(gate)
            x = gate * x + (1.0 - gate) * jax.nn.relu(proj_x)
        return x


class CharacterTokenEmbedder(nn.Module):
    """Drop-in replacement for the decoder's token embedding table.

    ``word_to_char`` is a host-built numpy constant (build_word_to_char);
    eos/pad/unk indices come from the owning dictionary."""

    word_to_char: Any  # np.ndarray [V, max_char_len] int32 (static)
    word_embed_dim: int
    char_embed_dim: int = 4
    filters: Tuple[Tuple[int, int], ...] = DEFAULT_FILTERS
    highway_layers: int = 2
    pad_idx: int = 1
    eos_idx: int = 2
    unk_idx: int = 3
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        """[...,] int tokens -> [..., word_embed_dim] embeddings."""
        table = jnp.asarray(np.asarray(self.word_to_char), jnp.int32)
        chars = table[tokens]  # [..., M]
        M = chars.shape[-1]
        lead = chars.shape[:-1]

        char_emb = nn.Embed(
            N_CHARS, self.char_embed_dim,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="char_embeddings",
        )(chars)
        # char-pad embeds to zero (reference padding_idx=0)
        char_emb = jnp.where(
            (chars == CHAR_PAD_IDX)[..., None], 0.0, char_emb
        )
        x = char_emb.reshape((-1, M, self.char_embed_dim))  # [N, M, cd]

        pooled = []
        for width, out_c in self.filters:
            y = nn.Conv(
                out_c, kernel_size=(width,), padding="VALID",
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"conv_w{width}",
            )(x)  # [N, M-w+1, out_c]
            pooled.append(jax.nn.relu(jnp.max(y, axis=1)))  # [N, out_c]
        h = jnp.concatenate(pooled, axis=-1)

        if self.highway_layers > 0:
            h = Highway(
                h.shape[-1], self.highway_layers,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name="highway",
            )(h)
        h = nn.Dense(
            self.word_embed_dim,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="projection",
        )(h)
        h = h.reshape(lead + (self.word_embed_dim,))

        # special symbols: pad -> 0, eos/unk -> learned vectors (:138-152)
        symbol = self.param(
            "symbol_embeddings",
            nn.initializers.xavier_normal(),
            (2, self.word_embed_dim),
            self.param_dtype,
        ).astype(h.dtype)
        h = jnp.where((tokens == self.eos_idx)[..., None], symbol[0], h)
        h = jnp.where((tokens == self.unk_idx)[..., None], symbol[1], h)
        h = jnp.where((tokens == self.pad_idx)[..., None], 0.0, h)
        return h

    def attend(self, x: jax.Array) -> jax.Array:  # pragma: no cover
        raise NotImplementedError(
            "character embeddings cannot share an output projection "
            "(reference: --character-embeddings forces a separate softmax)"
        )
