"""wav2vec 2.0 acoustic encoder, feature-extraction path (flax, BTC).

TPU-native rebuild of the reference model
(reference: fairseq/models/wav2vec/wav2vec2.py:31-960):

- `ConvFeatureExtractor` — the 7-layer strided conv stack (~320x temporal
  downsampling), group-norm on the first block, exact GELU
  (reference: wav2vec2.py:685-763; default spec
  ``[(512,10,5)] + [(512,3,2)]*4 + [(512,2,2)]*2`` built at wav2vec2.py:984).
- `ConvPositionalEmbedding` — grouped conv positional encoding with the
  SamePad trim for even kernels (reference: wav2vec2.py:772-786). Weight-norm
  is folded into a plain kernel at checkpoint import.
- `Wav2Vec2Encoder.extract_features` — the API surface the Chimera encoder
  consumes (reference: wav2vec2.py:650-652 extract_features; the ST path calls
  it with mask=False so the masking/quantizer/negatives machinery is not run —
  the pretraining objective lives in criterions/wav2vec_pretraining).

Padding is tracked as a boolean mask; the conv-stack mask downsampling follows
the reference rule exactly (chop remainder, block-ALL; wav2vec2.py:543-548).
"""

from __future__ import annotations

import math
import os
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import LayerNorm, get_activation

Dtype = Any

# fused Pallas tail for the extractor (ops/pallas_conv.py); opt-in via env
# (same mechanism as CHIMERA_FLASH_ATTENTION; default set by the on-chip A/B
# in benchmarks/ab_conv_frontend.py)
_PALLAS_CONV_ENABLED = os.environ.get("CHIMERA_PALLAS_CONV", "0") == "1"

# (dim, kernel, stride) — wav2vec2-base/small default extractor spec
DEFAULT_CONV_SPEC: Tuple[Tuple[int, int, int], ...] = (
    (512, 10, 5),
    (512, 3, 2),
    (512, 3, 2),
    (512, 3, 2),
    (512, 3, 2),
    (512, 2, 2),
    (512, 2, 2),
)


def conv_output_length(length, kernel: int, stride: int):
    return (length - kernel) // stride + 1


def grad_multiply(x: jax.Array, scale: float) -> jax.Array:
    """Identity forward, gradient scaled by ``scale`` on the way back
    (reference: fairseq/modules/grad_multiply.py GradMultiply, applied to the
    conv-extractor output at wav2vec2.py:529-532 via --feature-grad-mult).

    scale == 0 is the reference's ``with torch.no_grad()`` branch."""
    if scale == 1.0:
        return x
    if scale == 0.0:
        return jax.lax.stop_gradient(x)
    return scale * x + (1.0 - scale) * jax.lax.stop_gradient(x)


def extractor_output_length(length, conv_spec=DEFAULT_CONV_SPEC):
    for _, k, s in conv_spec:
        length = conv_output_length(length, k, s)
    return length


class Fp32GroupNorm(nn.Module):
    """GroupNorm with groups == channels (per-channel instance norm), fp32."""

    channels: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        scale = self.param("scale", nn.initializers.ones, (self.channels,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.channels,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(self.dtype)


class _ConvKernelParam(nn.Module):
    """Declares the SAME param tree as a bias-free nn.Conv (``kernel`` with
    shape [k, in, out], he_normal init) without owning the compute, so the
    fused-Pallas tail path stays checkpoint-compatible with the XLA path."""

    kernel_shape: Tuple[int, int, int]
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param(
            "kernel", nn.initializers.he_normal(), self.kernel_shape,
            self.param_dtype,
        )


class ConvFeatureExtractor(nn.Module):
    """Raw waveform [B, T] -> features [B, T', C].

    With ``use_pallas_tail`` (env CHIMERA_PALLAS_CONV=1) and the standard
    wav2vec2-base tail spec, layers 1-6 run as ONE fused Pallas kernel
    (ops/pallas_conv.py; intermediate activations stay in VMEM). Layer 0 +
    the global GroupNorm stay XLA either way — the instance-norm statistics
    span the full time axis, which breaks time tiling."""

    conv_spec: Tuple[Tuple[int, int, int], ...] = DEFAULT_CONV_SPEC
    mode: str = "default"  # default: group_norm on first layer; layer_norm: all
    conv_bias: bool = False
    use_pallas_tail: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def _pallas_tail_applicable(self) -> bool:
        from chimera_st_tpu.ops.pallas_conv import CH, TAIL_SPEC

        tail = self.conv_spec[1:]
        return (
            self.use_pallas_tail
            and self.mode == "default"
            and not self.conv_bias
            and len(self.conv_spec) >= 2
            and self.conv_spec[0][0] == CH
            and tuple((k, s) for _, k, s in tail) == TAIL_SPEC
            and all(d == CH for d, _, _ in tail)
        )

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gelu = get_activation("gelu")
        x = x[:, :, None].astype(self.dtype)  # [B, T, 1]
        if self._pallas_tail_applicable():
            from chimera_st_tpu.ops.pallas_conv import fused_conv_tail

            dim0, k0, s0 = self.conv_spec[0]
            x = nn.Conv(
                features=dim0, kernel_size=(k0,), strides=(s0,),
                padding="VALID", use_bias=self.conv_bias, dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=nn.initializers.he_normal(), name="conv_0",
            )(x)
            x = Fp32GroupNorm(dim0, dtype=self.dtype, name="group_norm")(x)
            x = gelu(x)
            ws = [
                _ConvKernelParam(
                    kernel_shape=(k, cin, d), param_dtype=self.param_dtype,
                    name=f"conv_{i}",
                )()
                for i, ((d, k, _), (cin, _, _)) in enumerate(
                    zip(self.conv_spec[1:], self.conv_spec[:-1]), start=1
                )
            ]
            # pallas lowering exists for TPU only; interpret elsewhere
            interpret = jax.default_backend() != "tpu"
            return fused_conv_tail(
                x, [w.astype(self.dtype) for w in ws], interpret=interpret
            )
        for i, (dim, k, stride) in enumerate(self.conv_spec):
            x = nn.Conv(
                features=dim,
                kernel_size=(k,),
                strides=(stride,),
                padding="VALID",
                use_bias=self.conv_bias,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=nn.initializers.he_normal(),
                name=f"conv_{i}",
            )(x)
            if self.mode == "layer_norm":
                x = LayerNorm(dim, dtype=self.dtype, name=f"ln_{i}")(x)
            elif self.mode == "default" and i == 0:
                x = Fp32GroupNorm(dim, dtype=self.dtype, name="group_norm")(x)
            x = gelu(x)
        return x


class ConvPositionalEmbedding(nn.Module):
    """Grouped temporal conv positional encoding (reference: wav2vec2.py:772-786)."""

    dim: int
    kernel: int = 128
    groups: int = 16
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, C]
        std = math.sqrt(4.0 / (self.kernel * self.dim))
        y = nn.Conv(
            features=self.dim,
            kernel_size=(self.kernel,),
            padding=[(self.kernel // 2, self.kernel // 2)],
            feature_group_count=self.groups,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.normal(std),
            name="conv",
        )(x)
        if self.kernel % 2 == 0:  # SamePad: drop trailing frame for even kernels
            y = y[:, :-1, :]
        return get_activation("gelu")(y)


class W2V2EncoderLayer(nn.Module):
    """BERT-style layer; post-norm for base models (reference: wav2vec2.py:856-960)."""

    embed_dim: int
    ffn_dim: int
    num_heads: int
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    activation: str = "gelu"
    layer_norm_first: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None, deterministic: bool = True):
        from .layers import MultiheadAttention

        attn = MultiheadAttention(
            self.embed_dim,
            self.num_heads,
            dropout=self.attention_dropout,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="self_attn",
        )
        ln1 = LayerNorm(self.embed_dim, dtype=self.dtype, name="self_attn_layer_norm")
        ln2 = LayerNorm(self.embed_dim, dtype=self.dtype, name="final_layer_norm")
        fc1 = nn.Dense(
            self.ffn_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc1"
        )
        fc2 = nn.Dense(
            self.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="fc2"
        )
        act = get_activation(self.activation)
        drop = nn.Dropout(self.dropout)
        act_drop = nn.Dropout(self.activation_dropout)

        residual = x
        if self.layer_norm_first:
            x = ln1(x)
        x, _ = attn(x, key_padding_mask=padding_mask, deterministic=deterministic)
        x = drop(x, deterministic=deterministic)
        x = residual + x
        if not self.layer_norm_first:
            x = ln1(x)

        residual = x
        if self.layer_norm_first:
            x = ln2(x)
        x = act(fc1(x))
        x = act_drop(x, deterministic=deterministic)
        x = fc2(x)
        x = drop(x, deterministic=deterministic)
        x = residual + x
        if not self.layer_norm_first:
            x = ln2(x)
        return x


def downsample_padding_mask(padding_mask: jax.Array, out_len: int) -> jax.Array:
    """Reference rule (wav2vec2.py:543-548): chop remainder, frame padded iff
    ALL raw samples in its block are padded."""
    B, T = padding_mask.shape
    extra = T % out_len
    if extra > 0:
        padding_mask = padding_mask[:, :-extra]
    block = padding_mask.shape[1] // out_len
    return padding_mask.reshape(B, out_len, block).all(axis=-1)


class Wav2Vec2Encoder(nn.Module):
    """Feature-extraction trunk: conv extractor + transformer context network."""

    encoder_embed_dim: int = 768
    encoder_ffn_dim: int = 3072
    encoder_layers: int = 12
    encoder_heads: int = 8
    conv_spec: Tuple[Tuple[int, int, int], ...] = DEFAULT_CONV_SPEC
    extractor_mode: str = "default"
    conv_bias: bool = False
    conv_pos: int = 128
    conv_pos_groups: int = 16
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    activation: str = "gelu"
    layer_norm_first: bool = False
    # gradient scale on the conv-extractor output; 0 freezes the extractor
    # through the backward pass (reference: wav2vec2.py:337,529-532)
    feature_grad_mult: float = 1.0
    # probability of skipping each transformer layer at train time
    # (reference: wav2vec2.py encoder_layerdrop, default 0.05 in base)
    layerdrop: float = 0.0
    # learned masked-frame embedding for fine-tune span masking (reference:
    # wav2vec2.py mask_emb / apply_mask :321-340); indices come from the host
    mask_emb: bool = False
    # rematerialize each context-network layer in the backward pass
    # (jax.checkpoint): trades ~1/3 extra forward FLOPs on the trunk for not
    # stashing its per-layer activations — the trunk runs at the longest
    # sequence length in the model (299 frames/6 s before subsampling), so
    # this is where activation memory lives at large batch
    remat: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.feature_extractor = ConvFeatureExtractor(
            conv_spec=self.conv_spec,
            mode=self.extractor_mode,
            conv_bias=self.conv_bias,
            use_pallas_tail=_PALLAS_CONV_ENABLED,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="feature_extractor",
        )
        feat_dim = self.conv_spec[-1][0]
        self.layer_norm = LayerNorm(feat_dim, dtype=self.dtype, name="layer_norm")
        if feat_dim != self.encoder_embed_dim:
            self.post_extract_proj = nn.Dense(
                self.encoder_embed_dim,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="post_extract_proj",
            )
        else:
            self.post_extract_proj = None
        self.pos_conv = ConvPositionalEmbedding(
            self.encoder_embed_dim,
            kernel=self.conv_pos,
            groups=self.conv_pos_groups,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="pos_conv",
        )
        self.encoder_layer_norm = LayerNorm(
            self.encoder_embed_dim, dtype=self.dtype, name="encoder_layer_norm"
        )
        layer_cls = (
            # static_argnums counts self: (self, x, padding_mask, deterministic)
            nn.remat(W2V2EncoderLayer, static_argnums=(3,))
            if self.remat
            else W2V2EncoderLayer
        )
        self.layers = [
            layer_cls(
                self.encoder_embed_dim,
                self.encoder_ffn_dim,
                self.encoder_heads,
                dropout=self.dropout,
                attention_dropout=self.attention_dropout,
                activation_dropout=self.activation_dropout,
                activation=self.activation,
                layer_norm_first=self.layer_norm_first,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"layers_{i}",
            )
            for i in range(self.encoder_layers)
        ]
        self.input_dropout = nn.Dropout(self.dropout)
        if self.mask_emb:
            self.masked_spec_embed = self.param(
                "mask_emb",
                nn.initializers.uniform(scale=1.0),
                (self.encoder_embed_dim,),
                self.param_dtype,
            )

    def extract_conv_features(self, source: jax.Array) -> jax.Array:
        return self.feature_extractor(source)

    def __call__(
        self,
        source: jax.Array,  # [B, T] raw waveform
        padding_mask: Optional[jax.Array] = None,  # [B, T] True = pad
        deterministic: bool = True,
        mask_indices: Optional[jax.Array] = None,  # [B, T'] bool span mask
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """extract_features: returns (features [B, T', C], padding_mask' or None)."""
        features = self.feature_extractor(source)  # [B, T', 512]
        features = grad_multiply(features, self.feature_grad_mult)
        features = self.layer_norm(features)

        if padding_mask is not None:
            padding_mask = downsample_padding_mask(padding_mask, features.shape[1])

        if self.post_extract_proj is not None:
            features = self.post_extract_proj(features)
        if mask_indices is not None and self.mask_emb:
            # span-masked frames take the learned embedding (reference
            # apply_mask :321-340); indices are host-sampled per batch
            m = mask_indices[:, : features.shape[1], None]
            features = jnp.where(
                m, self.masked_spec_embed.astype(features.dtype), features
            )
        x = self.input_dropout(features, deterministic=deterministic)

        # context network (reference: wav2vec2.py:810-846)
        if padding_mask is not None:
            x = jnp.where(padding_mask[:, :, None], 0.0, x)
        x = x + self.pos_conv(x)
        if not self.layer_norm_first:
            x = self.encoder_layer_norm(x)
        x = self.input_dropout(x, deterministic=deterministic)
        for i, layer in enumerate(self.layers):
            if self.layerdrop > 0.0 and not deterministic:
                from .layers import maybe_layer_drop

                rng = jax.random.fold_in(self.make_rng("dropout"), 1000 + i)
                x = maybe_layer_drop(
                    lambda v: layer(v, padding_mask, deterministic),
                    x, self.layerdrop, rng, deterministic=deterministic,
                )
            else:
                # positional: remat-wrapped layers take `deterministic` as a
                # static positional arg
                x = layer(x, padding_mask, deterministic)
        if self.layer_norm_first:
            x = self.encoder_layer_norm(x)
        return x, padding_mask
