"""wav2vec v1: CPC-style contrastive pretraining over raw audio.

reference: fairseq/models/wav2vec/wav2vec.py ("wav2vec: Unsupervised
Pre-training for Speech Recognition", Schneider et al. 2019): conv feature
encoder z = f(x), causal conv aggregator c = g(z), and a k-step-ahead
contrastive objective — predict z_{t+k} from c_t against negatives drawn
from the same utterance. TPU design: negatives are sampled host-side or via
jax.random (indices into the time axis), the step predictions are one Dense
per offset, and the objective is binary CE over (1 positive, n negatives)
per (t, k) — all static shapes."""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config.registry import register_criterion, register_model, register_model_architecture

Dtype = Any


@dataclass(frozen=True)
class Wav2VecV1Config:
    # (dim, kernel, stride) stacks
    conv_feature_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5), (512, 8, 4), (512, 4, 2), (512, 4, 2), (512, 4, 2),
    )
    conv_aggregator_layers: Tuple[Tuple[int, int, int], ...] = ((512, 3, 1),) * 9
    prediction_steps: int = 12
    num_negatives: int = 10
    dropout: float = 0.0


class Wav2VecV1Model(nn.Module):
    cfg: Wav2VecV1Config
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.feature_convs = [
            nn.Conv(dim, (k,), strides=(s,), padding="VALID",
                    name=f"feat_conv_{i}", **common)
            for i, (dim, k, s) in enumerate(c.conv_feature_layers)
        ]
        self.feature_norms = [
            nn.GroupNorm(num_groups=1, dtype=jnp.float32, name=f"feat_norm_{i}")
            for i in range(len(c.conv_feature_layers))
        ]
        self.agg_convs = [
            nn.Conv(dim, (k,), strides=(s,), padding="CAUSAL",
                    name=f"agg_conv_{i}", **common)
            for i, (dim, k, s) in enumerate(c.conv_aggregator_layers)
        ]
        z_dim = c.conv_feature_layers[-1][0]
        self.step_predictors = [
            nn.Dense(z_dim, use_bias=False, name=f"pred_{k}", **common)
            for k in range(c.prediction_steps)
        ]

    def featurize(self, source: jax.Array) -> jax.Array:
        """raw wave [B, T] -> z [B, T', D]."""
        x = source[:, :, None]
        for conv, norm in zip(self.feature_convs, self.feature_norms):
            x = conv(x)
            x = norm(x.astype(jnp.float32)).astype(x.dtype)
            x = jax.nn.relu(x)
        return x

    def aggregate(self, z: jax.Array) -> jax.Array:
        x = z
        for conv in self.agg_convs:
            residual = x
            x = jax.nn.relu(conv(x))
            if x.shape == residual.shape:
                x = x + residual
        return x

    def __call__(self, source: jax.Array, negative_indices: jax.Array,
                 deterministic: bool = True):
        """-> (pos_logits [B, K, T'], neg_logits [B, K, T', N]).

        negative_indices [B, T', N]: time indices of within-utterance
        distractors (reference: wav2vec.py sample_negatives)."""
        c = self.cfg
        z = self.featurize(source)  # [B, T, D]
        ca = self.aggregate(z)
        B, T, D = z.shape
        idx = jnp.clip(negative_indices, 0, T - 1)  # [B, T, N]
        negs = jnp.take_along_axis(
            z[:, :, None, :], idx[..., None], axis=1
        )  # [B, T, N, D]: negs[b,t,n] = z[b, idx[b,t,n]]
        pos_list, neg_list = [], []
        for k, pred in enumerate(self.step_predictors, start=1):
            p = pred(ca)  # [B, T, D] prediction of z_{t+k}
            target = jnp.roll(z, -k, axis=1)
            valid = jnp.arange(T) < (T - k)
            pos = jnp.sum(p * target, axis=-1)  # [B, T]
            pos = jnp.where(valid[None, :], pos, 0.0)
            neg = jnp.einsum("btd,btnd->btn", p, negs)
            neg = jnp.where(valid[None, :, None], neg, 0.0)
            pos_list.append(pos)
            neg_list.append(neg)
        return jnp.stack(pos_list, 1), jnp.stack(neg_list, 1)


@register_model("wav2vec")
def build_wav2vec_v1(cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
    known = {f.name for f in dataclasses.fields(Wav2VecV1Config)}
    kw = {k: v for k, v in cfg_dict.items() if k in known}
    for key in ("conv_feature_layers", "conv_aggregator_layers"):
        if key in kw and kw[key] and not isinstance(kw[key][0], tuple):
            kw[key] = tuple(tuple(x) for x in kw[key])
    return Wav2VecV1Model(Wav2VecV1Config(**kw), dtype=dtype, param_dtype=param_dtype)


@register_model_architecture("wav2vec", "wav2vec")
def wav2vec_v1_base(cfg: Dict) -> Dict:
    return dict(cfg)


@register_criterion("wav2vec_v1")
def make_wav2vec_v1_criterion(cfg: Dict):
    """Binary CE: positives vs sampled negatives per (step, position)
    (reference: fairseq/criterions/... wav2vec uses the model's
    BinaryCrossEntropy head; wav2vec.py Wav2VecPredictionsModel)."""

    def criterion(model, params, batch, rngs=None, num_updates=None, train=True):
        pos, neg = model.apply(
            params, batch["audio"], batch["negative_indices"],
            deterministic=not train, rngs=rngs,
        )
        pos_loss = jnp.sum(jax.nn.softplus(-pos))
        neg_loss = jnp.sum(jax.nn.softplus(neg))
        loss = pos_loss + neg_loss
        sample_size = jnp.asarray(pos.size, jnp.float32)
        return loss, sample_size, {
            "loss": loss,
            "pos_loss": pos_loss,
            "neg_loss": neg_loss,
            "ntokens": sample_size,
            "nsentences": batch["audio"].shape[0],
            "sample_size": sample_size,
        }

    return criterion
