"""wav2vec 2.0 self-supervised pretraining objective.

TPU-native rebuild of the reference pretraining path
(reference: fairseq/models/wav2vec/wav2vec2.py:300-683 Wav2Vec2Model.forward
with mask=True, GumbelVectorQuantizer at fairseq/modules/gumbel_vector_quantizer.py,
span masking apply_mask :414-452, negatives sampling :454-510, contrastive
logits compute_preds :512-525) and the bimodal "quasiwave" variant
(reference: fairseq/models/wav2vec/wav2vec2_quasiwave.py:52-207
bimodal_forward — cross-modal contrastive with shared mask indices).

Static-shape redesign: the reference gathers masked positions into a ragged
[B, T_masked, C] tensor; here predictions/targets are computed at ALL
positions and the InfoNCE loss is masked-weighted — identical objective, no
dynamic shapes. Mask spans and negative indices are sampled host-side in the
collater (they are data, not compute) and enter jit as arrays.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import LayerNorm
from .wav2vec2 import DEFAULT_CONV_SPEC, Wav2Vec2Encoder, downsample_padding_mask

Dtype = Any


def compute_mask_indices(
    shape: Tuple[int, int],
    padding_mask: Optional[np.ndarray],
    mask_prob: float = 0.65,
    mask_length: int = 10,
    min_masks: int = 2,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Host-side span mask sampling (reference: fairseq/data/data_utils.py
    compute_mask_indices, "static" span-length policy). Returns [B, T] bool."""
    rng = rng or np.random.default_rng()
    B, T = shape
    mask = np.zeros((B, T), bool)
    for b in range(B):
        sz = T if padding_mask is None else int((~padding_mask[b]).sum())
        num_spans = int(mask_prob * sz / float(mask_length) + rng.random())
        num_spans = max(num_spans, min_masks)
        if sz <= mask_length:
            continue
        starts = rng.choice(sz - mask_length, size=num_spans, replace=True)
        for s in starts:
            mask[b, s : s + mask_length] = True
        if padding_mask is not None:
            mask[b] &= ~padding_mask[b]
    return mask


def sample_negative_indices(
    batch: int,
    frames: int,
    num_negatives: int,
    padding_mask: Optional[np.ndarray] = None,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """[B, T, N] same-utterance negative indices avoiding the positive
    (reference: wav2vec2.py:454-510 sample_negatives)."""
    rng = rng or np.random.default_rng()
    out = np.zeros((batch, frames, num_negatives), np.int32)
    for b in range(batch):
        high = frames if padding_mask is None else max(int((~padding_mask[b]).sum()), 2)
        neg = rng.integers(0, high - 1, size=(frames, num_negatives))
        pos = np.arange(frames)[:, None]
        neg[neg >= np.minimum(pos, high - 1)] += 1  # skip the positive index
        out[b] = np.minimum(neg, high - 1)
    return out


class GumbelVectorQuantizer(nn.Module):
    """reference: fairseq/modules/gumbel_vector_quantizer.py (groups=2,
    vars=320 defaults; straight-through Gumbel softmax at train time,
    argmax at eval)."""

    input_dim: int
    num_vars: int = 320
    groups: int = 2
    vq_dim: int = 256
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        assert self.vq_dim % self.groups == 0
        self.var_dim = self.vq_dim // self.groups
        self.codebook = self.param(
            "codebook",
            nn.initializers.uniform(1.0),
            (1, self.groups * self.num_vars, self.var_dim),
            self.param_dtype,
        )
        self.weight_proj = nn.Dense(
            self.groups * self.num_vars,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.normal(1.0),
            name="weight_proj",
        )

    def __call__(
        self,
        x: jax.Array,  # [B, T, C]
        temperature: float = 2.0,
        train: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        B, T, _ = x.shape
        logits = self.weight_proj(x).reshape(B * T * self.groups, self.num_vars)
        logits = logits.astype(jnp.float32)

        # perplexities (diversity signal; reference computes from avg softmax)
        avg_probs = jnp.mean(
            jax.nn.softmax(logits.reshape(B * T, self.groups, self.num_vars), axis=-1),
            axis=0,
        )
        prob_ppl = jnp.sum(
            jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-7), axis=-1))
        )

        if train:
            assert rng is not None
            gumbel = -jnp.log(
                -jnp.log(jax.random.uniform(rng, logits.shape) + 1e-10) + 1e-10
            )
            probs = jax.nn.softmax((logits + gumbel) / temperature, axis=-1)
            hard = jax.nn.one_hot(jnp.argmax(probs, axis=-1), self.num_vars)
            assignment = hard + probs - jax.lax.stop_gradient(probs)  # ST
        else:
            assignment = jax.nn.one_hot(jnp.argmax(logits, axis=-1), self.num_vars)

        assignment = assignment.reshape(B * T, self.groups * self.num_vars, 1)
        quantized = jnp.sum(
            assignment * self.codebook.astype(jnp.float32), axis=1, keepdims=False
        )  # wrong shape unless grouped — handle per group below
        # per-group gather: reshape codebook to [groups, vars, var_dim]
        cb = self.codebook.reshape(self.groups, self.num_vars, self.var_dim)
        a = assignment.reshape(B * T, self.groups, self.num_vars)
        q = jnp.einsum("xgv,gvd->xgd", a, cb.astype(jnp.float32))
        q = q.reshape(B, T, self.vq_dim).astype(self.dtype)
        return {
            "x": q,
            "prob_perplexity": prob_ppl,
            "num_vars": self.num_vars * self.groups,
            "temp": temperature,
        }


class KmeansVectorQuantizer(nn.Module):
    """reference: fairseq/modules/kmeans_vector_quantizer.py — hard
    nearest-neighbour VQ with a straight-through estimator and
    latent + gamma*commitment MSE ("kmeans_loss"; vq-wav2vec's kmeans
    mode). BTC-native: the reference's grouped 1x1 Conv1d + Fp32GroupNorm
    projection becomes a grouped pointwise Dense + fp32 GroupNorm."""

    input_dim: int
    num_vars: int = 320
    groups: int = 2
    vq_dim: int = 256
    combine_groups: bool = False
    gamma: float = 0.25
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        assert self.vq_dim % self.groups == 0
        assert self.input_dim == self.vq_dim, (
            "kmeans VQ quantizes in the projected input space "
            "(reference views the projection output as [groups, vq_dim/groups])"
        )
        self.var_dim = self.vq_dim // self.groups
        n_groups = 1 if self.combine_groups else self.groups
        self.embedding = self.param(
            "embedding",
            lambda k, s, d: 0.01 * jax.random.normal(k, s, d),
            (self.num_vars, n_groups, self.var_dim),
            self.param_dtype,
        )
        self.proj = nn.Conv(
            self.input_dim, kernel_size=(1,),
            feature_group_count=self.groups, use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name="proj",
        )
        self.group_norm = nn.GroupNorm(
            num_groups=self.groups, dtype=jnp.float32, name="group_norm"
        )

    def __call__(
        self,
        x: jax.Array,  # [B, T, C]
        temperature: float = 0.0,  # unused; signature-compatible w/ gumbel
        train: bool = True,
        rng: Optional[jax.Array] = None,
        produce_targets: bool = False,
    ) -> Dict[str, jax.Array]:
        B, T, _ = x.shape
        ze = self.group_norm(self.proj(x).astype(jnp.float32))
        zeg = ze.reshape(B, T, self.groups, self.var_dim)

        emb = self.embedding.astype(jnp.float32)
        if self.combine_groups:
            emb = jnp.broadcast_to(
                emb, (self.num_vars, self.groups, self.var_dim)
            )
        # d[b,t,g,v] = ||ze[b,t,g] - e[v,g]||
        d = jnp.linalg.norm(
            zeg[:, :, :, None, :] - jnp.transpose(emb, (1, 0, 2))[None, None],
            axis=-1,
        )
        idx = jnp.argmin(d, axis=-1)  # [B, T, G]
        zq = jnp.take_along_axis(
            jnp.transpose(emb, (1, 0, 2))[None, None],  # [1,1,G,V,D]
            idx[..., None, None],
            axis=3,
        )[:, :, :, 0, :]  # [B, T, G, D]

        latent = jnp.mean(jnp.square(zq - jax.lax.stop_gradient(zeg)))
        commitment = jnp.mean(jnp.square(zeg - jax.lax.stop_gradient(zq)))
        kmeans_loss = latent + self.gamma * commitment

        # straight-through: forward zq, backward d/dze
        st = jax.lax.stop_gradient(zq) + (zeg - jax.lax.stop_gradient(zeg))
        out = st.reshape(B, T, self.vq_dim).astype(self.dtype)

        hard = jax.nn.one_hot(idx.reshape(-1, self.groups), self.num_vars)
        hard_probs = jnp.mean(hard, axis=0)  # [G, V]
        code_ppl = jnp.sum(
            jnp.exp(-jnp.sum(hard_probs * jnp.log(hard_probs + 1e-7), axis=-1))
        )

        res = {
            "x": out,
            # code perplexity doubles as the diversity signal on this path
            # (the reference's kmeans mode has no prob_perplexity)
            "prob_perplexity": code_ppl,
            "code_perplexity": code_ppl,
            "num_vars": self.num_vars * self.groups,
            "kmeans_loss": kmeans_loss,
        }
        if produce_targets:
            res["targets"] = idx
        return res


@dataclass(frozen=True)
class W2V2PretrainConfig:
    encoder_embed_dim: int = 768
    encoder_ffn_dim: int = 3072
    encoder_layers: int = 12
    encoder_heads: int = 8
    conv_spec: Tuple[Tuple[int, int, int], ...] = DEFAULT_CONV_SPEC
    extractor_mode: str = "default"
    final_dim: int = 256
    latent_vars: int = 320
    latent_groups: int = 2
    logit_temp: float = 0.1
    num_negatives: int = 100
    mask_prob: float = 0.65
    mask_length: int = 10
    # "gumbel" (wav2vec 2.0) or "kmeans" (vq-wav2vec's straight-through VQ;
    # reference: modules/kmeans_vector_quantizer.py). kmeans quantizes in
    # the feat_dim space, so final_dim must equal the extractor dim there.
    quantizer_type: str = "gumbel"
    kmeans_gamma: float = 0.25
    conv_pos: int = 128
    conv_pos_groups: int = 16
    dropout: float = 0.1
    features_pen_weight: float = 10.0


class Wav2Vec2PretrainModel(nn.Module):
    cfg: W2V2PretrainConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.trunk = Wav2Vec2Encoder(
            encoder_embed_dim=c.encoder_embed_dim,
            encoder_ffn_dim=c.encoder_ffn_dim,
            encoder_layers=c.encoder_layers,
            encoder_heads=c.encoder_heads,
            conv_spec=c.conv_spec,
            extractor_mode=c.extractor_mode,
            conv_pos=c.conv_pos,
            conv_pos_groups=c.conv_pos_groups,
            dropout=c.dropout,
            name="wav2vec_model",
            **common,
        )
        feat_dim = c.conv_spec[-1][0]
        self.mask_emb = self.param(
            "mask_emb",
            nn.initializers.uniform(1.0),
            (c.encoder_embed_dim,),
            self.param_dtype,
        )
        if c.quantizer_type == "kmeans":
            self.quantizer = KmeansVectorQuantizer(
                feat_dim,
                num_vars=c.latent_vars,
                groups=c.latent_groups,
                vq_dim=feat_dim,
                gamma=c.kmeans_gamma,
                name="quantizer",
                **common,
            )
        else:
            self.quantizer = GumbelVectorQuantizer(
                feat_dim,
                num_vars=c.latent_vars,
                groups=c.latent_groups,
                vq_dim=c.final_dim,
                name="quantizer",
                **common,
            )
        self.project_q = nn.Dense(c.final_dim, name="project_q", **common)
        self.final_proj = nn.Dense(c.final_dim, name="final_proj", **common)

    def aligned_features(
        self,
        source: jax.Array,  # [B, T] waveform (either modality)
        padding_mask: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """Unmasked context-network features [B, T', C] — the
        ``aligned_feature_fn`` hook the aligning_loss_bimodal criterion drives
        (reference: criterions/aligning_loss_bimodal.py:47,67-68)."""
        return self.trunk(source, padding_mask, deterministic=deterministic)

    def _contrastive_logits(self, preds, targets, neg_idx):
        """preds/targets [B, T, D]; neg_idx [B, T, N] -> logits [B, T, 1+N]."""
        B, T, D = targets.shape
        # gather same-utterance negatives: targets[b, neg_idx[b, t, n]]
        negs = jnp.take_along_axis(
            jnp.broadcast_to(targets[:, None, :, :], (B, T, T, D)),
            neg_idx[..., None].astype(jnp.int32),
            axis=2,
        )  # [B, T, N, D]
        cands = jnp.concatenate([targets[:, :, None, :], negs], axis=2)  # [B,T,1+N,D]
        p = preds.astype(jnp.float32)
        cand = cands.astype(jnp.float32)
        p = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-8)
        cand = cand / jnp.maximum(jnp.linalg.norm(cand, axis=-1, keepdims=True), 1e-8)
        logits = jnp.einsum("btd,btnd->btn", p, cand) / self.cfg.logit_temp
        # same-as-positive negatives are invalid (reference: neg_is_pos -inf)
        same = jnp.all(jnp.isclose(cands[:, :, 1:], cands[:, :, :1]), axis=-1)
        logits = logits.at[:, :, 1:].set(
            jnp.where(same, -jnp.inf, logits[:, :, 1:])
        )
        return logits

    def _pretrain_streams(
        self,
        source: jax.Array,
        padding_mask: Optional[jax.Array],
        mask_indices: jax.Array,
        gumbel_temp: float,
        deterministic: bool,
    ):
        """One modality's (preds, targets, quantizer stats, features_pen,
        valid-mask) — shared by the unimodal __call__ and the cross-modal
        bimodal_forward."""
        tr = self.trunk
        features = tr.feature_extractor(source)  # [B, T', feat]
        features_pen = jnp.mean(jnp.square(features.astype(jnp.float32)))
        features = tr.layer_norm(features)
        if padding_mask is not None:
            padding_mask = downsample_padding_mask(padding_mask, features.shape[1])
        unmasked = features

        if tr.post_extract_proj is not None:
            x = tr.post_extract_proj(features)
        else:
            x = features
        # apply span mask: replace masked frames with the learned embedding
        x = jnp.where(
            mask_indices[:, :, None],
            self.mask_emb.astype(x.dtype)[None, None, :],
            x,
        )
        # context network
        if padding_mask is not None:
            x = jnp.where(padding_mask[:, :, None], 0.0, x)
        x = x + tr.pos_conv(x)
        if not tr.layer_norm_first:
            x = tr.encoder_layer_norm(x)
        for layer in tr.layers:
            x = layer(x, padding_mask=padding_mask, deterministic=deterministic)

        # quantized targets from unmasked features
        q_rng = self.make_rng("gumbel") if not deterministic else None
        q = self.quantizer(
            unmasked, temperature=gumbel_temp, train=not deterministic, rng=q_rng
        )
        targets = self.project_q(q["x"])
        preds = self.final_proj(x)
        valid = mask_indices
        if padding_mask is not None:
            valid = valid & ~padding_mask
        return preds, targets, q, features_pen, valid

    def _outputs(self, preds, targets, negative_indices, q, features_pen, valid):
        logits = self._contrastive_logits(preds, targets, negative_indices)
        return {
            "logits": logits,  # [B, T', 1+N]; target class 0
            "mask": valid,
            "prob_perplexity": q["prob_perplexity"],
            "num_vars": q["num_vars"],
            "features_pen": features_pen,
            # nonzero only on the kmeans-VQ path (latent+commitment MSE)
            "kmeans_loss": q.get("kmeans_loss", jnp.float32(0.0)),
        }

    def bimodal_forward(
        self,
        source: jax.Array,  # [B, T] modality-1 waveform
        source2: jax.Array,  # [B, T] ALIGNED modality-2 waveform
        padding_mask: Optional[jax.Array],
        padding_mask2: Optional[jax.Array],
        mask_indices: jax.Array,  # SHARED span mask
        negative_indices: jax.Array,  # SHARED negatives
        gumbel_temp: float = 2.0,
        deterministic: bool = False,
    ):
        """Cross-modal contrastive pretraining (reference:
        wav2vec2_quasiwave.py:52-207 bimodal_forward): each modality's
        masked-context predictions score against the OTHER modality's
        quantized targets over the shared mask — review fix: the criterion
        previously ran two independent unimodal losses, so no cross-modal
        alignment was trained. Returns (outputs_1->2, outputs_2->1)."""
        p1, t1, q1, pen1, v1 = self._pretrain_streams(
            source, padding_mask, mask_indices, gumbel_temp, deterministic
        )
        p2, t2, q2, pen2, v2 = self._pretrain_streams(
            source2, padding_mask2, mask_indices, gumbel_temp, deterministic
        )
        valid = v1 & v2
        out12 = self._outputs(p1, t2, negative_indices, q2, pen1, valid)
        out21 = self._outputs(p2, t1, negative_indices, q1, pen2, valid)
        return out12, out21

    def __call__(
        self,
        source: jax.Array,  # [B, T] waveform
        padding_mask: Optional[jax.Array],
        mask_indices: jax.Array,  # [B, T'] bool (host-sampled spans)
        negative_indices: jax.Array,  # [B, T', N]
        gumbel_temp: float = 2.0,
        deterministic: bool = False,
    ) -> Dict[str, jax.Array]:
        preds, targets, q, features_pen, valid = self._pretrain_streams(
            source, padding_mask, mask_indices, gumbel_temp, deterministic
        )
        return self._outputs(
            preds, targets, negative_indices, q, features_pen, valid
        )


# ----------------------------------------------------------- registrations


def build_w2v2_pretrain(
    cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32
):
    import dataclasses

    known = {f.name for f in dataclasses.fields(W2V2PretrainConfig)}
    cfg = W2V2PretrainConfig(
        **{k: v for k, v in cfg_dict.items() if k in known}
    )
    return Wav2Vec2PretrainModel(cfg, dtype=dtype, param_dtype=param_dtype)


# reference --arch names (wav2vec2.py:31 register_model("wav2vec2"),
# wav2vec2_quasiwave.py:38 — the bimodal objective lives in the task +
# criterion here, the trunk is shared)
from ..config.registry import register_model, register_model_architecture  # noqa: E402

register_model("wav2vec2")(build_w2v2_pretrain)
register_model("wav2vec2_quasiwave")(build_w2v2_pretrain)


@register_model_architecture("wav2vec2", "wav2vec2")
def wav2vec2_arch(cfg: Dict) -> Dict:
    return dict(cfg)


@register_model_architecture("wav2vec2", "wav2vec2_large")
def wav2vec2_large(cfg: Dict) -> Dict:
    d = dict(cfg)
    d.setdefault("encoder_embed_dim", 1024)
    d.setdefault("encoder_ffn_dim", 4096)
    d.setdefault("encoder_layers", 24)
    d.setdefault("encoder_heads", 16)
    d.setdefault("final_dim", 768)
    d.setdefault("extractor_mode", "layer_norm")
    return d


@register_model_architecture("wav2vec2_quasiwave", "wav2vec2_quasiwave")
def wav2vec2_quasiwave_arch(cfg: Dict) -> Dict:
    return dict(cfg)


@register_model_architecture("wav2vec2_quasiwave", "wav2vec2_quasiwave_base")
def wav2vec2_quasiwave_base(cfg):
    """reference arch name (wav2vec/wav2vec2_quasiwave.py:455)."""
    from ..config.registry import ARCHITECTURES

    _, preset = ARCHITECTURES.get("wav2vec2_quasiwave")
    return preset(cfg)
