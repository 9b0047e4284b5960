"""RoBERTa hub interface + XLM-initialized translation model.

reference: fairseq/models/roberta/hub_interface.py (encode / extract_features
/ fill_mask / register_classification_head / predict over a trained roberta)
and fairseq/models/transformer_from_pretrained_xlm.py (a TransformerModel
whose encoder/decoder embeddings and layers are initialized from a pretrained
XLM/masked-LM checkpoint — tasks/translation_from_pretrained_xlm drives it).

The hub interface is a thin host-side convenience over the MaskedLMModel:
everything device-side is the plain jitted flax model; BPE is optional (any
object with encode/decode over strings works, e.g. data/encoders entries).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import register_model, register_model_architecture
from .masked_lm import MaskedLMModel


class RobertaHubInterface:
    """Host-side convenience API over a trained masked-LM
    (reference: roberta/hub_interface.py:1-200)."""

    def __init__(self, model: MaskedLMModel, params, dictionary, bpe=None):
        self.model = model
        self.params = params
        self.dictionary = dictionary
        self.bpe = bpe
        self._heads: Dict[str, Any] = {}
        self._jit_features = jax.jit(
            lambda p, t: model.apply(p, t, method=type(model).encode)[0]
        )
        self._jit_logits = jax.jit(lambda p, t: model.apply(p, t))

    # --------------------------------------------------------------- tokens

    def encode(self, sentence: str) -> np.ndarray:
        """text -> <s> tokens </s> (bpe optional; falls back to whitespace)."""
        text = self.bpe.encode(sentence) if self.bpe is not None else sentence
        ids = [self.dictionary.bos()]
        for tok in text.split():
            ids.append(self.dictionary.index(tok))
        ids.append(self.dictionary.eos())
        return np.asarray(ids, np.int32)

    def decode(self, tokens: np.ndarray) -> str:
        toks = [
            int(t) for t in np.asarray(tokens).tolist()
            if int(t) not in (self.dictionary.bos(), self.dictionary.eos(),
                              self.dictionary.pad())
        ]
        text = " ".join(self.dictionary[t] for t in toks)
        return self.bpe.decode(text) if self.bpe is not None else text

    # ------------------------------------------------------------- features

    def extract_features(self, tokens: np.ndarray) -> np.ndarray:
        t = jnp.asarray(np.atleast_2d(tokens), jnp.int32)
        return np.asarray(self._jit_features(self.params, t))

    def fill_mask(self, tokens: np.ndarray, mask_position: int, topk: int = 5
                  ) -> List[Tuple[str, float]]:
        """Top-k fills for the token at ``mask_position``."""
        t = jnp.asarray(np.atleast_2d(tokens), jnp.int32)
        logits = np.asarray(self._jit_logits(self.params, t))[0, mask_position]
        probs = np.exp(logits - logits.max())
        probs /= probs.sum()
        order = np.argsort(-probs)[:topk]
        return [(self.dictionary[int(i)], float(probs[i])) for i in order]

    # ----------------------------------------------------- classification

    def register_classification_head(self, name: str, num_classes: int,
                                     seed: int = 0):
        """Pooled-bos classification head (host-managed params; reference:
        roberta/model.py register_classification_head)."""
        rng = np.random.default_rng(seed)
        d = self.model.cfg.embed_dim
        scale = 1.0 / np.sqrt(d)
        self._heads[name] = {
            "dense": rng.normal(scale=scale, size=(d, d)).astype(np.float32),
            "dense_b": np.zeros(d, np.float32),
            "out": rng.normal(scale=scale, size=(d, num_classes)).astype(
                np.float32
            ),
            "out_b": np.zeros(num_classes, np.float32),
        }

    def predict(self, head: str, tokens: np.ndarray) -> np.ndarray:
        """log-probs [B, num_classes] from the bos-pooled features."""
        h = self._heads[head]
        feats = self.extract_features(tokens)[:, 0]  # <s> pooled
        x = np.tanh(feats @ h["dense"] + h["dense_b"])
        logits = x @ h["out"] + h["out_b"]
        logits = logits - logits.max(-1, keepdims=True)
        return logits - np.log(np.exp(logits).sum(-1, keepdims=True))


# ------------------------------------------------- pretrained-XLM transformer


def init_transformer_from_pretrained_xlm(
    transformer_params: Dict, xlm_params: Dict, init_decoder: bool = False
) -> Dict:
    """Copy a masked-LM (XLM) checkpoint's embeddings + encoder layers into a
    TransformerModel param tree (reference:
    transformer_from_pretrained_xlm.py upgrade_state_dict_with_xlm_weights —
    matching parameter names are overwritten, the rest keep their init).

    The masked-LM layer stack (layers_i) maps onto the transformer encoder
    stack (encoder layers_i); embeddings map onto encoder.embed_tokens (and
    decoder.embed_tokens when ``init_decoder``)."""
    import copy

    out = copy.deepcopy(transformer_params)
    src = xlm_params["params"]
    dst = out["params"]

    def overwrite(into: Dict, frm: Dict):
        n = 0
        for k, v in frm.items():
            if k in into:
                if isinstance(v, dict) and isinstance(into[k], dict):
                    n += overwrite(into[k], v)
                elif not isinstance(v, dict) and np.shape(into[k]) == np.shape(v):
                    into[k] = v
                    n += 1
        return n

    copied = 0
    enc = dst.get("encoder", dst)
    if "embed_tokens" in src and "embed_tokens" in enc:
        copied += overwrite(enc["embed_tokens"], src["embed_tokens"])
    for k in src:
        if k.startswith("layers_") and k in enc:
            copied += overwrite(enc[k], src[k])
    if init_decoder and "decoder" in dst and "embed_tokens" in src:
        if "embed_tokens" in dst["decoder"]:
            copied += overwrite(dst["decoder"]["embed_tokens"],
                                src["embed_tokens"])
    if copied == 0:
        raise ValueError(
            "no XLM parameters matched the transformer tree — incompatible "
            "dims or naming"
        )
    return out


@register_model("transformer_from_pretrained_xlm")
def build_transformer_from_pretrained_xlm(
    cfg_dict: Dict, dtype=jnp.float32, param_dtype=jnp.float32
):
    """Same module as ``transformer``; the XLM init happens on the param tree
    via init_transformer_from_pretrained_xlm (functional framework: weight
    surgery is data, not module structure)."""
    from .transformer_mt import build_transformer

    return build_transformer(cfg_dict, dtype=dtype, param_dtype=param_dtype)


@register_model_architecture(
    "transformer_from_pretrained_xlm", "transformer_from_pretrained_xlm"
)
def transformer_from_pretrained_xlm_arch(cfg: Dict) -> Dict:
    return dict(cfg)
