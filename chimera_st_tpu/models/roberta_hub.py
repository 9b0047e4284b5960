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

    # ------------------------------------------------------ word alignment

    def _token_strings(self, bpe_tokens: np.ndarray) -> List[str]:
        """Per-position surface strings; special symbols map to ''. Mirrors
        the reference's dictionary.string([x]) + bpe.decode per token
        (alignment_utils.py:32-35; Dictionary.string drops eos/pad)."""
        special = {self.dictionary.bos(), self.dictionary.eos(),
                   self.dictionary.pad()}
        out = []
        for t in np.asarray(bpe_tokens).reshape(-1).tolist():
            t = int(t)
            if t in special:
                out.append("")
                continue
            s = self.dictionary[t]
            if self.bpe is not None:
                s = self.bpe.decode(s)
            out.append(s.strip())
        return out

    def align_bpe_to_words(self, bpe_tokens: np.ndarray,
                           other_tokens: List[str]) -> List[List[int]]:
        """Greedy alignment from word tokens to BPE positions (reference:
        roberta/alignment_utils.py align_bpe_to_words — same invariants: the
        character streams must match; a word maps to >=1 BPE positions; a BPE
        token may span multiple words)."""
        bpe_tokens = np.asarray(bpe_tokens).reshape(-1)
        assert int(bpe_tokens[0]) == self.dictionary.bos()
        bpe_strs = self._token_strings(bpe_tokens)[1:]  # strip leading <s>
        other = [str(o).strip() for o in other_tokens]
        if "".join(bpe_strs) != "".join(other):
            raise ValueError(
                f"cannot align {other!r} to BPE stream {bpe_strs!r}"
            )
        alignment: List[List[int]] = []
        nonempty = iter(
            [(j, s) for j, s in enumerate(bpe_strs, start=1) if s != ""]
        )
        j, bpe_tok = next(nonempty)
        for other_tok in other:
            bpe_indices: List[int] = []
            while True:
                if other_tok.startswith(bpe_tok):
                    bpe_indices.append(j)
                    other_tok = other_tok[len(bpe_tok):]
                    try:
                        j, bpe_tok = next(nonempty)
                    except StopIteration:
                        j, bpe_tok = None, ""
                elif bpe_tok.startswith(other_tok):
                    # word ends inside this BPE token
                    bpe_indices.append(j)
                    bpe_tok = bpe_tok[len(other_tok):]
                    other_tok = ""
                else:
                    raise ValueError(
                        f'cannot align "{other_tok}" and "{bpe_tok}"'
                    )
                if other_tok == "":
                    break
            assert len(bpe_indices) > 0
            alignment.append(bpe_indices)
        assert len(alignment) == len(other)
        return alignment

    @staticmethod
    def align_features_to_words(features: np.ndarray,
                                alignment: List[List[int]]) -> np.ndarray:
        """Pool BPE features onto words, conserving total mass (reference:
        alignment_utils.py align_features_to_words — features shared by K
        words are split K ways; rows are [<s>, words..., unaligned tail])."""
        features = np.asarray(features)
        assert features.ndim == 2
        counts = np.ones(len(features), np.float32)
        flat = [j for idxs in alignment for j in idxs]
        assert 0 not in flat  # <s> is never aligned
        for j in set(flat):
            counts[j] = flat.count(j)
        weighted = features / counts[:, None]
        rows = [weighted[0]]
        largest = -1
        for idxs in alignment:
            rows.append(weighted[idxs].sum(axis=0))
            largest = max(largest, *idxs)
        for j in range(largest + 1, len(features)):
            rows.append(weighted[j])
        out = np.stack(rows)
        assert np.abs(out.sum(0) - features.sum(0)).max() < 1e-3
        return out

    def extract_features_aligned_to_words(
        self, sentence: str, words: Optional[List[str]] = None
    ) -> Tuple[List[str], np.ndarray]:
        """Word-aligned features for a sentence. The reference tokenizes with
        spaCy and returns a Doc with per-token vectors
        (roberta/hub_interface.py extract_features_aligned_to_words); spaCy
        isn't in this environment, so callers pass ``words`` (default:
        whitespace split) and get ``(['<s>'] + words + ['</s>'], features)``
        back — same pooling, plain containers."""
        if words is None:
            words = sentence.split()
        toks = self.encode(sentence)
        alignment = self.align_bpe_to_words(toks, words)
        feats = self.extract_features(toks)[0].astype(np.float32)
        aligned = self.align_features_to_words(feats, alignment)
        labels = ["<s>"] + list(words) + ["</s>"]
        assert len(labels) == len(aligned)
        return labels, aligned


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
