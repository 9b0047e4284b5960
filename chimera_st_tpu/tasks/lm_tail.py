"""LM-side task tail.

- cross_lingual_lm (reference: fairseq/tasks/cross_lingual_lm.py — XLM MLM
  over per-language monolingual corpora; languages map to segment ids) and
  multilingual_masked_lm (reference: tasks/multilingual_masked_lm.py — the
  roberta-style variant with temperature sampling). Both reuse the
  MaskedTokensDataset machinery over per-language subdirectories.
- legacy_masked_lm (reference: tasks/legacy_masked_lm.py + criterions/
  legacy_masked_lm.py — the original BERT objective: MLM + next-sentence
  prediction over sentence-pair blocks).
- simple_classification (reference: tasks/simple_classification.py — the
  documentation tutorial task: text file + label file driving a classifier
  that emits per-class log-probs, e.g. rnn_classifier).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..config.registry import register_criterion, register_task
from ..data.batching import collate_tokens, round16
from ..data.dictionary import Dictionary
from ..data.indexed_dataset import MMapIndexedDataset
from ..data.token_block_dataset import TokenBlockDataset
from .base import ChimeraTask
from .masked_lm import MaskedTokensDataset

logger = logging.getLogger(__name__)


def _lang_dirs(root: Path, langs_cfg) -> List[str]:
    if langs_cfg:
        return [l.strip() for l in str(langs_cfg).split(",") if l.strip()]
    langs = sorted(
        p.name for p in root.iterdir()
        if p.is_dir() and any(p.glob("train*.idx"))
    )
    if not langs:
        raise FileNotFoundError(f"no language subdirectories under {root}")
    return langs


class _LangTaggedMasked:
    """MaskedTokensDataset + a constant segment/lang id per item
    (reference: cross_lingual_lm.py langs2id segment labels)."""

    def __init__(self, base: MaskedTokensDataset, lang_id: int):
        self.base = base
        self.lang_id = lang_id

    def __len__(self):
        return len(self.base)

    def num_tokens(self, i):
        return self.base.num_tokens(i)

    def __getitem__(self, i):
        item = dict(self.base[i])
        item["lang_id"] = self.lang_id
        return item

    def collater(self, samples, target_len=None):
        batch = self.base.collater(samples, target_len=target_len)
        batch["lang_ids"] = np.asarray(
            [s.get("lang_id", 0) for s in samples], np.int32
        )
        return batch


from ..data.wrappers import IdStampedConcat as _MultiLangConcat  # noqa: E402


@register_task("cross_lingual_lm")
@register_task("multilingual_masked_lm")
class CrossLingualLMTask(ChimeraTask):
    """Shared implementation: per-language masked-LM with language ids and
    temperature sampling. ``cross_lingual_lm`` and ``multilingual_masked_lm``
    differ in the reference only by dictionary flavor and model era; both
    capabilities reduce to this data wiring here."""

    def __init__(self, cfg: Dict, dictionary: Dictionary, langs: List[str]):
        super().__init__(cfg)
        self.dictionary = dictionary
        self.langs = langs
        self.langs2id = {l: i for i, l in enumerate(langs)}
        self.mask_idx = dictionary.add_symbol("<mask>")

    @classmethod
    def setup_task(cls, cfg: Dict, **kwargs):
        root = Path(cfg["data"])
        d = cls.load_dictionary(str(root / "dict.txt"))
        langs = _lang_dirs(root, cfg.get("monolingual_langs") or cfg.get("langs"))
        logger.info(f"cross-lingual LM over {langs}")
        return cls(cfg, d, langs)

    def load_dataset(self, split: str, **kwargs):
        from ..data.wrappers import ResamplingDataset

        root = Path(self.cfg["data"])
        alpha = float(self.cfg.get("multilang_sampling_alpha", 1.0))
        parts, sizes = [], []
        for lang in self.langs:
            data = MMapIndexedDataset(str(root / lang / split))
            blocks = TokenBlockDataset(
                data, data.sizes,
                int(self.cfg.get("tokens_per_sample", 512)),
                pad=self.dictionary.pad(), eos=self.dictionary.eos(),
                break_mode=self.cfg.get("sample_break_mode", "complete"),
            )
            masked = MaskedTokensDataset(
                blocks, self.mask_idx, len(self.dictionary),
                pad=self.dictionary.pad(),
                mask_prob=float(self.cfg.get("mask_prob", 0.15)),
                seed=int(self.cfg.get("seed", 1)),
            )
            parts.append(_LangTaggedMasked(masked, self.langs2id[lang]))
            sizes.append(len(masked))
        if split == self.cfg.get("train_subset", "train") and len(parts) > 1:
            probs = np.asarray(sizes, np.float64) / max(sum(sizes), 1)
            smoothed = probs**alpha
            smoothed /= smoothed.sum()
            ratios = smoothed * sum(sizes) / np.maximum(sizes, 1)
            parts = [
                ResamplingDataset(p, size_ratio=float(r),
                                  seed=int(self.cfg.get("seed", 1)))
                for p, r in zip(parts, ratios)
            ]
        self.datasets[split] = _MultiLangConcat(parts)

    @property
    def source_dictionary(self) -> Dictionary:
        return self.dictionary

    @property
    def target_dictionary(self) -> Dictionary:
        return self.dictionary

    def collate_indices(self, dataset, idx, target_len=None):
        samples = [dataset[int(i)] for i in idx]
        tl = round16(max(len(s["target"]) for s in samples))
        # keyword so wrapper collaters (Resampling/IdStampedConcat) that only
        # forward **kwargs accept it
        return dataset.collater(samples, target_len=tl)


# --------------------------------------------------------- legacy masked LM


class _SentencePairBlocks:
    """BERT-style (sentence A, sentence B, is-next) samples with MLM masking
    (reference: data/legacy/block_pair_dataset.py + masked_lm_dataset.py)."""

    def set_epoch(self, epoch: int):
        self.epoch = int(epoch)

    def __init__(self, sentences: List[np.ndarray], dictionary: Dictionary,
                 mask_idx: int, sep_idx: int, mask_prob: float = 0.15,
                 seed: int = 1):
        self.sentences = sentences
        self.d = dictionary
        self.mask_idx = mask_idx
        self.sep_idx = sep_idx
        self.mask_prob = mask_prob
        self.seed = seed

    def __len__(self):
        return len(self.sentences)

    def num_tokens(self, i):
        j = (i + 1) % len(self.sentences)
        return len(self.sentences[i]) + len(self.sentences[j]) + 3

    def __getitem__(self, i):
        from ..criterions.masked_lm import apply_bert_masking

        rng = np.random.default_rng([self.seed, getattr(self, "epoch", 1), i])
        a = self.sentences[i]
        is_next = bool(rng.random() < 0.5)
        if is_next:
            b = self.sentences[(i + 1) % len(self.sentences)]
        else:
            b = self.sentences[int(rng.integers(len(self.sentences)))]
        tokens = np.concatenate(
            [[self.d.bos()], a, [self.sep_idx], b, [self.d.eos()]]
        ).astype(np.int64)
        segments = np.concatenate(
            [np.zeros(len(a) + 2, np.int32), np.ones(len(b) + 1, np.int32)]
        )
        net, target = apply_bert_masking(
            tokens, self.mask_idx, len(self.d),
            mask_prob=self.mask_prob, rng=rng, nspecial=4,
        )
        # keep the sentence framing intact (bos/sep/eos are structural for
        # the NSP head, never masking targets)
        frame = np.array([0, len(a) + 1, len(tokens) - 1])
        net[frame] = tokens[frame]
        target[frame] = self.d.pad()
        return {
            "id": i, "net_tokens": net, "target": target,
            "segments": segments, "sentence_target": int(is_next),
        }

    def collater(self, samples, target_len: Optional[int] = None):
        if not samples:
            return {}
        pad = self.d.pad()
        return {
            "id": np.asarray([s["id"] for s in samples], np.int64),
            "net_tokens": collate_tokens(
                [s["net_tokens"] for s in samples], pad,
                target_len=target_len, dtype=np.int32),
            "target": collate_tokens(
                [s["target"] for s in samples], pad,
                target_len=target_len, dtype=np.int32),
            "segments": collate_tokens(
                [s["segments"] for s in samples], 0,
                target_len=target_len, dtype=np.int32),
            "sentence_target": np.asarray(
                [s["sentence_target"] for s in samples], np.int64),
            "ntokens": float(sum(len(s["target"]) for s in samples)),
            "nsentences": len(samples),
        }


@register_task("legacy_masked_lm")
class LegacyMaskedLMTask(ChimeraTask):
    def __init__(self, cfg: Dict, dictionary: Dictionary):
        super().__init__(cfg)
        self.dictionary = dictionary
        self.mask_idx = dictionary.add_symbol("<mask>")
        self.sep_idx = dictionary.add_symbol("<sep>")

    @classmethod
    def setup_task(cls, cfg: Dict, **kwargs):
        d = cls.load_dictionary(str(Path(cfg["data"]) / "dict.txt"))
        return cls(cfg, d)

    def load_dataset(self, split: str, **kwargs):
        data = MMapIndexedDataset(str(Path(self.cfg["data"]) / split))
        sentences = [np.asarray(data[i]) for i in range(len(data))]
        self.datasets[split] = _SentencePairBlocks(
            sentences, self.dictionary, self.mask_idx, self.sep_idx,
            mask_prob=float(self.cfg.get("mask_prob", 0.15)),
            seed=int(self.cfg.get("seed", 1)),
        )

    @property
    def target_dictionary(self) -> Dictionary:
        return self.dictionary

    def collate_indices(self, dataset, idx, target_len=None):
        samples = [dataset[int(i)] for i in idx]
        tl = round16(max(len(s["net_tokens"]) for s in samples))
        return dataset.collater(samples, tl)


@register_criterion("legacy_masked_lm_loss")  # reference registry name
@register_criterion("legacy_masked_lm")
def make_legacy_masked_lm(cfg: Dict):
    """MLM CE over masked positions + next-sentence-prediction CE
    (reference: criterions/legacy_masked_lm.py — nsp loss uses the pooled
    first-token state; model must expose ``classify_sentence``)."""
    import jax
    import jax.numpy as jnp

    pad = int(cfg.get("padding_idx", 1))
    nsp_weight = float(cfg.get("nsp_loss_weight", 1.0))

    def criterion(model, params, batch, rngs=None, num_updates=None, train=True):
        has_nsp = (
            hasattr(type(model), "forward_with_sentence")
            and getattr(model.cfg, "sentence_class_num", 0) > 0
        )
        if has_nsp:
            # single encoder pass serves both heads (review fix: a separate
            # classify_sentence apply re-encoded the batch, 2x step FLOPs)
            logits, sent_logits = model.apply(
                params, batch["net_tokens"], deterministic=not train,
                rngs=rngs, method=type(model).forward_with_sentence,
            )
        else:
            logits = model.apply(
                params, batch["net_tokens"], deterministic=not train, rngs=rngs
            )  # [B, T, V]
        target = batch["target"]
        mask = target != pad
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(lp, target[..., None].astype(jnp.int32), -1)[..., 0]
        mlm_loss = jnp.sum(jnp.where(mask, nll, 0.0))

        nsp_loss = jnp.zeros((), jnp.float32)
        if has_nsp:
            sl = jax.nn.log_softmax(sent_logits.astype(jnp.float32), -1)
            nsp_loss = -jnp.sum(
                jnp.take_along_axis(
                    sl, batch["sentence_target"][:, None].astype(jnp.int32), -1
                )
            )
        loss = mlm_loss + nsp_weight * nsp_loss
        sample_size = jnp.maximum(jnp.sum(mask).astype(jnp.float32), 1.0)
        return loss, sample_size, {
            "loss": loss,
            "mlm_loss": mlm_loss,
            "nsp_loss": nsp_loss,
            "sample_size": sample_size,
            "ntokens": batch.get("ntokens", sample_size),
            "nsentences": batch["net_tokens"].shape[0],
        }

    return criterion


# ------------------------------------------------------ simple_classification


class _LabeledText:
    def __init__(self, inputs: List[np.ndarray], labels: np.ndarray, pad: int):
        self.inputs = inputs
        self.labels = labels
        self.pad = pad

    def __len__(self):
        return len(self.inputs)

    def num_tokens(self, i):
        return len(self.inputs[i])

    def __getitem__(self, i):
        return {"id": i, "tokens": self.inputs[i], "label": int(self.labels[i])}

    def collater(self, samples, target_len: Optional[int] = None):
        if not samples:
            return {}
        return {
            "id": np.asarray([s["id"] for s in samples], np.int64),
            "net_tokens": collate_tokens(
                [s["tokens"] for s in samples], self.pad,
                target_len=target_len, dtype=np.int32),
            "target_labels": np.asarray(
                [s["label"] for s in samples], np.int64),
            "ntokens": float(sum(len(s["tokens"]) for s in samples)),
            "nsentences": len(samples),
        }


@register_task("simple_classification")
class SimpleClassificationTask(ChimeraTask):
    """Tutorial classification task (reference:
    tasks/simple_classification.py): {split}.input text + {split}.label
    files; drives rnn_classifier-style models emitting log-probs."""

    def __init__(self, cfg: Dict, input_vocab: Dictionary,
                 label_vocab: Dictionary):
        super().__init__(cfg)
        self.input_vocab = input_vocab
        self.label_vocab = label_vocab

    @classmethod
    def setup_task(cls, cfg: Dict, **kwargs):
        root = Path(cfg["data"])
        input_vocab = cls.load_dictionary(str(root / "dict.input.txt"))
        label_vocab = cls.load_dictionary(str(root / "dict.label.txt"))
        logger.info(f"[input] {len(input_vocab)} types, "
                    f"[label] {len(label_vocab)} types")
        return cls(cfg, input_vocab, label_vocab)

    def model_config_overrides(self, cfg: Dict) -> Dict:
        out = dict(cfg)
        out.setdefault("vocab_size", len(self.input_vocab))
        out.setdefault("num_classes", len(self.label_vocab))
        return out

    def load_dataset(self, split: str, **kwargs):
        root = Path(self.cfg["data"])
        inputs = []
        for line in (root / f"{split}.input").read_text().splitlines():
            ids = self.input_vocab.encode_line(
                line, append_eos=True, add_if_not_exist=False
            )
            inputs.append(np.asarray(ids, np.int64))
        labels = np.asarray([
            self.label_vocab.index(l.strip())
            for l in (root / f"{split}.label").read_text().splitlines()
        ])
        self.datasets[split] = _LabeledText(
            inputs, labels, self.input_vocab.pad()
        )

    @property
    def source_dictionary(self) -> Dictionary:
        return self.input_vocab

    @property
    def target_dictionary(self) -> Dictionary:
        return self.label_vocab

    def collate_indices(self, dataset, idx, target_len=None):
        samples = [dataset[int(i)] for i in idx]
        tl = round16(max(len(s["tokens"]) for s in samples))
        return dataset.collater(samples, tl)


@register_criterion("simple_classification")
def make_simple_classification(cfg: Dict):
    """CE over per-class log-probs (reference: the tutorial pairs
    simple_classification with a cross-entropy over model log-probs)."""
    import jax.numpy as jnp

    def criterion(model, params, batch, rngs=None, num_updates=None, train=True):
        lp = model.apply(
            params, batch["net_tokens"], deterministic=not train, rngs=rngs
        )  # [B, C] log-probs
        targets = batch["target_labels"]
        loss = -jnp.sum(
            jnp.take_along_axis(lp, targets[:, None].astype(jnp.int32), -1)
        )
        ncorrect = jnp.sum((jnp.argmax(lp, -1) == targets).astype(jnp.float32))
        n = jnp.asarray(targets.shape[0], jnp.float32)
        return loss, n, {
            "loss": loss, "ncorrect": ncorrect,
            "sample_size": n, "ntokens": batch.get("ntokens", n),
            "nsentences": targets.shape[0],
        }

    return criterion
