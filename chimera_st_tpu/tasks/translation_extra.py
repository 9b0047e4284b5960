"""Translation task tail.

- translation_multi_simple_epoch (reference:
  fairseq/tasks/translation_multi_simple_epoch.py:40-414): many-to-many
  translation with ONE shared model over --lang-pairs, language-token
  prepending on the encoder side (and optionally as the decoder bos), and
  temperature-sampled mixing across pairs. The reference's epoch-wise
  resampling maps onto ResamplingDataset (re-drawn per epoch).
- translation_from_pretrained_bart (reference:
  tasks/translation_from_pretrained_bart.py): mBART fine-tuning — [lang]
  symbols added to the dicts, source suffixed with [src_lang], target decoded
  with [tgt_lang] as bos.
- translation_from_pretrained_xlm (reference:
  tasks/translation_from_pretrained_xlm.py): translation whose model warm
  starts from a masked-LM (XLM) checkpoint; the weight surgery is
  init_transformer_from_pretrained_xlm applied through the task's
  ``post_init_params`` hook.
- semisupervised_translation (reference:
  tasks/semisupervised_translation.py:485 LoC): parallel data mixed with
  denoising autoencoder data (and optional backtranslation pairs) under
  lambda weights. The reference scales sub-losses by lambda inside the step;
  here the lambdas set the DATA mixing ratios (documented delta — with
  sample-level mixing the expected gradient matches the loss-weighted sum).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Callable, Dict, List, Optional

import numpy as np

from ..config.registry import register_task
from ..data.dictionary import Dictionary
from ..data.indexed_dataset import MMapIndexedDataset
from ..data.language_pair import LanguagePairDataset
from .base import ChimeraTask
from .translation import TranslationTask
from ..data.batching import round16

logger = logging.getLogger(__name__)


class LangTokPairDataset:
    """LanguagePairDataset view that prepends/appends language tokens
    (reference: data/langpair_with_lang_tok inside
    translation_multi_simple_epoch; mBART variant appends to the source)."""

    def __init__(
        self,
        base: LanguagePairDataset,
        src_prepend: Optional[int] = None,
        src_append: Optional[int] = None,
        tgt_bos: Optional[int] = None,  # decoder-side language token
        tgt_append: Optional[int] = None,  # mBART: target suffixed [tgt_lang]
    ):
        self.base = base
        self.src_prepend = src_prepend
        self.src_append = src_append
        self.tgt_bos = tgt_bos
        self.tgt_append = tgt_append

    def __len__(self):
        return len(self.base)

    def num_tokens(self, i: int) -> int:
        return self.base.num_tokens(i) + 1

    def __getitem__(self, i: int):
        item = dict(self.base[i])
        src = item["source"]
        if self.src_prepend is not None:
            src = np.concatenate([[self.src_prepend], src]).astype(src.dtype)
        if self.src_append is not None:
            src = np.concatenate([src, [self.src_append]]).astype(src.dtype)
        item["source"] = src
        if self.tgt_append is not None:
            tgt = item["target"]
            item["target"] = np.concatenate(
                [tgt, [self.tgt_append]]
            ).astype(tgt.dtype)
        if self.tgt_bos is not None:
            item["_tgt_bos"] = self.tgt_bos
        return item

    def collater(self, samples, **kwargs):
        tagged = bool(samples) and "_tgt_bos" in samples[0]
        if tagged:
            # pre-apply the base collater's sort so rows align with samples
            # (review fix: stamping samples[0]'s tag onto every row gave
            # minority-pair rows of a mixed batch the WRONG language token)
            samples = sorted(samples, key=lambda s: -len(s["source"]))
        batch = self.base.collater(samples, **kwargs)
        if tagged:
            prev = batch["prev_output_tokens"].copy()
            prev[:, 0] = np.asarray(
                [s["_tgt_bos"] for s in samples], prev.dtype
            )
            batch["prev_output_tokens"] = prev
        return batch


@register_task("translation_multi_simple_epoch")
class TranslationMultiSimpleEpochTask(ChimeraTask):
    text_only = True

    def __init__(self, cfg: Dict, dictionary: Dictionary, pairs: List[str]):
        super().__init__(cfg)
        self.dictionary = dictionary
        self.pairs = pairs
        for lang in sorted({l for p in pairs for l in p.split("-")}):
            dictionary.add_symbol(f"__{lang}__")

    @classmethod
    def setup_task(cls, cfg: Dict, **kwargs):
        root = Path(cfg["data"])
        pairs = cfg.get("lang_pairs")
        if not pairs:
            raise ValueError("translation_multi_simple_epoch needs --lang-pairs")
        pairs = pairs.split(",") if isinstance(pairs, str) else list(pairs)
        # one SHARED vocabulary (the reference asserts per-lang dicts match
        # for the shared-model path)
        dict_path = root / "dict.txt"
        if not dict_path.exists():
            first = pairs[0].split("-")[0]
            dict_path = root / f"dict.{first}.txt"
        d = cls.load_dictionary(str(dict_path))
        return cls(cfg, d, pairs)

    def lang_token(self, lang: str) -> int:
        return self.dictionary.index(f"__{lang}__")

    def lang_tag_indices(self):
        return {
            self.lang_token(l)
            for p in self.pairs for l in p.split("-")
        }

    def load_dataset(self, split: str, **kwargs):
        from ..data.wrappers import ResamplingDataset

        root = Path(self.cfg["data"])
        encoder_langtok = self.cfg.get("encoder_langtok", "tgt")  # src|tgt|None
        decoder_langtok = bool(self.cfg.get("decoder_langtok", False))
        parts, sizes = [], []
        for pair in self.pairs:
            src, tgt = pair.split("-")
            prefix = str(root / f"{split}.{src}-{tgt}.")
            base = LanguagePairDataset(
                MMapIndexedDataset(prefix + src),
                MMapIndexedDataset(prefix + tgt),
                self.dictionary, self.dictionary,
            )
            prepend = None
            if encoder_langtok == "tgt":
                prepend = self.lang_token(tgt)
            elif encoder_langtok == "src":
                prepend = self.lang_token(src)
            parts.append(LangTokPairDataset(
                base,
                src_prepend=prepend,
                tgt_bos=self.lang_token(tgt) if decoder_langtok else None,
            ))
            sizes.append(len(base))
        if split == self.cfg.get("train_subset", "train") and len(parts) > 1:
            # temperature uses p^(1/T); alpha is the DIRECT exponent p^a
            # (review fix: alpha was fed through 1/T, inverting the
            # smoothing direction vs multilingual_denoising/lm_tail)
            if "sampling_temperature" in self.cfg:
                t = float(self.cfg.get("sampling_temperature") or 1.0)
                exponent = 1.0 / t if t > 0 else 1.0
            else:
                exponent = float(self.cfg.get("sampling_alpha", 1.0))
            probs = np.asarray(sizes, np.float64) / max(sum(sizes), 1)
            smoothed = probs ** exponent
            smoothed /= smoothed.sum()
            ratios = smoothed * sum(sizes) / np.maximum(sizes, 1)
            parts = [
                ResamplingDataset(ds, size_ratio=float(r),
                                  seed=int(self.cfg.get("seed", 1)))
                for ds, r in zip(parts, ratios)
            ]
        self.datasets[split] = _SharedCollateConcat(parts)

    @property
    def source_dictionary(self) -> Dictionary:
        return self.dictionary

    @property
    def target_dictionary(self) -> Dictionary:
        return self.dictionary

    def collate_indices(self, dataset, idx, target_len=None):
        samples = [dataset[int(i)] for i in idx]
        src_max = round16(max(len(s["source"]) for s in samples))
        tgt_max = round16(max(len(s["target"]) for s in samples))
        return dataset.collater(
            samples, src_target_len=src_max, tgt_target_len=tgt_max
        )


from ..data.wrappers import IdStampedConcat as _SharedCollateConcat  # noqa: E402


@register_task("translation_from_pretrained_bart")
class TranslationFromPretrainedBARTTask(TranslationTask):
    """mBART fine-tune surface (reference:
    tasks/translation_from_pretrained_bart.py — [lang] symbols in the dicts,
    source suffixed with its language token, target bos = [tgt_lang])."""

    @classmethod
    def setup_task(cls, cfg: Dict, **kwargs):
        task = super().setup_task(cfg, **kwargs)
        langs = cfg.get("langs") or f"{cfg['source_lang']},{cfg['target_lang']}"
        task.langs = [l for l in str(langs).split(",") if l]
        for l in task.langs:
            task.src_dict.add_symbol(f"[{l}]")
            task.tgt_dict.add_symbol(f"[{l}]")
        # the (m)BART pretraining vocabulary ends with <mask> AFTER the lang
        # tags (reference translation_from_pretrained_bart.py:57-58); without
        # it the fine-tune vocab is one smaller and misaligned with the
        # pretrained embedding table (review fix)
        task.src_dict.add_symbol("<mask>")
        task.tgt_dict.add_symbol("<mask>")
        return task

    def lang_tag_indices(self):
        return {
            d.index(f"[{l}]")
            for d in (self.src_dict, self.tgt_dict)
            for l in self.langs
            if f"[{l}]" in d.indices
        }

    def load_dataset(self, split: str, **kwargs):
        super().load_dataset(split, **kwargs)
        src, tgt = self.cfg["source_lang"], self.cfg["target_lang"]
        # reference mBART format: source suffixed [src_lang], target
        # suffixed [tgt_lang], prev rotated so [tgt_lang] leads (review fix:
        # the target-side suffix was missing — fine-tune format diverged
        # from mBART pretraining)
        self.datasets[split] = LangTokPairDataset(
            self.datasets[split],
            src_append=self.src_dict.index(f"[{src}]"),
            tgt_bos=self.tgt_dict.index(f"[{tgt}]"),
            tgt_append=self.tgt_dict.index(f"[{tgt}]"),
        )


@register_task("translation_from_pretrained_xlm")
class TranslationFromPretrainedXLMTask(TranslationTask):
    """Translation warm-started from a masked-LM checkpoint (reference:
    tasks/translation_from_pretrained_xlm.py — swaps in MaskedLMDictionary
    and the transformer_from_pretrained_xlm model)."""

    def model_config_overrides(self, cfg: Dict) -> Dict:
        out = super().model_config_overrides(cfg)
        out.setdefault("arch", "transformer_from_pretrained_xlm")
        return out

    def post_init_params(self, params, model, args):
        """Merge the pretrained XLM (masked-LM) weights into the fresh
        transformer params (cli/train calls this after init)."""
        ckpt = self.cfg.get("pretrained_xlm_checkpoint") or getattr(
            args, "pretrained_xlm_checkpoint", None
        )
        if not ckpt:
            return params
        import pickle

        from ..models.roberta_hub import init_transformer_from_pretrained_xlm

        with open(ckpt, "rb") as f:
            payload = pickle.load(f)
        xlm_params = payload["params"] if "params" in payload else payload
        if "params" not in xlm_params:
            xlm_params = {"params": xlm_params}
        merged = init_transformer_from_pretrained_xlm(
            params, xlm_params,
            init_decoder=bool(self.cfg.get("init_decoder", False)),
        )
        logger.info(f"initialized encoder from XLM checkpoint {ckpt}")
        return merged


@register_task("semisupervised_translation")
class SemisupervisedTranslationTask(ChimeraTask):
    """Parallel + denoising-autoencoder (+ optional backtranslation) mixing
    (reference: tasks/semisupervised_translation.py — lambda_parallel /
    lambda_denoising / lambda_otf_bt; lambdas become sampling ratios here,
    see module docstring)."""

    text_only = True

    def __init__(self, cfg: Dict, src_dict: Dictionary, tgt_dict: Dictionary):
        super().__init__(cfg)
        self.src_dict = src_dict
        self.tgt_dict = tgt_dict
        self.backtranslate_fn: Optional[Callable] = None  # set by trainer/user

    @classmethod
    def setup_task(cls, cfg: Dict, **kwargs):
        root = Path(cfg["data"])
        src, tgt = cfg.get("source_lang"), cfg.get("target_lang")
        if src is None or tgt is None:
            src, tgt = TranslationTask.infer_language_pair(root)
        cfg["source_lang"], cfg["target_lang"] = src, tgt
        src_dict = cls.load_dictionary(str(root / f"dict.{src}.txt"))
        tgt_dict = cls.load_dictionary(str(root / f"dict.{tgt}.txt"))
        return cls(cfg, src_dict, tgt_dict)

    def load_dataset(self, split: str, **kwargs):
        from ..data.noising import NoisingDataset
        from ..data.wrappers import ResamplingDataset

        root = Path(self.cfg["data"])
        src, tgt = self.cfg["source_lang"], self.cfg["target_lang"]
        lam_par = float(self.cfg.get("lambda_parallel", 1.0))
        lam_dae = float(self.cfg.get("lambda_denoising", 0.0))
        parts = []

        prefix = str(root / f"{split}.{src}-{tgt}.")
        parallel = LanguagePairDataset(
            MMapIndexedDataset(prefix + src),
            MMapIndexedDataset(prefix + tgt),
            self.src_dict, self.tgt_dict,
        )
        if lam_par > 0:
            parts.append((parallel, lam_par))

        if lam_dae > 0 and split == self.cfg.get("train_subset", "train"):
            # denoising autoencoder over target-side monolingual data:
            # noised(tgt) -> tgt (reference: _load_denoising pairs)
            mono_path = root / f"{split}.{tgt}"
            # review fix: with_suffix(".idx") replaced the ".{tgt}" suffix
            # and probed the wrong file, so mono corpora were silently
            # ignored and DAE fell back to the parallel target side
            if Path(str(mono_path) + ".idx").exists():
                mono = MMapIndexedDataset(str(mono_path))
            else:
                mono = MMapIndexedDataset(prefix + tgt)
            noised = NoisingDataset(
                mono, self.tgt_dict,
                seed=int(self.cfg.get("seed", 1)),
                dropout_prob=float(self.cfg.get("word_dropout", 0.1)),
                max_shuffle_distance=int(self.cfg.get("word_shuffle", 3)),
            )
            dae = _PairedView(noised, mono)
            parts.append((dae, lam_dae))

        if not parts:
            raise ValueError("all lambda weights are zero")
        total = sum(w for _, w in parts)
        datasets = []
        for ds, w in parts:
            ratio = w / total * len(parts)
            datasets.append(
                ResamplingDataset(ds, size_ratio=max(ratio, 0.01),
                                  seed=int(self.cfg.get("seed", 1)))
                if ratio != 1.0 else ds
            )
        self.datasets[split] = _SemiConcat(datasets, parallel)

    @property
    def source_dictionary(self) -> Dictionary:
        return self.src_dict

    @property
    def target_dictionary(self) -> Dictionary:
        return self.tgt_dict

    def collate_indices(self, dataset, idx, target_len=None):
        samples = [dataset[int(i)] for i in idx]
        src_max = round16(max(len(s["source"]) for s in samples))
        tgt_max = round16(max(len(s["target"]) for s in samples))
        return dataset.collater(
            samples, src_target_len=src_max, tgt_target_len=tgt_max
        )


class _PairedView:
    """(noised source, clean target) pairs from a monolingual dataset."""

    def __init__(self, noised, clean):
        self.noised = noised
        self.clean = clean

    def __len__(self):
        return len(self.clean)

    def num_tokens(self, i: int) -> int:
        # O(1) from the mmap index — materializing the row per size query
        # re-read the whole corpus every epoch's batch-building scan
        # (review fix)
        sizes = getattr(self.clean, "sizes", None)
        if sizes is not None:
            return int(sizes[i])
        return len(self.clean[i])

    def __getitem__(self, i: int):
        return {
            "id": i,
            "source": np.asarray(self.noised[i], np.int32),
            "target": np.asarray(self.clean[i], np.int32),
        }


class _SemiConcat(_SharedCollateConcat):
    def __init__(self, parts, collate_owner: LanguagePairDataset):
        super().__init__(parts)
        self._owner = collate_owner

    def collater(self, samples, **kwargs):
        return self._owner.collater(samples, **kwargs)
