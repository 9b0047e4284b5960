"""Speech-to-text datasets over TSV manifests.

Rebuild of the reference data layer
(reference: fairseq/data/audio/speech_to_text_dataset.py:32-557 and
fairseq/data/audio/triplet_dataset.py:34-370):

- `S2TDataConfig` / `TripletDataConfig`: the per-datadir ``config_wave.yaml``
  schema (audio_root, vocab_filename, bpe_tokenizer, src_bpe_tokenizer,
  use_audio_input, prepend_tgt_lang_tag, sampling_alpha, transforms),
- manifest columns: id / audio / n_frames / tgt_text / speaker (+ src_text
  for triplet; reference: chimera/prepare_data/prep_mustc_data.py:122-125);
  for `--task wave` manifests the audio column is ``path:offset:length`` and
  n_frames is the raw sample count,
- temperature resampling across splits (size_ratios, reference:
  speech_to_text_dataset.py:483-557 / triplet_dataset.py:357-370),
- collaters produce fixed, bucket-padded shapes for XLA (delta vs the
  reference's ragged pad-to-batch-max).
"""

from __future__ import annotations

import csv
import logging
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from .audio import get_features_or_waveform
from .batching import collate_tokens
from .dictionary import Dictionary
from .encoders import build_bpe, build_tokenizer

logger = logging.getLogger(__name__)


class S2TDataConfig:
    """Wrapper for config_wave.yaml (reference: speech_to_text_dataset.py:32-124)."""

    def __init__(self, yaml_path: str):
        import yaml

        self.config: Dict = {}
        p = Path(yaml_path)
        if p.is_file():
            with open(p) as f:
                self.config = yaml.safe_load(f) or {}
        else:
            logger.warning(f"data config not found: {yaml_path}")
        self._root = str(p.parent)

    @property
    def vocab_filename(self) -> str:
        return self.config.get("vocab_filename", "dict.txt")

    @property
    def shuffle(self) -> bool:
        return bool(self.config.get("shuffle", False))

    @property
    def pre_tokenizer(self) -> Dict:
        return self.config.get("pre_tokenizer", {"tokenizer": None})

    @property
    def bpe_tokenizer(self) -> Dict:
        return self.config.get("bpe_tokenizer", {"bpe": None})

    @property
    def prepend_tgt_lang_tag(self) -> bool:
        return bool(self.config.get("prepend_tgt_lang_tag", False))

    @property
    def input_feat_per_channel(self) -> int:
        return int(self.config.get("input_feat_per_channel", 80))

    @property
    def input_channels(self) -> int:
        return int(self.config.get("input_channels", 1))

    @property
    def sampling_alpha(self) -> float:
        return float(self.config.get("sampling_alpha", 1.0))

    @property
    def use_audio_input(self) -> bool:
        return bool(self.config.get("use_audio_input", False))

    @property
    def audio_root(self) -> str:
        return self.config.get("audio_root", "")

    def get_feature_transforms(self, split: str, is_train: bool):
        cfg = dict(self.config.get("transforms", {}) or {})
        # split resolution order matches the reference
        # (speech_to_text_dataset.py:111-123): exact split key first, then
        # the _train/_eval wildcards, then * (review fix: plain split keys
        # were previously looked up as `_{split}` and missed)
        cur = cfg.get(split)
        if cur is None and is_train:
            cur = cfg.get("_train")
        if cur is None and not is_train:
            cur = cfg.get("_eval")
        if cur is None:
            cur = cfg.get("*")
        return cur


class TripletDataConfig(S2TDataConfig):
    @property
    def src_bpe_tokenizer(self) -> Dict:
        return self.config.get("src_bpe_tokenizer", {"bpe": None})

    @property
    def src_vocab_filename(self) -> str:
        return self.config.get("src_vocab_filename", "dict.txt")


def _bpe_cfg_to_registry(cfg: Dict) -> Optional[Dict]:
    """{'bpe': name, ...} -> {'_name': name, ...} registry form."""
    if not cfg:
        return None
    name = cfg.get("bpe") or cfg.get("_name")
    if not name:
        return None
    out = dict(cfg)
    out["_name"] = name
    return out


def _tok_cfg_to_registry(cfg: Dict) -> Optional[Dict]:
    if not cfg:
        return None
    name = cfg.get("tokenizer") or cfg.get("_name")
    if not name:
        return None
    out = dict(cfg)
    out["_name"] = name
    return out


def load_tsv(path: str) -> List[Dict[str, str]]:
    with open(path, encoding="utf-8") as f:
        reader = csv.DictReader(
            f,
            delimiter="\t",
            quotechar=None,
            doublequote=False,
            lineterminator="\n",
            quoting=csv.QUOTE_NONE,
        )
        return [dict(row) for row in reader]


@dataclass
class S2TExample:
    index: int
    audio: np.ndarray  # waveform [T] or features [T, F]
    target: Optional[np.ndarray]  # tgt token ids (with eos)
    source_text: Optional[np.ndarray] = None  # src token ids (with eos)


class SpeechToTextDataset:
    """reference: speech_to_text_dataset.py:228-420."""

    LANG_TAG_TEMPLATE = "<lang:{}>"

    def __init__(
        self,
        split: str,
        is_train_split: bool,
        data_cfg: S2TDataConfig,
        audio_paths: List[str],
        n_frames: List[int],
        tgt_texts: Optional[List[str]] = None,
        tgt_dict: Optional[Dictionary] = None,
        tgt_langs: Optional[List[str]] = None,
        ids: Optional[List[str]] = None,
    ):
        self.split = split
        self.is_train_split = is_train_split
        self.cfg = data_cfg
        self.audio_paths = audio_paths
        self.n_frames = np.asarray(n_frames, dtype=np.int64)
        self.tgt_texts = tgt_texts
        self.tgt_dict = tgt_dict
        self.tgt_langs = tgt_langs
        self.ids = ids or [str(i) for i in range(len(audio_paths))]
        self.pre_tokenizer = build_tokenizer(
            _tok_cfg_to_registry(data_cfg.pre_tokenizer)
        )
        self.bpe = build_bpe(_bpe_cfg_to_registry(data_cfg.bpe_tokenizer))
        # fbank-mode feature transforms (specaugment/cmvn); wave mode has none
        from .feature_transforms import CompositeAudioFeatureTransform

        tf_list = data_cfg.get_feature_transforms(split, is_train_split)
        # per-transform params live at the TOP level of config_wave.yaml
        # (reference gen_config_yaml writes e.g. a `specaugment:` block next
        # to `transforms:`; review fix — params were read from inside the
        # transforms mapping, silently using defaults / KeyError for cmvn)
        self.feature_transforms = (
            CompositeAudioFeatureTransform.from_config_dict(
                {**{k: v for k, v in data_cfg.config.items()
                    if k != "transforms"},
                 "transforms": tf_list}
            )
            if tf_list and not data_cfg.use_audio_input
            else None
        )
        self.pad = tgt_dict.pad() if tgt_dict else 1
        self.eos = tgt_dict.eos() if tgt_dict else 2
        # host-wire economy mode (train path only; see set_wire_format):
        # wire_int16 keeps PCM16 waveforms in their lossless 2-byte form end
        # to end (decode cache -> pad copy -> host->device transfer) and
        # device_mask omits the [B, T] bool padding mask from the batch — the
        # jitted step rebuilds both from audio_lengths on device
        # (train/train_step.py prepare_batch). Decode/validate paths never
        # set these, so their batch schema is unchanged.
        self.wire_int16 = False
        self.device_mask = False
        if data_cfg.prepend_tgt_lang_tag and tgt_dict is not None and tgt_langs:
            for lang in sorted(set(tgt_langs)):
                tag = self.LANG_TAG_TEMPLATE.format(lang)
                assert tag in tgt_dict.indices, f"lang tag {tag} missing from dict"

    def __len__(self):
        return len(self.audio_paths)

    def num_tokens(self, index: int) -> int:
        return int(self.n_frames[index])

    def tokenize_text(self, text: str, bpe=None, pre=None) -> str:
        pre = pre if pre is not None else self.pre_tokenizer
        bpe = bpe if bpe is not None else self.bpe
        if pre is not None:
            text = pre.encode(text)
        if bpe is not None:
            text = bpe.encode(text)
        return text

    def _get_tgt_tokens(self, index: int) -> Optional[np.ndarray]:
        if self.tgt_texts is None or self.tgt_dict is None:
            return None
        tokenized = self.tokenize_text(self.tgt_texts[index])
        ids = self.tgt_dict.encode_line(tokenized, append_eos=True)
        if self.cfg.prepend_tgt_lang_tag and self.tgt_langs:
            tag = self.LANG_TAG_TEMPLATE.format(self.tgt_langs[index])
            ids = np.concatenate([[self.tgt_dict.index(tag)], ids]).astype(np.int32)
        return ids

    def __getitem__(self, index: int) -> S2TExample:
        want_int16 = (
            self.wire_int16
            and self.cfg.use_audio_input
            and self.feature_transforms is None
        )
        audio = get_features_or_waveform(
            self.audio_paths[index],
            use_audio_input=self.cfg.use_audio_input,
            audio_root=self.cfg.audio_root,
            int16=want_int16,
        )
        if audio.dtype != np.int16:  # f32 path (features / non-PCM16 wavs)
            audio = audio.astype(np.float32)
            if self.feature_transforms is not None:
                audio = self.feature_transforms(audio)
        return S2TExample(index, audio, self._get_tgt_tokens(index))

    # --------------------------------------------------------------- collate

    @staticmethod
    def _collate_order(samples: List[S2TExample]) -> List[S2TExample]:
        """THE batch order (descending n-frames, stable): the single key
        definition every collater (base + triplet src_text rows) sorts by,
        so modality rows can never silently misalign."""
        return sorted(samples, key=lambda s: -len(s.audio))

    def collater(
        self,
        samples: List[S2TExample],
        audio_target_len: Optional[int] = None,
        text_target_len: Optional[int] = None,
    ) -> Dict[str, Any]:
        if not samples:
            return {}
        # sort by descending n-frames (reference collater order)
        samples = self._collate_order(samples)
        if all(s.audio.dtype == np.int16 for s in samples):
            audio = collate_tokens(
                [s.audio for s in samples], 0, target_len=audio_target_len,
                dtype=np.int16,
            )
        else:
            audio = collate_tokens(
                [
                    s.audio.astype(np.float32) / 32768.0
                    if s.audio.dtype == np.int16 else s.audio
                    for s in samples
                ],
                0.0, target_len=audio_target_len, dtype=np.float32,
            )
        lengths = np.asarray([len(s.audio) for s in samples], np.int32)
        batch = {
            "id": np.asarray([s.index for s in samples], np.int64),
            "audio": audio,
            "audio_lengths": lengths,
            "nsentences": len(samples),
        }
        if not self.device_mask:
            pos = np.arange(audio.shape[1])[None, :]
            batch["audio_padding_mask"] = pos >= lengths[:, None]
        if samples[0].target is not None:
            tgt = collate_tokens(
                [s.target for s in samples], self.pad, target_len=text_target_len,
                dtype=np.int32,
            )
            prev = collate_tokens(
                [np.concatenate([[self.eos], s.target[:-1]]) for s in samples],
                self.pad,
                target_len=text_target_len,
                dtype=np.int32,
            )
            batch["target"] = tgt
            batch["prev_output_tokens"] = prev
            batch["target_lengths"] = np.asarray(
                [len(s.target) for s in samples], np.int32
            )
            batch["ntokens"] = float(sum(len(s.target) for s in samples))
        else:
            batch["ntokens"] = float(sum(len(s.audio) for s in samples))
        return batch


class TripletDataset(SpeechToTextDataset):
    """(audio, src_text, tgt_text) triplets
    (reference: triplet_dataset.py:51-370)."""

    def __init__(
        self,
        *args,
        src_texts: Optional[List[str]] = None,
        src_dict: Optional[Dictionary] = None,
        src_bpe=None,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.src_texts = src_texts
        self.src_dict = src_dict
        self.src_bpe = src_bpe

    def _get_src_tokens(self, index: int) -> Optional[np.ndarray]:
        if self.src_texts is None or self.src_dict is None:
            return None
        text = self.src_texts[index]
        if self.pre_tokenizer is not None:
            text = self.pre_tokenizer.encode(text)
        if self.src_bpe is not None:
            text = self.src_bpe.encode(text)
        return self.src_dict.encode_line(text, append_eos=True)

    def __getitem__(self, index: int) -> S2TExample:
        ex = super().__getitem__(index)
        ex.source_text = self._get_src_tokens(index)
        return ex

    def collater(
        self,
        samples: List[S2TExample],
        audio_target_len: Optional[int] = None,
        text_target_len: Optional[int] = None,
        src_target_len: Optional[int] = None,
    ) -> Dict[str, Any]:
        batch = super().collater(samples, audio_target_len, text_target_len)
        if not batch:
            return batch
        # the SAME deterministic order the parent used, from the single
        # shared key definition — src_text rows must align with the audio
        # rows (review fix: a duplicated inline sort was fragile coupling)
        samples = self._collate_order(samples)
        if samples[0].source_text is not None:
            src = collate_tokens(
                [s.source_text for s in samples],
                self.src_dict.pad() if self.src_dict else 1,
                target_len=src_target_len,
                dtype=np.int32,
            )
            batch["src_text"] = src
            batch["src_text_lengths"] = np.asarray(
                [len(s.source_text) for s in samples], np.int32
            )
        return batch


def make_dataset_from_tsv(
    root: str,
    split: str,
    data_cfg: S2TDataConfig,
    tgt_dict: Optional[Dictionary],
    is_train: bool,
    src_dict: Optional[Dictionary] = None,
    triplet: bool = False,
    seed: int = 1,
    epoch: int = 1,
):
    """Build a dataset for ``split``; comma-separated splits are concatenated,
    with temperature resampling (``sampling_alpha``) applied to train splits
    (reference: speech_to_text_dataset.py:497-557 from_tsv +
    triplet_dataset.py:357-370)."""
    splits = split.split(",")
    if len(splits) > 1:
        from .wrappers import ConcatDataset, ResamplingDataset

        datasets = [
            make_dataset_from_tsv(
                root, s, data_cfg, tgt_dict, is_train,
                src_dict=src_dict, triplet=triplet, seed=seed, epoch=epoch,
            )
            for s in splits
        ]
        if is_train and data_cfg.sampling_alpha != 1.0:
            ratios = resample_sizes(
                [len(d) for d in datasets], data_cfg.sampling_alpha
            )
            logger.info(
                "balanced sampling size ratios: "
                + str({s: f"{r:.3f}" for s, r in zip(splits, ratios)})
            )
            datasets = [
                ResamplingDataset(
                    d, size_ratio=r, seed=seed, epoch=epoch, replace=(r >= 1.0)
                )
                for d, r in zip(datasets, ratios)
            ]
        return ConcatDataset(datasets)
    rows = load_tsv(str(Path(root) / f"{split}.tsv"))
    audio_paths = [r["audio"] for r in rows]
    n_frames = [int(r["n_frames"]) for r in rows]
    # a manifest without a tgt_text column means NO labels (inference
    # manifests): pass None so the dataset takes the no-target path instead
    # of encoding '' to eos-only references (review fix)
    tgt_texts = (
        [r["tgt_text"] for r in rows]
        if rows and "tgt_text" in rows[0] else None
    )
    ids = [r.get("id", str(i)) for i, r in enumerate(rows)]
    tgt_langs = [r["tgt_lang"] for r in rows] if "tgt_lang" in (rows[0] if rows else {}) else None
    if triplet:
        cfg = data_cfg if isinstance(data_cfg, TripletDataConfig) else None
        src_bpe = build_bpe(
            _bpe_cfg_to_registry(cfg.src_bpe_tokenizer) if cfg else None
        )
        return TripletDataset(
            split,
            is_train,
            data_cfg,
            audio_paths,
            n_frames,
            tgt_texts=tgt_texts,
            tgt_dict=tgt_dict,
            tgt_langs=tgt_langs,
            ids=ids,
            src_texts=[r.get("src_text", "") for r in rows],
            src_dict=src_dict,
            src_bpe=src_bpe,
        )
    return SpeechToTextDataset(
        split,
        is_train,
        data_cfg,
        audio_paths,
        n_frames,
        tgt_texts=tgt_texts,
        tgt_dict=tgt_dict,
        tgt_langs=tgt_langs,
        ids=ids,
    )


def set_wire_format(dataset, int16: bool = True, device_mask: bool = True):
    """Enable the host-wire economy mode on every SpeechToTextDataset under
    ``dataset`` (recursing through Concat/Resampling/joint wrappers). Called
    by chimera-train on the TRAIN split only; the jitted step's
    prepare_batch (train/train_step.py) undoes both transforms on device."""
    seen = set()

    def walk(ds):
        if id(ds) in seen or ds is None:
            return
        seen.add(id(ds))
        if isinstance(ds, SpeechToTextDataset):
            ds.wire_int16 = bool(int16)
            ds.device_mask = bool(device_mask)
        subs = getattr(ds, "datasets", None)
        if isinstance(subs, dict):
            for sub in subs.values():
                walk(sub)
        elif isinstance(subs, (list, tuple)):
            for sub in subs:
                walk(sub)
        inner = getattr(ds, "dataset", None)
        if inner is not None and not callable(inner):
            walk(inner)

    walk(dataset)


def resample_sizes(
    sizes: Sequence[int], alpha: float
) -> np.ndarray:
    """Temperature resampling ratios over splits
    (reference: speech_to_text_dataset.py:497-520 get_size_ratios)."""
    sizes = np.asarray(sizes, np.float64)
    probs = sizes / sizes.sum()
    smoothed = probs**alpha
    smoothed /= smoothed.sum()
    return smoothed / probs
