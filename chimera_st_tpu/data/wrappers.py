"""Wrapper datasets: concatenation and per-epoch resampling.

TPU-native rebuild of the reference's multi-corpus training machinery
(reference: fairseq/data/concat_dataset.py, fairseq/data/resampling_dataset.py,
used by fairseq/data/audio/speech_to_text_dataset.py:497-557 and
triplet_dataset.py:357-370 for temperature-based multi-split training).

Wrappers expose the same host-side dataset interface the tasks consume
(`__len__`, `num_tokens`, `__getitem__`, `collater`, `set_epoch`); batches are
re-packed per epoch by the iterator when a dataset supports ``set_epoch``.
"""

from __future__ import annotations

import bisect
import logging
from typing import Any, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


class IdStampedConcat:
    """Concat view over datasets that SHARE one collater implementation,
    stamping each item's ``id`` with its GLOBAL index (so task-level collate
    rngs keyed on ids stay unique across parts). One implementation for the
    multilingual-LM / multilingual-denoising / semisupervised concat views
    (review fix: three near-identical copies lived in the task files)."""

    def __init__(self, parts):
        self.parts = list(parts)
        self.offsets = np.cumsum([0] + [len(p) for p in self.parts])

    def __len__(self):
        return int(self.offsets[-1])

    def _locate(self, i: int):
        k = int(np.searchsorted(self.offsets, i, side="right") - 1)
        return self.parts[k], i - int(self.offsets[k])

    def num_tokens(self, i: int) -> int:
        ds, j = self._locate(i)
        return ds.num_tokens(j)

    def __getitem__(self, i: int):
        ds, j = self._locate(i)
        item = dict(ds[j])
        item["id"] = i
        return item

    def collater(self, samples, *args, **kwargs):
        return self.parts[0].collater(samples, *args, **kwargs)

    def set_epoch(self, epoch: int):
        for p in self.parts:
            if hasattr(p, "set_epoch"):
                p.set_epoch(epoch)


class ConcatDataset:
    """Concatenate datasets, optionally repeating each an integer number of
    times (reference: fairseq/data/concat_dataset.py ConcatDataset with
    sample_ratios)."""

    def __init__(self, datasets: Sequence[Any], sample_ratios: Optional[Sequence[int]] = None):
        assert len(datasets) > 0
        self.datasets = list(datasets)
        if sample_ratios is None:
            sample_ratios = [1] * len(self.datasets)
        elif isinstance(sample_ratios, int):
            sample_ratios = [sample_ratios] * len(self.datasets)
        self.sample_ratios = [int(r) for r in sample_ratios]
        self.cumulative_sizes = np.cumsum(
            [int(r) * len(d) for d, r in zip(self.datasets, self.sample_ratios)]
        ).tolist()

    def _map_index(self, idx: int):
        ds_idx = bisect.bisect_right(self.cumulative_sizes, idx)
        offset = 0 if ds_idx == 0 else self.cumulative_sizes[ds_idx - 1]
        return ds_idx, (idx - offset) % len(self.datasets[ds_idx])

    def __len__(self):
        return self.cumulative_sizes[-1]

    def __getitem__(self, idx: int):
        ds_idx, local = self._map_index(int(idx))
        return self.datasets[ds_idx][local]

    def num_tokens(self, idx: int) -> int:
        ds_idx, local = self._map_index(int(idx))
        return self.datasets[ds_idx].num_tokens(local)

    def collater(self, samples, **kwargs):
        return self.datasets[0].collater(samples, **kwargs)

    def set_epoch(self, epoch: int):
        for d in self.datasets:
            if hasattr(d, "set_epoch"):
                d.set_epoch(epoch)

    def __getattr__(self, name):
        # delegate dataset-specific attributes (split, tgt_dict, ...) to the
        # first child so task code treating this as a plain dataset still works
        return getattr(self.datasets[0], name)


class ResamplingDataset:
    """Randomly re-samples a dataset each epoch (reference:
    fairseq/data/resampling_dataset.py:15-120).

    With ``replace=True`` draws ``ceil(len * size_ratio)`` indices with
    replacement; without replacement ``size_ratio`` must be < 1. The draw is
    seeded by (seed, epoch) so mid-epoch checkpoint resume replays the same
    samples."""

    def __init__(
        self,
        dataset,
        size_ratio: float = 1.0,
        replace: bool = True,
        seed: int = 0,
        epoch: int = 1,
    ):
        assert size_ratio > 0.0
        if not replace:
            assert size_ratio < 1.0
        self.dataset = dataset
        self.size_ratio = float(size_ratio)
        self.replace = replace
        self.seed = seed
        self.actual_size = int(np.ceil(len(dataset) * self.size_ratio))
        self._cur_epoch: Optional[int] = None
        self._cur_indices: Optional[np.ndarray] = None
        self.set_epoch(epoch)

    def __len__(self):
        return self.actual_size

    def set_epoch(self, epoch: int):
        if epoch == self._cur_epoch:
            return
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)
        self._cur_epoch = epoch
        rng = np.random.default_rng([self.seed, epoch])
        self._cur_indices = rng.choice(
            len(self.dataset), self.actual_size, replace=self.replace
        )

    def __getitem__(self, idx: int):
        return self.dataset[int(self._cur_indices[int(idx)])]

    def num_tokens(self, idx: int) -> int:
        return self.dataset.num_tokens(int(self._cur_indices[int(idx)]))

    def collater(self, samples, **kwargs):
        return self.dataset.collater(samples, **kwargs)

    def __getattr__(self, name):
        return getattr(self.__dict__["dataset"], name)


class _TokenWrapper:
    """Base for token-level wrappers over datasets whose items are 1-D token
    arrays or dicts with 'source'/'target' arrays."""

    def __init__(self, dataset):
        self.dataset = dataset

    def __len__(self):
        return len(self.dataset)

    def collater(self, samples, **kwargs):
        return self.dataset.collater(samples, **kwargs)

    def set_epoch(self, epoch):
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __getattr__(self, name):
        return getattr(self.__dict__["dataset"], name)


class AppendTokenDataset(_TokenWrapper):
    """Append a token to every item (reference:
    fairseq/data/append_token_dataset.py)."""

    def __init__(self, dataset, token: int):
        super().__init__(dataset)
        self.token = int(token)

    def __getitem__(self, i):
        item = self.dataset[int(i)]
        return np.concatenate([item, [self.token]]).astype(item.dtype)

    def num_tokens(self, i):
        return self.dataset.num_tokens(int(i)) + 1


class PrependTokenDataset(_TokenWrapper):
    """Prepend a token (reference: fairseq/data/prepend_token_dataset.py)."""

    def __init__(self, dataset, token: int):
        super().__init__(dataset)
        self.token = int(token)

    def __getitem__(self, i):
        item = self.dataset[int(i)]
        return np.concatenate([[self.token], item]).astype(item.dtype)

    def num_tokens(self, i):
        return self.dataset.num_tokens(int(i)) + 1


class TruncateDataset(_TokenWrapper):
    """Truncate items to a maximum length (reference:
    fairseq/data/truncate_dataset.py)."""

    def __init__(self, dataset, max_len: int):
        super().__init__(dataset)
        self.max_len = int(max_len)

    def __getitem__(self, i):
        return self.dataset[int(i)][: self.max_len]

    def num_tokens(self, i):
        return min(self.dataset.num_tokens(int(i)), self.max_len)


class SubsampleDataset(_TokenWrapper):
    """Deterministic fractional subsample (reference:
    fairseq/data/subsample_dataset.py)."""

    def __init__(self, dataset, size_ratio: float, seed: int = 0):
        super().__init__(dataset)
        assert 0.0 < size_ratio <= 1.0
        n = max(int(len(dataset) * size_ratio), 1)
        rng = np.random.default_rng(seed)
        self.indices = np.sort(rng.choice(len(dataset), n, replace=False))

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[int(self.indices[int(i)])]

    def num_tokens(self, i):
        return self.dataset.num_tokens(int(self.indices[int(i)]))


class BacktranslationDataset:
    """Monolingual target-side dataset whose SOURCES are synthesized at
    collate time by a caller-provided backtranslation function
    (reference: fairseq/data/backtranslation_dataset.py — there the tgt->src
    model runs inside the collater too; here ``backtranslate_fn`` receives
    the list of target token arrays and returns source token arrays, so any
    jitted generator composes)."""

    def __init__(self, tgt_dataset, backtranslate_fn, output_collater):
        self.tgt_dataset = tgt_dataset
        self.backtranslate_fn = backtranslate_fn
        self.output_collater = output_collater

    def __len__(self):
        return len(self.tgt_dataset)

    def __getitem__(self, i):
        return self.tgt_dataset[int(i)]

    def num_tokens(self, i):
        return self.tgt_dataset.num_tokens(int(i))

    def collater(self, samples, **kwargs):
        sources = self.backtranslate_fn(samples)
        pairs = [
            {"source": np.asarray(s), "target": np.asarray(t)}
            for s, t in zip(sources, samples)
        ]
        return self.output_collater(pairs, **kwargs)


class LRUCacheDataset(_TokenWrapper):
    """Cache recent __getitem__ results (reference:
    fairseq/data/lru_cache_dataset.py — avoids re-decoding expensive items
    like audio when batches revisit indices)."""

    def __init__(self, dataset, max_size: int = 1024):
        super().__init__(dataset)
        from collections import OrderedDict

        self._cache = OrderedDict()
        self._max = int(max_size)

    def __getitem__(self, i):
        i = int(i)
        if i in self._cache:
            self._cache.move_to_end(i)
            return self._cache[i]
        item = self.dataset[i]
        self._cache[i] = item
        if len(self._cache) > self._max:
            self._cache.popitem(last=False)
        return item

    def num_tokens(self, i):
        return self.dataset.num_tokens(int(i))


class ColorizeDataset(_TokenWrapper):
    """Attach a per-sentence integer ``colors`` entry to collated batches
    (reference: fairseq/data/colorize_dataset.py — used to tag language or
    domain ids for models that consume them).

    ``color_getter(dataset, id)`` follows the reference signature; items must
    be dicts carrying an ``id`` (the repo's pair/manifest datasets all do)."""

    def __init__(self, dataset, color_getter):
        super().__init__(dataset)
        self.color_getter = color_getter

    def __getitem__(self, i):
        return self.dataset[int(i)]

    def num_tokens(self, i):
        return self.dataset.num_tokens(int(i))

    def collater(self, samples, **kwargs):
        batch = self.dataset.collater(samples, **kwargs)
        if batch:
            batch["colors"] = np.asarray(
                [self.color_getter(self.dataset, s["id"]) for s in samples],
                np.int32,
            )
        return batch


class MultiCorpusSampledDataset:
    """Several corpora in one dataset; every batch comes wholly from ONE
    corpus, chosen by a sampling function at collate time (reference:
    fairseq/data/multi_corpus_sampled_dataset.py).

    Each global index addresses all corpora (wrapping modulo each length), so
    the batcher sees ``sum(len(d))`` items; the collater then picks the corpus
    for the whole batch. Whole-corpus batches keep per-batch shapes
    homogeneous — one jit shape bucket per corpus instead of a mixed-shape
    explosion. Delta from the reference: corpus choice uses a dataset-owned
    seeded Generator (reseeded by ``set_epoch``) rather than global
    ``np.random``, so runs are reproducible."""

    def __init__(self, datasets, sampling_func=None, seed: int = 0):
        assert len(datasets) > 0
        self.datasets = dict(datasets)  # insertion-ordered
        self.keys = list(self.datasets.keys())
        self.seed = int(seed)
        self._rng = np.random.default_rng(self.seed)
        self.sampling_func = sampling_func
        self.total = sum(len(d) for d in self.datasets.values())

    def _pick_key(self):
        if self.sampling_func is not None:
            return self.sampling_func(self.keys)
        return self.keys[int(self._rng.integers(len(self.keys)))]

    def __len__(self):
        return self.total

    def __getitem__(self, idx: int):
        i = int(idx)
        return {
            key: ds[i % len(ds)] for key, ds in self.datasets.items()
        }

    def num_tokens(self, idx: int) -> int:
        # max across corpora (reference :112-121): batching must budget for
        # whichever corpus the collater ends up picking
        i = int(idx)
        return max(
            ds.num_tokens(i % len(ds)) for ds in self.datasets.values()
        )

    def collater(self, samples, **kwargs):
        if not samples:
            return None
        key = self._pick_key()
        picked = [s[key] for s in samples]
        return self.datasets[key].collater(picked, **kwargs)

    def set_epoch(self, epoch: int):
        self._rng = np.random.default_rng(self.seed + int(epoch))
        for ds in self.datasets.values():
            if hasattr(ds, "set_epoch"):
                ds.set_epoch(epoch)


class MultiCorpusDataset:
    """Per-ITEM corpus mixing under an explicit probability distribution
    (reference: fairseq/data/multi_corpus_dataset.py — unlike
    MultiCorpusSampledDataset, the corpus is drawn per sample, so one batch
    can mix corpora; all members must be the same dataset type because the
    first member's collater serves the mixed batch).

    The reference draws the corpus lazily inside ``ordered_indices`` with
    ``numpy_seed(seed, epoch)``; our batching framework has no
    ordered_indices hook, so each ``set_epoch`` materializes the equivalent
    virtual index map up front: slot i -> (corpus, internal index), corpora
    drawn i.i.d. from the distribution and internal indices consumed from
    per-corpus reshuffled permutations that rewind when exhausted — the same
    sampling process, batched. The reference's ``sort_indices`` option is
    inherent here: the task's ``filtered_indices`` always length-sorts."""

    def __init__(self, datasets, distribution, seed: int = 0):
        assert len(datasets) > 0
        self.datasets = dict(datasets)
        self.keys = list(self.datasets.keys())
        assert len(distribution) == len(self.keys)
        first = type(next(iter(self.datasets.values())))
        for ds in self.datasets.values():
            if type(ds) is not first:
                raise ValueError(
                    "MultiCorpusDataset members must share one dataset type "
                    "(one collater serves the mixed batch)"
                )
        for key, ds in self.datasets.items():
            if len(ds) == 0:
                raise ValueError(f"MultiCorpusDataset member {key!r} is empty")
        total_p = float(sum(distribution))
        self.distribution = [float(p) / total_p for p in distribution]
        self.seed = int(seed)
        self.total = sum(len(d) for d in self.datasets.values())
        self._resample(1)

    def _resample(self, epoch: int):
        rng = np.random.default_rng((self.seed, int(epoch)))
        corpus = rng.choice(len(self.keys), size=self.total, p=self.distribution)
        self._corpus = corpus
        self._inner = np.zeros(self.total, dtype=np.int64)
        for k, key in enumerate(self.keys):
            slots = np.flatnonzero(corpus == k)
            n, L = len(slots), len(self.datasets[key])
            if n == 0:
                continue
            perms = [rng.permutation(L) for _ in range((n + L - 1) // L)]
            self._inner[slots] = np.concatenate(perms)[:n]

    def __len__(self):
        return self.total

    def _map_index(self, idx: int):
        i = int(idx)
        return self.keys[self._corpus[i]], int(self._inner[i])

    def __getitem__(self, idx: int):
        key, i = self._map_index(idx)
        return self.datasets[key][i]

    def num_tokens(self, idx: int) -> int:
        key, i = self._map_index(idx)
        return self.datasets[key].num_tokens(i)

    def size(self, idx: int):
        key, i = self._map_index(idx)
        return self.datasets[key].size(i)

    def collater(self, samples, **kwargs):
        if not samples:
            return None
        return next(iter(self.datasets.values())).collater(samples, **kwargs)

    def set_epoch(self, epoch: int):
        self._resample(epoch)
        for ds in self.datasets.values():
            if hasattr(ds, "set_epoch"):
                ds.set_epoch(epoch)
