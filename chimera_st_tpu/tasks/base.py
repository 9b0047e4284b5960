"""Task base class (reference: fairseq/tasks/fairseq_task.py:22-451).

A task owns dictionaries, datasets, and the glue that builds models,
criterions, generators and batch iterators. Differences from the reference,
all driven by XLA's static-shape model:

- `make_batch_iterator` produces bucket-padded batches (bounded compile
  count) instead of ragged pad-to-max batches,
- train/valid stepping lives in the jitted step functions
  (chimera_st_tpu/train), not on the task; tasks provide the criterion and
  batch schema.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..config.registry import ARCHITECTURES, CRITERIONS, MODELS
from ..data.batching import batch_by_size, optimal_buckets, pad_to_bucket
from ..data.dictionary import Dictionary
from ..data.iterators import EpochBatchIterator

logger = logging.getLogger(__name__)


class ChimeraTask:
    # True on tasks whose train batches never carry audio: lets the trainer
    # mask audio-only param subtrees out of the optimizer, matching the
    # reference Adam's grad-is-None skip (optim/freeze.auto_text_only_fixes)
    text_only = False

    def __init__(self, cfg: Dict):
        self.cfg = cfg
        self.datasets: Dict[str, Any] = {}

    # ------------------------------------------------------------- factory

    @classmethod
    def setup_task(cls, cfg: Dict, **kwargs) -> "ChimeraTask":
        return cls(cfg)

    @classmethod
    def load_dictionary(cls, filename: str) -> Dictionary:
        return Dictionary.load(filename)

    # --------------------------------------------------------------- data

    def load_dataset(self, split: str, **kwargs):
        raise NotImplementedError

    def dataset(self, split: str):
        if split not in self.datasets:
            self.load_dataset(split)
        return self.datasets[split]

    # ------------------------------------------------------------ builders

    def build_model(self, model_cfg: Dict, dtype=jnp.float32, param_dtype=jnp.float32):
        import chimera_st_tpu.models  # noqa: F401 — registration side effects

        arch = model_cfg.get("arch") or model_cfg.get("_name")
        full_cfg = self.model_config_overrides(dict(model_cfg))
        if arch in ARCHITECTURES:
            model_name, preset = ARCHITECTURES.get(arch)
            full_cfg = preset(full_cfg)
            builder = MODELS.get(model_name)
        else:
            builder = MODELS.get(arch)
        return builder(full_cfg, dtype=dtype, param_dtype=param_dtype)

    def model_config_overrides(self, cfg: Dict) -> Dict:
        """Inject task-derived fields (vocab sizes) into the model config."""
        if self.target_dictionary is not None:
            cfg.setdefault("tgt_vocab_size", len(self.target_dictionary))
        cfg.setdefault(
            "src_vocab_size",
            len(self.source_dictionary) if self.source_dictionary else None,
        )
        if cfg.get("character_embeddings") and self.target_dictionary is not None:
            # host-built word->byte spelling table for the character-aware
            # embedder (reference transformer_lm.py --character-embeddings);
            # injected here (not persisted — rebuilt from the dictionary on
            # every restore)
            from ..models.character_embedder import build_word_to_char

            cfg.setdefault(
                "word_to_char",
                build_word_to_char(
                    self.target_dictionary, int(cfg.get("max_char_len", 50))
                ),
            )
        return cfg

    def build_criterion(self, crit_cfg: Dict):
        import chimera_st_tpu.criterions  # noqa: F401 — registration side effects

        cfg = dict(crit_cfg)
        if self.target_dictionary is not None:
            cfg.setdefault("padding_idx", self.target_dictionary.pad())
        return CRITERIONS.get(cfg["_name"])(cfg)

    def build_generator(self, model, gen_cfg, reranker=None):
        from ..generation.generator import GeneratorSettings, SequenceGenerator
        from ..generation.nat_generator import build_nat_generator

        # non-autoregressive families decode via whole-sequence refinement,
        # not beam search (reference: fairseq_task.build_generator routing
        # to IterativeRefinementGenerator for NAT models). ``reranker``
        # (ar_model, ar_params) backs --iter-decode-with-external-reranker.
        nat = build_nat_generator(model, gen_cfg, self.target_dictionary,
                                  reranker=reranker)
        if nat is not None:
            if getattr(gen_cfg, "retain_dropout", False):
                raise NotImplementedError(
                    "--retain-dropout is implemented for the beam decode "
                    "path, not NAT refinement loops (loud rejection over a "
                    "silently-deterministic decode)")
            return nat

        g = gen_cfg
        settings = GeneratorSettings(
            beam_size=getattr(g, "beam", 5),
            max_len_a=getattr(g, "max_len_a", 0.0),
            max_len_b=getattr(g, "max_len_b", 200),
            min_len=getattr(g, "min_len", 1),
            min_len_a=getattr(g, "min_len_a", 0.0),
            min_len_b=getattr(g, "min_len_b", 0),
            len_penalty=getattr(g, "lenpen", 1.0),
            unk_penalty=getattr(g, "unkpen", 0.0),
            max_decode_len=getattr(g, "max_decode_len", 256),
            temperature=getattr(g, "temperature", 1.0),
            no_repeat_ngram_size=getattr(g, "no_repeat_ngram_size", 0),
            diverse_beam_groups=getattr(g, "diverse_beam_groups", 0),
            diverse_beam_strength=getattr(g, "diverse_beam_strength", 0.5),
            sampling=getattr(g, "sampling", False),
            seed=getattr(g, "seed", 1),
            sampling_topk=getattr(g, "sampling_topk", -1),
            sampling_topp=getattr(g, "sampling_topp", -1.0),
            diversity_rate=getattr(g, "diversity_rate", -1.0),
            kv_cache_int8=getattr(g, "kv_cache_int8", False),
            retain_dropout=getattr(g, "retain_dropout", False),
        )
        d = self.target_dictionary
        return SequenceGenerator(
            model, settings, pad=d.pad(), eos=d.eos(), unk=d.unk()
        )

    # ------------------------------------------------------------ batching

    def batch_groups(self, dataset) -> Optional[np.ndarray]:
        """Optional [len(dataset)] group ids; when given, batches are packed
        group-pure (no batch straddles two groups). Multilingual tasks use
        this to keep every batch a single language pair."""
        return None

    def make_batch_iterator(
        self,
        dataset,
        max_tokens: Optional[int] = None,
        max_sentences: Optional[int] = None,
        required_batch_size_multiple: int = 1,
        seed: int = 1,
        num_shards: int = 1,
        shard_id: int = 0,
        num_length_buckets: int = 10,
        max_positions: Optional[int] = None,
        buffer_size: int = 4,
        num_workers: int = 1,
    ) -> EpochBatchIterator:
        if len(dataset) == 0:
            raise ValueError(
                "dataset is empty after size filtering — check "
                "min/max sample-size limits against the manifest"
            )

        def build_batches(epoch: int):
            if hasattr(dataset, "set_epoch"):
                dataset.set_epoch(epoch)
            # one num_tokens scan per epoch (review fix: filtered_indices
            # re-scanned the whole dataset for its argsort)
            sizes = np.asarray(
                [dataset.num_tokens(int(i)) for i in range(len(dataset))]
            )
            order = np.argsort(-sizes, kind="stable")
            if max_positions is not None:
                order = order[sizes[order] <= max_positions]
            groups = self.batch_groups(dataset)
            if groups is None:
                return batch_by_size(
                    order,
                    sizes,
                    max_tokens=max_tokens,
                    max_sentences=max_sentences,
                    required_batch_size_multiple=required_batch_size_multiple,
                )
            # group-pure batching (e.g. one language pair per batch): pack
            # each group independently so no sample is ever dropped for
            # landing in a straddling batch (review fix: the multilingual
            # task used to keep only a mixed batch's majority pair, so
            # minority-pair rows were silently never trained on)
            groups = np.asarray(groups)
            batches = []
            for g in np.unique(groups[order]):
                sel = order[groups[order] == g]
                batches.extend(batch_by_size(
                    sel,
                    sizes,
                    max_tokens=max_tokens,
                    max_sentences=max_sentences,
                    required_batch_size_multiple=required_batch_size_multiple,
                ))
            return batches

        sizes0 = np.asarray([dataset.num_tokens(int(i)) for i in range(len(dataset))])
        # bucket edges frozen at epoch 1 so padded shapes (and compiled
        # programs) stay stable across resampled epochs; DP-optimal edges
        # minimize expected padding (13% vs quantiles' 16% per-item pad on a
        # MuST-C-like duration distribution — data/batching.optimal_buckets)
        edges = optimal_buckets(
            sizes0[sizes0 > 0] if (sizes0 > 0).any() else sizes0, num_length_buckets
        )

        import inspect

        collate_takes_epoch = "epoch" in inspect.signature(
            self.collate_indices
        ).parameters

        def collate(idx: np.ndarray, epoch: int = 1):
            batch_max = max(dataset.num_tokens(int(i)) for i in idx)
            target = pad_to_bucket(batch_max, edges)
            if collate_takes_epoch:
                # tasks with host-side per-batch corruption (translation_lev)
                # re-roll noise per epoch like the reference's
                # (seed, epoch, index) keying
                return self.collate_indices(dataset, idx, target, epoch=epoch)
            return self.collate_indices(dataset, idx, target)

        return EpochBatchIterator(
            collate,
            build_batches if hasattr(dataset, "set_epoch") else build_batches(1),
            seed=seed,
            num_shards=num_shards,
            shard_id=shard_id,
            buffer_size=buffer_size,
            num_workers=num_workers,
        )

    def collate_indices(self, dataset, idx: np.ndarray, audio_target_len: int):
        samples = [dataset[int(i)] for i in idx]
        return dataset.collater(samples, audio_target_len)

    # --------------------------------------------------------------- dicts

    @property
    def source_dictionary(self) -> Optional[Dictionary]:
        return None

    @property
    def target_dictionary(self) -> Optional[Dictionary]:
        return None

    # ------------------------------------------------------------- decode

    def post_process_text(self, tokens: np.ndarray, bpe_symbol="sentencepiece") -> str:
        d = self.target_dictionary
        return d.string(tokens, bpe_symbol=bpe_symbol)
