"""Epoch batch iterators (reference: fairseq/data/iterators.py:27-566).

`EpochBatchIterator` keeps the reference's contract — frozen batch list,
per-epoch shuffle seeded by (seed, epoch), shard slicing with fill, and a
checkpointable ``state_dict`` with ``iterations_in_epoch`` for mid-epoch
resume — plus a background-thread prefetcher that overlaps host-side collation
with device compute (replaces BufferedIterator, iterators.py:503-566)."""

from __future__ import annotations

import itertools
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterable, Iterator, List, Optional

import numpy as np


_INFER = object()


class CountingIterator:
    """Iterator wrapper that counts elements (reference: iterators.py:27).

    ``total`` defaults to the iterable's length when it has one; pass
    ``total=None`` explicitly for an unsized/streaming source (then
    ``has_next`` answers by peeking one element)."""

    def __init__(self, iterable, start: int = 0, total=_INFER):
        self._itr = iter(iterable)
        self.n = start
        self.total = (
            start + len(iterable) if total is _INFER and hasattr(iterable, "__len__")
            else (None if total is _INFER else total)
        )

    def __len__(self):
        return self.total if self.total is not None else 0

    def __iter__(self):
        return self

    _SENTINEL = object()

    def __next__(self):
        if self.total is not None and self.n >= self.total:
            raise StopIteration
        if getattr(self, "_peeked", self._SENTINEL) is not self._SENTINEL:
            x, self._peeked = self._peeked, self._SENTINEL
        else:
            x = next(self._itr)
        self.n += 1
        return x

    def has_next(self) -> bool:
        if self.total is not None:
            return self.n < self.total
        # unsized source (streaming): peek one element to answer truthfully
        if getattr(self, "_peeked", self._SENTINEL) is self._SENTINEL:
            try:
                self._peeked = next(self._itr)
            except StopIteration:
                return False
        return True

    def skip(self, n: int) -> "CountingIterator":
        # a pending has_next() peek is the FIRST upcoming element — it must
        # count toward the skip, or the stale peeked item would be yielded
        # out of order after the skipped window (review fix)
        take = n
        if take > 0 and getattr(self, "_peeked", self._SENTINEL) \
                is not self._SENTINEL:
            self._peeked = self._SENTINEL
            take -= 1
        next(itertools.islice(self._itr, take, take), None)
        self.n += n
        return self


class GroupedIterator(CountingIterator):
    """Groups `chunk_size` elements (update_freq; reference: iterators.py:438).

    Review fixes: a 0-length inner (CountingIterator over a streaming source
    reports len 0, not unsized) no longer yields total=0, and the inherited
    has_next/skip API works (they read self._itr, which was never set)."""

    def __init__(self, iterable, chunk_size: int):
        self.chunk_size = chunk_size
        inner_len = len(iterable) if hasattr(iterable, "__len__") else None
        if not inner_len:  # None OR 0 (unsized sources report len 0)
            inner_len = None
        total = (
            -(-inner_len // chunk_size) if inner_len is not None else None
        )
        self._inner = iter(iterable)
        self._itr = self._chunks()  # inherited has_next/skip consume this
        # a mid-epoch-resumed CountingIterator arrives with n=offset: group
        # counters must scale like the reference (iterators.py GroupedIterator
        # start=ceil(inner.n/chunk)), else len()/has_next() report a full
        # epoch on every resumed epoch (review fix)
        inner_n = int(getattr(iterable, "n", 0) or 0)
        self.n = -(-inner_n // chunk_size) if inner_n > 0 else 0
        self.total = total

    def _chunks(self):
        while True:
            chunk = list(itertools.islice(self._inner, self.chunk_size))
            if not chunk:
                return
            yield chunk

    def __next__(self):
        if self.total is not None and self.n >= self.total:
            raise StopIteration
        if getattr(self, "_peeked", self._SENTINEL) is not self._SENTINEL:
            chunk, self._peeked = self._peeked, self._SENTINEL
        else:
            chunk = next(self._itr)
        self.n += 1
        return chunk


class BackgroundPrefetcher:
    """Prefetch from an iterator on a daemon thread (bounded queue)."""

    _SENTINEL = object()

    def __init__(self, iterable, buffer_size: int = 4):
        self._queue: "queue.Queue" = queue.Queue(maxsize=max(buffer_size, 1))
        self._len = len(iterable) if hasattr(iterable, "__len__") else None
        self._error = None
        self._thread = threading.Thread(
            target=self._worker, args=(iter(iterable),), daemon=True
        )
        self._thread.start()

    def _worker(self, itr):
        try:
            for x in itr:
                self._queue.put(x)
        except BaseException as e:  # re-raised on the consumer side
            self._error = e
        finally:
            self._queue.put(self._SENTINEL)

    def __len__(self):
        return self._len if self._len is not None else 0

    def __iter__(self):
        return self

    def __next__(self):
        # the worker enqueues exactly one sentinel; remember exhaustion so a
        # later next() (e.g. a has_next peek) re-raises instead of blocking
        if getattr(self, "_done", False):
            raise StopIteration
        x = self._queue.get()
        if x is self._SENTINEL:
            self._done = True
            if self._error is not None:
                raise self._error
            raise StopIteration
        return x


class ParallelPrefetcher:
    """Multi-worker ordered collation pipeline (the TPU-host answer to torch
    DataLoader workers + BufferedIterator, reference
    fairseq/data/iterators.py:503-566).

    Three stages, all off the consumer thread:

    1. a ``ThreadPoolExecutor(num_workers)`` runs ``work_fn(item)`` for up to
       ``num_workers + buffer_size`` items concurrently (wav read, feature
       prep and the numpy pad copy all release the GIL, so threads scale
       without the fork cost and batch-pickle wire of process workers),
    2. a single *stager* thread consumes completed futures IN SUBMIT ORDER —
       the output stream is bit-identical to serial iteration whenever
       ``work_fn`` is per-item deterministic — and applies the optional
       ``post_fn`` (the Trainer's device_put: dispatching the host->device
       transfer here double-buffers it behind device compute),
    3. a bounded queue hands finished batches to the consumer.

    Worker exceptions propagate to the consumer at the failing item's
    position; later items are dropped."""

    _SENTINEL = object()

    def __init__(self, items, work_fn, num_workers: int = 4,
                 buffer_size: int = 4, post_fn=None):
        items = list(items)
        self._len = len(items)
        self._queue: "queue.Queue" = queue.Queue(maxsize=max(buffer_size, 1))
        self._error = None
        self._pool = ThreadPoolExecutor(
            max_workers=max(num_workers, 1),
            thread_name_prefix="chimera-collate",
        )
        self._stager = threading.Thread(
            target=self._stage,
            args=(items, work_fn, max(num_workers, 1) + max(buffer_size, 1),
                  post_fn),
            daemon=True,
        )
        self._stager.start()

    def _stage(self, items, work_fn, max_in_flight, post_fn):
        import collections

        pending: "collections.deque" = collections.deque()
        it = iter(items)
        try:
            for item in itertools.islice(it, max_in_flight):
                pending.append(self._pool.submit(work_fn, item))
            while pending:
                x = pending.popleft().result()
                nxt = next(it, self._SENTINEL)
                if nxt is not self._SENTINEL:
                    pending.append(self._pool.submit(work_fn, nxt))
                if post_fn is not None:
                    x = post_fn(x)
                self._queue.put(x)
        except BaseException as e:  # re-raised on the consumer side
            self._error = e
            for f in pending:
                f.cancel()
        finally:
            self._pool.shutdown(wait=False)
            self._queue.put(self._SENTINEL)

    def __len__(self):
        return self._len

    def __iter__(self):
        return self

    def __next__(self):
        if getattr(self, "_done", False):
            raise StopIteration
        x = self._queue.get()
        if x is self._SENTINEL:
            self._done = True
            if self._error is not None:
                raise self._error
            raise StopIteration
        return x


class EpochBatchIterator:
    """reference: iterators.py:195-437.

    Args:
        dataset_collate: fn(list_of_indices) -> batch (host-side collation)
        batches: frozen list of index arrays (from batch_by_size)
    """

    def __init__(
        self,
        dataset_collate: Callable[[np.ndarray], Any],
        batches,  # List[np.ndarray] | Callable[[int], List[np.ndarray]]
        seed: int = 1,
        num_shards: int = 1,
        shard_id: int = 0,
        buffer_size: int = 4,
        skip_remainder_batch: bool = False,
        num_workers: int = 1,
    ):
        """``batches`` may be a callable epoch -> batch list for datasets that
        re-sample per epoch (ResamplingDataset; the callable must also call
        the dataset's set_epoch — see ChimeraTask.make_batch_iterator).

        ``num_workers > 1`` collates batches on a thread pool
        (ParallelPrefetcher; reference --num-workers DataLoader semantics).
        ``device_put_fn`` — settable attribute, applied to each collated
        batch on the stager thread (the Trainer sets it to its to_device so
        host->device transfers overlap device compute)."""
        import inspect

        self.collate = dataset_collate
        try:
            self._collate_takes_epoch = (
                "epoch" in inspect.signature(dataset_collate).parameters
            )
        except (TypeError, ValueError):
            self._collate_takes_epoch = False
        if callable(batches):
            self._batches_fn = batches
            self._batches_cache = (None, None)  # (epoch, list)
        else:
            self._batches_fn = None
            self._batches_cache = (None, list(batches))
        self.seed = seed
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.buffer_size = buffer_size
        self.skip_remainder_batch = skip_remainder_batch
        self.num_workers = max(int(num_workers), 1)
        self.device_put_fn: Optional[Callable[[Any], Any]] = None
        self.epoch = 1
        self._cur: Optional[CountingIterator] = None
        self._next_epoch_itr: Optional[CountingIterator] = None
        self.shuffle = True

    @property
    def frozen_batches(self) -> List[np.ndarray]:
        cached_epoch, cached = self._batches_cache
        if self._batches_fn is None:
            return cached
        if cached_epoch != self.epoch:
            self._batches_cache = (self.epoch, self._batches_fn(self.epoch))
        return self._batches_cache[1]

    @property
    def first_batch(self):
        if not self.frozen_batches:
            return None
        if self._collate_takes_epoch:
            return self.collate(self.frozen_batches[0], epoch=self.epoch)
        return self.collate(self.frozen_batches[0])

    def __len__(self):
        return -(-len(self.frozen_batches) // self.num_shards)

    @property
    def n(self) -> int:
        return self.iterations_in_epoch

    @property
    def iterations_in_epoch(self) -> int:
        if self._cur is not None:
            return self._cur.n
        if self._next_epoch_itr is not None:
            # a checkpoint written between load_state_dict and the first
            # next_epoch_itr must keep the mid-epoch offset (reference
            # iterators.py:268-273; review fix)
            return self._next_epoch_itr.n
        return 0

    def _shuffled(self, epoch: int, shuffle: bool) -> List[np.ndarray]:
        batches = list(self.frozen_batches)
        if shuffle:
            rng = np.random.default_rng([self.seed, epoch])
            order = rng.permutation(len(batches))
            batches = [batches[i] for i in order]
        # shard with fill so every shard sees the same number of batches
        # (reference: ShardedIterator fill batches)
        n = len(batches)
        per = -(-n // self.num_shards)
        sharded = [
            batches[(self.shard_id + i * self.num_shards) % max(n, 1)]
            for i in range(per)
        ] if n else []
        return sharded

    def next_epoch_itr(self, shuffle: bool = True, offset: int = 0):
        if self._next_epoch_itr is not None:
            itr = self._next_epoch_itr
            self._next_epoch_itr = None
        else:
            batches = self._shuffled(self.epoch, shuffle)
            total = len(batches)
            if offset > 0:
                # resume is O(1): drop the already-consumed batch indices
                # BEFORE collation (review fix: skip() used to pull every
                # skipped batch — audio reads included — through the
                # prefetcher); the counter still starts at `offset`
                batches = batches[offset:]
            if self._collate_takes_epoch:
                ep = self.epoch
                work = lambda b: self.collate(b, epoch=ep)  # noqa: E731
            else:
                work = self.collate
            put = self.device_put_fn
            if self.num_workers > 1 and self.buffer_size > 0:
                source: Any = ParallelPrefetcher(
                    batches, work, num_workers=self.num_workers,
                    buffer_size=self.buffer_size, post_fn=put,
                )
            else:
                gen = (work(b) for b in batches)
                if put is not None:
                    gen = (put(x) for x in gen)
                source = BackgroundPrefetcher(
                    _SizedGenerator(gen, len(batches)), self.buffer_size
                ) if self.buffer_size > 0 else _SizedGenerator(gen, len(batches))
            itr = CountingIterator(source, total=total, start=offset)
        self.shuffle = shuffle
        self._cur = itr
        return itr

    def end_of_epoch(self) -> bool:
        return self._cur is None or not self._cur.has_next()

    def next_epoch(self):
        self.epoch += 1
        self._cur = None

    def state_dict(self):
        return {
            "epoch": self.epoch,
            "iterations_in_epoch": self.iterations_in_epoch,
            "shuffle": self.shuffle,
        }

    def load_state_dict(self, state):
        self.epoch = state.get("epoch", 1)
        offset = state.get("iterations_in_epoch", 0)
        shuffle = state.get("shuffle", True)
        if offset > 0 and offset < len(self):
            self._next_epoch_itr = None
            itr = self.next_epoch_itr(shuffle=shuffle, offset=offset)
            self._next_epoch_itr = itr
            self._cur = None
        else:
            if offset >= len(self) > 0:
                self.epoch += 1  # checkpoint was at epoch boundary


class _SizedGenerator:
    def __init__(self, gen, n):
        self._gen = gen
        self._n = n

    def __len__(self):
        return self._n

    def __iter__(self):
        return iter(self._gen)


class StreamingEpochBatchIterator:
    """Epoch iterator over an iterable dataset that yields ready batches
    (reference: iterators.py:142-193 StreamingEpochBatchIterator).

    For unsized/streaming corpora there is no frozen batch list to shuffle or
    to mid-epoch-resume into; the contract shrinks to per-epoch iteration
    (``set_epoch`` forwarded to the dataset), shard slicing, and an
    epoch-granular ``state_dict``. ``num_shards``/``shard_id`` keep the
    reference signature; under single-program SPMD one process feeds the
    global batch, so the default 1/0 is the normal case."""

    def __init__(self, dataset, epoch: int = 1, num_shards: int = 1,
                 shard_id: int = 0, buffer_size: int = 0):
        self.dataset = dataset
        self.epoch = max(int(epoch), 1)
        self.num_shards = int(num_shards)
        self.shard_id = int(shard_id)
        self.buffer_size = int(buffer_size)
        # settable, like EpochBatchIterator: applied to each yielded batch
        # (on the prefetch thread when buffer_size > 0)
        self.device_put_fn: Optional[Callable[[Any], Any]] = None
        self._cur: Optional[CountingIterator] = None

    @property
    def next_epoch_idx(self) -> int:
        if self._cur is not None and self.end_of_epoch():
            return self.epoch + 1
        return self.epoch

    def next_epoch_itr(self, shuffle: bool = True, offset: int = 0):
        self.epoch = self.next_epoch_idx
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self.epoch)
        source: Any = self.dataset
        if self.num_shards > 1:
            source = itertools.islice(
                iter(source), self.shard_id, None, self.num_shards
            )
        if self.device_put_fn is not None:
            put = self.device_put_fn
            source = (put(x) for x in iter(source))
        if self.buffer_size > 0:
            source = BackgroundPrefetcher(source, self.buffer_size)
        self._cur = CountingIterator(source, total=None)
        return self._cur

    def end_of_epoch(self) -> bool:
        return self._cur is None or not self._cur.has_next()

    def next_epoch(self):
        """Advance the epoch counter after an exhausted epoch (parity with
        EpochBatchIterator.next_epoch for the train-loop contract). Clears
        the exhausted iterator so the following next_epoch_itr does not see
        end_of_epoch()==True and advance AGAIN (review fix: every epoch >= 2
        fed set_epoch an index one ahead, breaking resume determinism)."""
        self.epoch = self.next_epoch_idx
        self._cur = None

    @property
    def iterations_in_epoch(self) -> int:
        return self._cur.n if self._cur is not None else 0

    def state_dict(self):
        return {"epoch": self.epoch}

    def load_state_dict(self, state):
        self.epoch = state.get("epoch", 1)
