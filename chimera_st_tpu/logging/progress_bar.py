"""Progress logging (reference: fairseq/logging/progress_bar.py:28-355).

json / simple / tqdm / noop wrappers around an epoch iterable, with an
optional TensorBoard side channel (tensorboardX if available).
"""

from __future__ import annotations

import json
import logging
import sys
from collections import OrderedDict
from numbers import Number
from typing import Optional

logger = logging.getLogger(__name__)


def progress_bar(
    iterator,
    log_format: Optional[str] = None,
    log_interval: int = 100,
    epoch: Optional[int] = None,
    prefix: Optional[str] = None,
    tensorboard_logdir: Optional[str] = None,
    default_log_format: str = "simple",
):
    if log_format is None:
        log_format = default_log_format
    if log_format == "json":
        bar = JsonProgressBar(iterator, epoch, prefix, log_interval)
    elif log_format == "none":
        bar = NoopProgressBar(iterator, epoch, prefix)
    elif log_format == "simple":
        bar = SimpleProgressBar(iterator, epoch, prefix, log_interval)
    elif log_format == "tqdm":
        try:
            from tqdm import tqdm

            bar = TqdmProgressBar(iterator, epoch, prefix)
        except ImportError:
            bar = SimpleProgressBar(iterator, epoch, prefix, log_interval)
    else:
        raise ValueError(f"Unknown log format: {log_format}")

    if tensorboard_logdir:
        bar = TensorboardProgressBarWrapper(bar, tensorboard_logdir)
    return bar


def format_stat(stat):
    if isinstance(stat, Number):
        if isinstance(stat, int):
            return "{:g}".format(stat)
        return "{:.3f}".format(stat) if abs(stat) < 1e4 else "{:.3g}".format(stat)
    if hasattr(stat, "item"):
        return format_stat(stat.item())
    if hasattr(stat, "elapsed_time"):
        return "{:g}".format(round(stat.elapsed_time))
    return str(stat)


class BaseProgressBar:
    def __init__(self, iterable, epoch=None, prefix=None):
        self.iterable = iterable
        self.n = getattr(iterable, "n", 0)
        self.epoch = epoch
        self.prefix = ""
        if epoch is not None:
            self.prefix += f"epoch {epoch:03d}"
        if prefix is not None:
            self.prefix += (" | " if self.prefix else "") + prefix

    def __len__(self):
        return len(self.iterable)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def __iter__(self):
        raise NotImplementedError

    def log(self, stats, tag=None, step=None):
        raise NotImplementedError

    def print(self, stats, tag=None, step=None):
        raise NotImplementedError

    def update_config(self, config):
        pass

    def _str_commas(self, stats):
        return ", ".join(f"{k}={v}" for k, v in stats.items())

    def _str_pipes(self, stats):
        return " | ".join(f"{k} {v}" for k, v in stats.items())

    def _format_stats(self, stats):
        return OrderedDict((k, format_stat(v)) for k, v in stats.items())


class NoopProgressBar(BaseProgressBar):
    def __iter__(self):
        return iter(self.iterable)

    def log(self, stats, tag=None, step=None):
        pass

    def print(self, stats, tag=None, step=None):
        pass


class JsonProgressBar(BaseProgressBar):
    def __init__(self, iterable, epoch=None, prefix=None, log_interval=100):
        super().__init__(iterable, epoch, prefix)
        self.log_interval = log_interval
        self.i = None
        self.size = None

    def __iter__(self):
        self.size = len(self.iterable)
        for i, obj in enumerate(self.iterable, start=self.n):
            self.i = i
            yield obj

    def log(self, stats, tag=None, step=None):
        step = step or (self.i or 0)
        if step > 0 and self.log_interval and step % self.log_interval == 0:
            update = (
                self.epoch - 1 + (self.i + 1) / float(self.size)
                if self.epoch is not None and self.size
                else None
            )
            stats = self._format_stats(stats, epoch=self.epoch, update=update)
            logger.info(json.dumps(stats))

    def print(self, stats, tag=None, step=None):
        stats = self._format_stats(stats, epoch=self.epoch)
        if tag is not None:
            stats = OrderedDict((tag + "_" + k, v) for k, v in stats.items())
        logger.info(json.dumps(stats))

    def _format_stats(self, stats, epoch=None, update=None):
        out = OrderedDict()
        if epoch is not None:
            out["epoch"] = epoch
        if update is not None:
            out["update"] = round(update, 3)
        for k, v in stats.items():
            out[k] = format_stat(v)
        return out


class SimpleProgressBar(BaseProgressBar):
    def __init__(self, iterable, epoch=None, prefix=None, log_interval=100):
        super().__init__(iterable, epoch, prefix)
        self.log_interval = log_interval
        self.i = None
        self.size = None

    def __iter__(self):
        self.size = len(self.iterable)
        for i, obj in enumerate(self.iterable, start=self.n):
            self.i = i
            yield obj

    def log(self, stats, tag=None, step=None):
        step = step or (self.i or 0)
        if step > 0 and self.log_interval and step % self.log_interval == 0:
            stats = self._format_stats(stats)
            postfix = self._str_commas(stats)
            logger.info(f"{self.prefix}: {self.i + 1:5d} / {self.size}  {postfix}")

    def print(self, stats, tag=None, step=None):
        postfix = self._str_pipes(self._format_stats(stats))
        logger.info(f"{self.prefix} | {postfix}")


class TqdmProgressBar(BaseProgressBar):
    def __init__(self, iterable, epoch=None, prefix=None):
        super().__init__(iterable, epoch, prefix)
        from tqdm import tqdm

        self.tqdm = tqdm(
            iterable, self.prefix, leave=False, disable=not sys.stderr.isatty()
        )

    def __iter__(self):
        return iter(self.tqdm)

    def log(self, stats, tag=None, step=None):
        self.tqdm.set_postfix(self._format_stats(stats), refresh=False)

    def print(self, stats, tag=None, step=None):
        postfix = self._str_pipes(self._format_stats(stats))
        logger.info(f"{self.prefix} | {postfix}")


class TensorboardProgressBarWrapper(BaseProgressBar):
    def __init__(self, wrapped_bar, tensorboard_logdir):
        self.wrapped_bar = wrapped_bar
        self.tensorboard_logdir = tensorboard_logdir
        self._writers = {}
        try:
            from tensorboardX import SummaryWriter

            self.SummaryWriter = SummaryWriter
        except ImportError:
            logger.warning("tensorboardX not found; tensorboard logging disabled")
            self.SummaryWriter = None

    def _writer(self, key):
        if self.SummaryWriter is None:
            return None
        if key not in self._writers:
            import os

            self._writers[key] = self.SummaryWriter(
                os.path.join(self.tensorboard_logdir, key)
            )
        return self._writers[key]

    def __len__(self):
        return len(self.wrapped_bar)

    def __iter__(self):
        return iter(self.wrapped_bar)

    def log(self, stats, tag=None, step=None):
        self._log_to_tensorboard(stats, tag, step)
        self.wrapped_bar.log(stats, tag=tag, step=step)

    def print(self, stats, tag=None, step=None):
        self._log_to_tensorboard(stats, tag, step)
        self.wrapped_bar.print(stats, tag=tag, step=step)

    def _log_to_tensorboard(self, stats, tag=None, step=None):
        writer = self._writer(tag or "")
        if writer is None:
            return
        if step is None:
            step = stats.get("num_updates", 0)
        for key in stats.keys() - {"num_updates"}:
            v = stats[key]
            if hasattr(v, "item"):
                v = v.item()
            if hasattr(v, "avg"):
                v = v.avg
            if isinstance(v, Number):
                writer.add_scalar(key, v, step)
        writer.flush()
