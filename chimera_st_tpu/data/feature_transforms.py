"""Audio feature transforms (reference: fairseq/data/audio/feature_transforms/):
registry + composite, SpecAugment (freq/time masking), global and
utterance CMVN. Applied host-side in the data pipeline (fbank mode)."""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..config.registry import Registry

FEATURE_TRANSFORMS = Registry("feature_transform")


def register_feature_transform(name):
    return FEATURE_TRANSFORMS.register(name)


class CompositeAudioFeatureTransform:
    @classmethod
    def from_config_dict(cls, config: Optional[Dict]):
        if config is None or "transforms" not in config:
            return None
        transforms = []
        for name in config["transforms"]:
            transforms.append(
                FEATURE_TRANSFORMS.get(name).from_config_dict(config.get(name, {}))
            )
        return cls(transforms)

    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, x: np.ndarray) -> np.ndarray:
        for t in self.transforms:
            x = t(x)
        return x


@register_feature_transform("specaugment")
class SpecAugmentTransform:
    """Freq/time masking + time warp (reference:
    feature_transforms/specaugment.py:12-80 — the reference warps via
    sparse_image_warp; here the same piecewise-linear time warp is a direct
    per-channel np.interp resample, which is what a single-control-point
    sparse warp along time reduces to). ``time_warp_W=0`` (default) matches
    the lb/ld policies that ship with warp disabled."""

    @classmethod
    def from_config_dict(cls, config: Optional[Dict] = None):
        c = config or {}
        return cls(
            freq_mask_n=c.get("freq_mask_N", 1),
            freq_mask_f=c.get("freq_mask_F", 27),
            time_mask_n=c.get("time_mask_N", 1),
            time_mask_t=c.get("time_mask_T", 100),
            time_mask_p=c.get("time_mask_p", 1.0),
            time_warp_w=c.get("time_warp_W", 0),
        )

    def __init__(self, freq_mask_n=1, freq_mask_f=27, time_mask_n=1,
                 time_mask_t=100, time_mask_p=1.0, time_warp_w=0):
        self.freq_mask_n = freq_mask_n
        self.freq_mask_f = freq_mask_f
        self.time_mask_n = time_mask_n
        self.time_mask_t = time_mask_t
        self.time_mask_p = time_mask_p
        self.time_warp_w = time_warp_w

    def _time_warp(self, spec: np.ndarray) -> np.ndarray:
        T, F = spec.shape
        W = self.time_warp_w
        if W <= 0 or T <= 2 * W + 1:
            return spec
        center = np.random.randint(W, T - W)
        w = np.random.randint(-W, W + 1)
        if w == 0:
            return spec
        # control points: 0 -> 0, center -> center + w, T-1 -> T-1
        src_pts = np.array([0.0, center + w, T - 1.0])
        dst_pts = np.array([0.0, float(center), T - 1.0])
        # sample positions in the ORIGINAL spec for each output frame
        sample_at = np.interp(np.arange(T, dtype=np.float64), src_pts, dst_pts)
        lo = np.floor(sample_at).astype(np.int64)
        hi = np.minimum(lo + 1, T - 1)
        frac = (sample_at - lo)[:, None]
        return (1.0 - frac) * spec[lo] + frac * spec[hi]

    def __call__(self, spec: np.ndarray) -> np.ndarray:
        # spec: [T, F]
        spec = spec.copy()
        T, F = spec.shape
        spec = self._time_warp(spec).astype(spec.dtype)
        mean = spec.mean()
        for _ in range(self.freq_mask_n):
            f = np.random.randint(0, self.freq_mask_f + 1)
            if f > 0 and f < F:
                f0 = np.random.randint(0, F - f)
                spec[:, f0 : f0 + f] = mean
        max_t = min(self.time_mask_t, int(self.time_mask_p * T))
        for _ in range(self.time_mask_n):
            t = np.random.randint(0, max_t + 1) if max_t > 0 else 0
            if t > 0 and t < T:
                t0 = np.random.randint(0, T - t)
                spec[t0 : t0 + t, :] = mean
        return spec


@register_feature_transform("global_cmvn")
class GlobalCMVN:
    @classmethod
    def from_config_dict(cls, config: Optional[Dict] = None):
        c = config or {}
        stats = np.load(c["stats_npz_path"])
        return cls(stats["mean"], stats["std"])

    def __init__(self, mean: np.ndarray, std: np.ndarray):
        self.mean = mean
        self.std = np.maximum(std, 1e-8)

    def __call__(self, x: np.ndarray) -> np.ndarray:
        return (x - self.mean) / self.std


@register_feature_transform("utterance_cmvn")
class UtteranceCMVN:
    @classmethod
    def from_config_dict(cls, config: Optional[Dict] = None):
        c = config or {}
        return cls(c.get("norm_means", True), c.get("norm_vars", True))

    def __init__(self, norm_means=True, norm_vars=True):
        self.norm_means = norm_means
        self.norm_vars = norm_vars

    def __call__(self, x: np.ndarray) -> np.ndarray:
        mean = x.mean(axis=0) if self.norm_means else 0.0
        std = x.std(axis=0) if self.norm_vars else 1.0
        return (x - mean) / np.maximum(std, 1e-8)
