"""Kaldi-compatible log-mel filterbank frontend.

Replaces the reference's host-side pykaldi/torchaudio fbank
(reference: fairseq/data/audio/audio_utils.py:58-111) with two
implementations sharing one parameterization:

- `logmel_numpy`: host-side, for dataset-prep parity with kaldi defaults
  (25 ms povey window, 10 ms shift, preemphasis 0.97, snip-edges, 80 mels,
  low 20 Hz),
- `logmel_jax`: the same computation as an on-device XLA program (framing as
  strided gather -> window -> rFFT -> mel matmul on the MXU -> log), so the
  fbank-mode pipeline can run fused on TPU instead of on the host loader.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial
from typing import Tuple

import numpy as np


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def povey_window(n: int) -> np.ndarray:
    # kaldi "povey": hann^0.85
    i = np.arange(n, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(2 * math.pi * i / (n - 1))
    return (hann**0.85).astype(np.float32)


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + np.asarray(freq, np.float64) / 700.0)


@lru_cache(maxsize=8)
def mel_filterbank(
    num_bins: int, fft_size: int, sample_rate: int, low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """[num_bins, fft_size // 2 + 1] triangular mel weights (kaldi-style)."""
    nyquist = sample_rate / 2.0
    high = nyquist + high_freq if high_freq <= 0 else high_freq
    mel_low, mel_high = mel_scale(low_freq), mel_scale(high)
    mel_points = np.linspace(mel_low, mel_high, num_bins + 2)
    bins = fft_size // 2 + 1
    fft_freqs = np.arange(bins) * sample_rate / fft_size
    fft_mels = mel_scale(fft_freqs)
    weights = np.zeros((num_bins, bins), np.float64)
    for m in range(num_bins):
        left, center, right = mel_points[m], mel_points[m + 1], mel_points[m + 2]
        up = (fft_mels - left) / (center - left)
        down = (right - fft_mels) / (right - center)
        weights[m] = np.maximum(0.0, np.minimum(up, down))
    return weights.astype(np.float32)


def frame_signal(
    wav: np.ndarray, frame_len: int, frame_shift: int, snip_edges: bool = True
) -> np.ndarray:
    n = len(wav)
    if snip_edges:
        num_frames = max(0, 1 + (n - frame_len) // frame_shift)
    else:
        num_frames = (n + frame_shift // 2) // frame_shift
    idx = np.arange(frame_len)[None, :] + frame_shift * np.arange(num_frames)[:, None]
    idx = np.minimum(idx, n - 1)
    return wav[idx]


def logmel_numpy(
    wav: np.ndarray,
    sample_rate: int = 16000,
    num_mel_bins: int = 80,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    preemphasis: float = 0.97,
    dither: float = 0.0,
    remove_dc: bool = True,
) -> np.ndarray:
    """[T] waveform -> [num_frames, num_mel_bins] log-mel features."""
    frame_len = int(sample_rate * frame_length_ms / 1000)
    frame_shift = int(sample_rate * frame_shift_ms / 1000)
    fft_size = _next_pow2(frame_len)
    frames = frame_signal(wav.astype(np.float32), frame_len, frame_shift)
    if dither > 0:
        frames = frames + dither * np.random.standard_normal(frames.shape).astype(
            np.float32
        )
    if remove_dc:
        frames = frames - frames.mean(axis=1, keepdims=True)
    if preemphasis > 0:
        pre = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - preemphasis * pre
    frames = frames * povey_window(frame_len)[None, :]
    spec = np.fft.rfft(frames, n=fft_size, axis=1)
    power = (spec.real**2 + spec.imag**2).astype(np.float32)
    mel = power @ mel_filterbank(num_mel_bins, fft_size, sample_rate).T
    return np.log(np.maximum(mel, 1.1920929e-07)).astype(np.float32)


def logmel_jax(
    wav,  # [B, T]
    sample_rate: int = 16000,
    num_mel_bins: int = 80,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    preemphasis: float = 0.97,
    remove_dc: bool = True,
):
    """Batched on-device log-mel: [B, T] -> [B, F, num_mel_bins]."""
    import jax.numpy as jnp

    frame_len = int(sample_rate * frame_length_ms / 1000)
    frame_shift = int(sample_rate * frame_shift_ms / 1000)
    fft_size = _next_pow2(frame_len)
    B, T = wav.shape
    num_frames = max(0, 1 + (T - frame_len) // frame_shift)
    starts = frame_shift * jnp.arange(num_frames)
    idx = starts[:, None] + jnp.arange(frame_len)[None, :]
    frames = wav[:, idx]  # [B, F, L]
    if remove_dc:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    if preemphasis > 0:
        pre = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - preemphasis * pre
    frames = frames * jnp.asarray(povey_window(frame_len))[None, None, :]
    spec = jnp.fft.rfft(frames, n=fft_size, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    mel_w = jnp.asarray(mel_filterbank(num_mel_bins, fft_size, sample_rate))
    mel = jnp.einsum("bfl,ml->bfm", power, mel_w)
    return jnp.log(jnp.maximum(mel, 1.1920929e-07))
