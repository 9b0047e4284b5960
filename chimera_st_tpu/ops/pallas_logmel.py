"""Fused Pallas log-mel frontend (TPU).

The fbank-mode reference pipeline computes features on the host loader
(reference: fairseq/data/audio/audio_utils.py:58-111). This kernel runs the
whole frontend on-device in one VMEM pass per 128-frame block, structured as
pure MXU matmuls:

- DC removal, pre-emphasis, the povey window and the DFT are all LINEAR maps
  on the 400-tap frame, so they fold into one pair of cos/sin bases computed
  host-side: spectrum = frame @ (T^t W C) with T = preemph(dc_remove), W the
  window, C the DFT matrix. The kernel never shifts/concats samples — Mosaic
  lane-offset concats miscompile for non-128-aligned chunk widths,
- framing never materializes in HBM: each frame is the concat of three
  160-sample chunks (shift-aligned streams fed as three BlockSpec inputs),
  and instead of concatenating, each stream multiplies its own ROW SLICE of
  the folded bases: frame @ B == a @ B[0:160] + b @ B[160:320] + c @ B[320:400],
- power -> mel matmul -> log stay in VMEM; only [F, 80] leaves per block.

Pallas has no FFT; at frame length 400 a dense DFT is ~0.4 MFLOP/frame — MXU
territory, not worth an FFT.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .fbank import mel_filterbank, povey_window

FRAME_LEN = 400  # 25 ms @ 16 kHz
FRAME_SHIFT = 160  # 10 ms
FFT_SIZE = 512
N_BINS = FFT_SIZE // 2 + 1
FRAMES_PER_BLOCK = 128


@functools.lru_cache(maxsize=4)
def _folded_bases(num_mel_bins: int, sample_rate: int, preemphasis: float,
                  remove_dc: bool):
    """cos/sin DFT bases with window, pre-emphasis and DC removal folded in,
    split per 160-chunk stream; plus mel weights."""
    L = FRAME_LEN
    w = povey_window(L).astype(np.float64)
    l = np.arange(L)
    k = np.arange(N_BINS)
    ang = 2.0 * math.pi * np.outer(l, k) / FFT_SIZE
    cos_b = np.cos(ang) * w[:, None]
    sin_b = -np.sin(ang) * w[:, None]

    T = np.eye(L)
    if remove_dc:
        T = T - np.full((L, L), 1.0 / L)
    if preemphasis > 0:
        P = np.eye(L)
        P[np.arange(1, L), np.arange(L - 1)] = -preemphasis
        P[0, 0] = 1.0 - preemphasis  # kaldi: first sample vs itself
        T = P @ T
    cos_f = (T.T @ cos_b).astype(np.float32)  # [400, 257]
    sin_f = (T.T @ sin_b).astype(np.float32)
    mel = mel_filterbank(num_mel_bins, FFT_SIZE, sample_rate).T.copy()  # [257, M]
    S = FRAME_SHIFT
    split = lambda m: (m[:S].copy(), m[S : 2 * S].copy(), m[2 * S :].copy())
    return split(cos_f), split(sin_f), mel


def logmel_pallas(
    wav: jax.Array,  # [B, T] float32
    num_mel_bins: int = 80,
    sample_rate: int = 16000,
    preemphasis: float = 0.97,
    remove_dc: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """[B, T] -> [B, F, num_mel_bins]; F = 1 + (T - 400) // 160 (snip edges)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T = wav.shape
    num_frames = max(1 + (T - FRAME_LEN) // FRAME_SHIFT, 0) if T >= FRAME_LEN else 0
    if num_frames == 0:
        return jnp.zeros((B, 0, num_mel_bins), jnp.float32)
    n_blocks = -(-num_frames // FRAMES_PER_BLOCK)
    padded_frames = n_blocks * FRAMES_PER_BLOCK
    FP, S = FRAMES_PER_BLOCK, FRAME_SHIFT
    need = (padded_frames + 2) * S
    wav_p = jnp.pad(wav, ((0, 0), (0, max(need - T, 0))))
    # three shift-aligned chunk streams [B, padded_frames, 160]
    streams = [
        jax.lax.dynamic_slice_in_dim(wav_p, sh * S, padded_frames * S, axis=1)
        .reshape(B, padded_frames, S)
        for sh in range(3)
    ]
    # the c-stream only contributes its first 80 taps (400 = 160+160+80):
    # zero the folded bases' unused rows instead of slicing lanes in-kernel
    (cos_a, cos_c1, cos_c2), (sin_a, sin_c1, sin_c2), mel_w = _folded_bases(
        num_mel_bins, sample_rate, preemphasis, remove_dc
    )
    tail = FRAME_LEN - 2 * S  # 80
    cos_c2p = np.zeros((S, N_BINS), np.float32)
    cos_c2p[:tail] = cos_c2
    sin_c2p = np.zeros((S, N_BINS), np.float32)
    sin_c2p[:tail] = sin_c2

    def kernel(a_ref, b_ref, c_ref, cab_ref, sab_ref, c2_ref, s2_ref, mel_ref, out_ref):
        a, bb, cc = a_ref[0], b_ref[0], c_ref[0]
        re = (
            jnp.dot(a, cab_ref[0], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
            + jnp.dot(bb, cab_ref[1], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
            + jnp.dot(cc, c2_ref[0], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        )
        im = (
            jnp.dot(a, sab_ref[0], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
            + jnp.dot(bb, sab_ref[1], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
            + jnp.dot(cc, s2_ref[0], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        )
        power = re * re + im * im
        mel = jnp.dot(power, mel_ref[:, :], preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        out_ref[0, :, :] = jnp.log(jnp.maximum(mel, 1.1920929e-07))

    cos_ab = np.stack([cos_a, cos_c1])  # [2, 160, 257]
    sin_ab = np.stack([sin_a, sin_c1])

    stream_spec = pl.BlockSpec(
        (1, FP, S), lambda b, f: (b, f, 0), memory_space=pltpu.VMEM
    )
    const2 = lambda shape: pl.BlockSpec(
        shape, lambda b, f: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, padded_frames, num_mel_bins), jnp.float32),
        grid=(B, n_blocks),
        in_specs=[
            stream_spec,
            stream_spec,
            stream_spec,
            const2((2, S, N_BINS)),
            const2((2, S, N_BINS)),
            const2((1, S, N_BINS)),
            const2((1, S, N_BINS)),
            const2((N_BINS, num_mel_bins)),
        ],
        out_specs=pl.BlockSpec(
            (1, FP, num_mel_bins), lambda b, f: (b, f, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        *streams,
        jnp.asarray(cos_ab),
        jnp.asarray(sin_ab),
        jnp.asarray(cos_c2p[None]),
        jnp.asarray(sin_c2p[None]),
        jnp.asarray(mel_w),
    )
    return out[:, :num_frames, :]
