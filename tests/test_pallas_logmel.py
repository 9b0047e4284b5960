"""Pallas log-mel kernel tests (interpret mode — Mosaic-compiled correctness
is exercised on hardware by bench/driver runs)."""

import jax
import jax.numpy as jnp
import numpy as np

from chimera_st_tpu.ops.fbank import logmel_numpy
from chimera_st_tpu.ops.pallas_logmel import logmel_pallas


def test_matches_kaldi_numpy():
    wav = np.random.default_rng(0).normal(size=(2, 16000)).astype(np.float32)
    out = np.asarray(logmel_pallas(jnp.asarray(wav), interpret=True))
    ref = np.stack([logmel_numpy(w) for w in wav])
    assert out.shape == ref.shape == (2, 98, 80)
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_non_multiple_block_lengths():
    # 33000 samples -> 204 frames (not a multiple of 128)
    wav = np.random.default_rng(1).normal(size=(1, 33000)).astype(np.float32)
    out = np.asarray(logmel_pallas(jnp.asarray(wav), interpret=True))
    ref = logmel_numpy(wav[0])
    assert out.shape[1] == ref.shape[0]
    np.testing.assert_allclose(out[0], ref, atol=5e-4)


def test_tone_peak_bin_consistency():
    sr = 16000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 1000 * t).astype(np.float32)[None]
    out = np.asarray(logmel_pallas(jnp.asarray(tone), interpret=True))[0]
    ref = logmel_numpy(tone[0])
    assert out.mean(0).argmax() == ref.mean(0).argmax()
