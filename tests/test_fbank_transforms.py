import numpy as np
import pytest

from chimera_st_tpu.data.feature_transforms import (
    CompositeAudioFeatureTransform,
    GlobalCMVN,
    SpecAugmentTransform,
    UtteranceCMVN,
)
from chimera_st_tpu.ops.fbank import logmel_jax, logmel_numpy, mel_filterbank


def test_logmel_shapes():
    wav = np.random.default_rng(0).normal(size=16000).astype(np.float32)
    feats = logmel_numpy(wav)
    # 1s @ 16kHz, 25ms/10ms snip-edges -> 98 frames, 80 bins
    assert feats.shape == (98, 80)
    assert np.isfinite(feats).all()


def test_logmel_jax_matches_numpy():
    import jax.numpy as jnp

    wav = np.random.default_rng(1).normal(size=(2, 4000)).astype(np.float32)
    ref = np.stack([logmel_numpy(w) for w in wav])
    out = np.asarray(logmel_jax(jnp.asarray(wav)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_logmel_sensitivity_to_frequency():
    # a 1 kHz tone must put its energy in a consistent mel bin
    sr = 16000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    feats = logmel_numpy(tone, sample_rate=sr)
    peak_bin = feats.mean(axis=0).argmax()
    tone2 = np.sin(2 * np.pi * 4000 * t).astype(np.float32)
    peak_bin2 = logmel_numpy(tone2, sample_rate=sr).mean(axis=0).argmax()
    assert peak_bin2 > peak_bin  # higher freq -> higher mel bin


def test_mel_filterbank_rows_sum_positive():
    fb = mel_filterbank(80, 512, 16000)
    assert fb.shape == (80, 257)
    assert (fb.sum(axis=1) > 0).all()


def test_specaugment_masks():
    np.random.seed(0)
    spec = np.ones((50, 20), np.float32) * 5.0
    t = SpecAugmentTransform(freq_mask_n=2, freq_mask_f=5, time_mask_n=2, time_mask_t=10)
    out = t(spec)
    assert out.shape == spec.shape
    # some positions should be set to the mean (5.0 everywhere -> mean = 5, so
    # use a non-constant spec to detect masking)
    spec2 = np.arange(1000, dtype=np.float32).reshape(50, 20)
    out2 = t(spec2)
    assert (out2 != spec2).any()


def test_cmvn():
    x = np.random.default_rng(2).normal(loc=3.0, scale=2.0, size=(100, 8)).astype(np.float32)
    out = UtteranceCMVN()(x)
    np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std(axis=0), 1.0, atol=1e-4)
    g = GlobalCMVN(x.mean(axis=0), x.std(axis=0))
    np.testing.assert_allclose(g(x).mean(axis=0), 0.0, atol=1e-5)


def test_composite_from_config():
    comp = CompositeAudioFeatureTransform.from_config_dict(
        {"transforms": ["utterance_cmvn", "specaugment"],
         "specaugment": {"freq_mask_N": 1, "freq_mask_F": 3}}
    )
    x = np.random.default_rng(3).normal(size=(30, 10)).astype(np.float32)
    out = comp(x)
    assert out.shape == x.shape


def test_specaugment_time_warp():
    """reference: specaugment.py:12-80 sparse_image_warp time warp — shape
    preserved, energy approximately preserved, frames actually move."""
    import numpy as np

    from chimera_st_tpu.data.feature_transforms import SpecAugmentTransform

    t = SpecAugmentTransform(freq_mask_n=0, time_mask_n=0, time_warp_w=8)
    rng = np.random.default_rng(0)
    spec = rng.normal(size=(80, 12)).astype(np.float32)
    np.random.seed(3)
    out = t(spec)
    assert out.shape == spec.shape
    assert np.isfinite(out).all()
    # warp is a resample: values stay within the original min/max envelope
    assert out.min() >= spec.min() - 1e-5 and out.max() <= spec.max() + 1e-5
    # at least one draw moves frames
    moved = False
    for seed in range(5):
        np.random.seed(seed)
        if not np.allclose(t(spec), spec):
            moved = True
            break
    assert moved
    # W=0 is identity
    t0 = SpecAugmentTransform(freq_mask_n=0, time_mask_n=0, time_warp_w=0)
    np.testing.assert_array_equal(t0(spec), spec)
