"""Tests for mel filterbanks/inversion, dB scaling, and mask construction."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adx_tpu.ops import (
    amplitude_to_db,
    band_gain_matrix,
    fft_frequencies,
    lime_mask_batch,
    mel_filterbank,
    mel_to_stft,
    melspectrogram,
    occlusion_mask_batch,
    occlusion_patch_grid,
    power_to_db,
    rise_mask_batch,
    smooth_band_keep_mask,
    stft,
)


# --- numpy transcriptions of the librosa/reference formulas ---------------


def np_smooth_band_keep_mask(freqs, low, high, trans=200.0):
    """Verbatim-semantics transcription of the reference's mask
    (src/dsp_band_ops.py:236-259)."""
    f = freqs.astype(float)
    m = np.ones_like(f)
    core = (f >= low) & (f <= high)
    m[core] = 0.0
    if trans > 0:
        tl = (f >= (low - trans)) & (f < low)
        if np.any(tl):
            x = (f[tl] - (low - trans)) / trans
            m[tl] = 0.5 * (1.0 + np.cos(np.pi * x))
        th = (f > high) & (f <= (high + trans))
        if np.any(th):
            x = (f[th] - high) / trans
            m[th] = 0.5 * (1.0 + np.cos(np.pi * (1.0 - x)))
    return np.clip(m, 0.0, 1.0)


def test_fft_frequencies():
    f = fft_frequencies(sr=44100, n_fft=2048)
    assert f.shape == (1025,)
    assert f[0] == 0.0
    np.testing.assert_allclose(f[-1], 22050.0)
    np.testing.assert_allclose(f[1], 44100 / 2048)


def test_smooth_band_keep_mask_matches_reference_formula():
    freqs = fft_frequencies(sr=44100, n_fft=2048)
    for low, high, trans in [(250, 2000, 200.0), (20, 100, 16.0), (8000, 16000, 500.0), (100, 250, 0.0)]:
        got = np.asarray(smooth_band_keep_mask(jnp.asarray(freqs), low, high, trans))
        want = np_smooth_band_keep_mask(freqs, low, high, trans)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_band_gain_matrix_default_preset():
    freqs = fft_frequencies(sr=44100, n_fft=2048)
    bands = [(20, 100), (100, 250), (250, 2000), (2000, 4000), (4000, 8000), (8000, 16000)]
    G = np.asarray(
        band_gain_matrix(
            freqs, bands, attenuation=0.25,
            transition_mode="rel", transition_rel=0.2,
            transition_min_hz=5.0, transition_max_hz=500.0,
        )
    )
    assert G.shape == (6, 1025)
    # inside each band the gain equals the attenuation; far outside it's 1
    for i, (low, high) in enumerate(bands):
        core = (freqs >= low) & (freqs <= high)
        np.testing.assert_allclose(G[i][core], 0.25, atol=1e-6)
    np.testing.assert_allclose(G[0][freqs > 2000], 1.0, atol=1e-6)


def test_occlusion_patch_grid_matches_committed_config():
    # committed config: STFT 1025x10337, patch 1024 frames / 20% freq,
    # stride 1024 / 10% → 10 time x 9 freq positions
    starts, patch_f, patch_t = occlusion_patch_grid(
        n_freq=1025, n_time=10337,
        patch_time_frames=1024, stride_time_frames=1024,
        patch_freq_percent=20.0, stride_freq_percent=10.0,
    )
    assert patch_f == 205 and patch_t == 1024
    t_positions = len(range(0, 10337 - 1024 + 1, 1024))
    f_positions = len(range(0, 1025 - 205 + 1, 102))
    assert len(starts) == t_positions * f_positions
    # ordering: outer time, inner frequency (reference loop order)
    assert starts[0].tolist() == [0, 0]
    assert starts[1].tolist() == [0, 102]


def test_occlusion_mask_batch_small():
    starts, pf, pt = occlusion_patch_grid(8, 10, 4, 4, 50.0, 50.0)
    masks = np.asarray(occlusion_mask_batch(starts, pf, pt, 8, 10, occlusion_value=0.0))
    assert masks.shape == (len(starts), 8, 10)
    m0 = masks[0]
    assert m0[:4, :4].sum() == 0.0
    assert m0[4:, :].min() == 1.0


def test_rise_masks_probability():
    masks = np.asarray(rise_mask_batch(jax.random.key(0), 64, 32, 40, 0.5))
    assert masks.shape == (64, 32, 40)
    assert set(np.unique(masks)) <= {0.0, 1.0}
    assert abs(masks.mean() - 0.5) < 0.02


def test_lime_mask_batch():
    data = lime_mask_batch(jax.random.key(1), 100, 4)
    assert data.shape == (100, 4)
    np.testing.assert_array_equal(data[0], np.ones(4))
    assert set(np.unique(data)) <= {0.0, 1.0}


# --- dB scaling -----------------------------------------------------------


def test_power_to_db_ref_max():
    S = np.abs(np.random.default_rng(0).standard_normal((64, 32))) ** 2
    got = np.asarray(power_to_db(jnp.asarray(S), ref="max"))
    want = 10 * np.log10(np.maximum(S, 1e-10)) - 10 * np.log10(S.max())
    want = np.maximum(want, want.max() - 80.0)
    np.testing.assert_allclose(got, want, atol=2e-3)
    assert got.max() == pytest.approx(0.0, abs=1e-5)


def test_amplitude_to_db_is_power_to_db_of_square():
    S = np.abs(np.random.default_rng(1).standard_normal((16, 8))).astype(np.float32)
    got = np.asarray(amplitude_to_db(jnp.asarray(S), ref="max"))
    want = 20 * np.log10(np.maximum(S, 1e-5)) - 20 * np.log10(S.max())
    want = np.maximum(want, want.max() - 80.0)
    np.testing.assert_allclose(got, want, atol=2e-3)


# --- mel ------------------------------------------------------------------


def test_mel_filterbank_shapes_and_norm():
    fb = np.asarray(mel_filterbank(sr=44100, n_fft=2048, n_mels=128))
    assert fb.shape == (128, 1025)
    assert fb.min() >= 0
    # slaney norm: each filter integrates (in Hz) to ~2/width * width/2 = 1
    freqs = fft_frequencies(44100, 2048)
    df = freqs[1] - freqs[0]
    areas = fb.sum(axis=1) * df
    assert np.all(areas[5:-5] > 0.5) and np.all(areas[5:-5] < 1.5)


def test_mel_filterbank_htk_differs():
    a = np.asarray(mel_filterbank(44100, 2048, 64, htk=False))
    b = np.asarray(mel_filterbank(44100, 2048, 64, htk=True, norm=None))
    assert not np.allclose(a, b)


def test_melspectrogram_equals_manual_projection(short_audio):
    y, sr = short_audio
    y = y[:16384]
    M = np.asarray(melspectrogram(jnp.asarray(y), sr=sr, n_fft=1024, hop_length=256, n_mels=64))
    S = np.abs(np.asarray(stft(jnp.asarray(y), n_fft=1024, hop_length=256))) ** 2
    fb = np.asarray(mel_filterbank(sr, 1024, 64))
    want = fb @ S
    np.testing.assert_allclose(M, want, rtol=1e-3, atol=1e-3 * want.max())


def test_mel_to_stft_approximately_inverts(short_audio):
    y, sr = short_audio
    y = y[:16384]
    S_mag = np.abs(np.asarray(stft(jnp.asarray(y), n_fft=1024, hop_length=256)))
    fb = np.asarray(mel_filterbank(sr, 1024, 128))
    M = fb @ (S_mag**2)
    S_rec = np.asarray(mel_to_stft(jnp.asarray(M), sr=sr, n_fft=1024, n_mels=128))
    # NNLS residual in the mel domain must be small
    resid = np.linalg.norm(fb @ (S_rec**2) - M) / np.linalg.norm(M)
    assert resid < 0.05


def test_melspectrogram_dft_matches_fft_path(short_audio):
    """The DFT-matmul frontend must match the rFFT path (both f32)."""
    from adx_tpu.ops.mel import melspectrogram_dft

    y, sr = short_audio
    y = y[:16384]
    kw = dict(sr=sr, n_fft=1024, hop_length=256, n_mels=64, htk=True,
              norm=None, pad_mode="reflect")
    a = np.asarray(melspectrogram(jnp.asarray(y), **kw))
    b = np.asarray(melspectrogram_dft(jnp.asarray(y), **kw))
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4 * a.max())


def test_melspectrogram_dft_bf16_close():
    """bf16-input DFT matmuls (f32 accumulation) stay within a fraction of a
    dB of the f32 path — the accuracy contract for bf16 classifier mode."""
    import importlib

    import jax.numpy as jnp

    from adx_tpu.ops.db import power_to_db

    mel_mod = importlib.import_module("adx_tpu.ops.mel")
    rng = np.random.default_rng(0)
    y = rng.standard_normal((2, 8000)).astype(np.float32)
    kw = dict(sr=8000, n_fft=256, hop_length=128, n_mels=64, htk=True, norm=None)
    M32 = np.asarray(mel_mod.melspectrogram_dft(y, **kw))
    M16 = np.asarray(mel_mod.melspectrogram_dft(y, compute_dtype=jnp.bfloat16, **kw))
    db32 = np.asarray(power_to_db(jnp.asarray(M32), ref=1.0, top_db=None))
    db16 = np.asarray(power_to_db(jnp.asarray(np.maximum(M16, 1e-10)), ref=1.0, top_db=None))
    # compare where the f32 bin carries energy (tiny bins are noise-floor)
    mask = db32 > db32.max() - 60
    assert np.abs(db16 - db32)[mask].max() < 0.5
