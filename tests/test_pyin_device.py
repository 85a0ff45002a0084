"""Device-batched pyin (features/pyin_device.py) vs the host path
(features/pyin.py, itself librosa-exact — see its module docstring).

The contract: decoded states — and therefore f0 values, which both paths
take from the same f64 bin_freqs grid — agree exactly on these signals;
voiced_prob agrees to f32 noise. The length-bucket identity-step masking
must make ONE compiled program serve every length in a bucket with output
identical to an unpadded decode.
"""

import numpy as np
import pytest

import adx_tpu.features.pyin_device as PD
from adx_tpu.features.pyin import note_to_hz, pyin

FMIN, FMAX = note_to_hz("C2"), note_to_hz("C7")
SR = 22050


@pytest.fixture(autouse=True)
def _small_bucket(monkeypatch):
    # keep the Viterbi scan short on the CPU test mesh
    monkeypatch.setattr(PD, "LENGTH_BUCKET", 1 << 15)


def _mk(n, rng):
    t = np.arange(n) / SR
    return np.stack([
        0.3 * np.sin(2 * np.pi * (196 + 50 * np.sin(2 * np.pi * 2 * t)) * t)
        + 0.05 * rng.standard_normal(n),
        0.1 * np.sin(2 * np.pi * 523 * t) * np.sin(2 * np.pi * 0.25 * t)
        + 0.03 * rng.standard_normal(n),
        0.05 * rng.standard_normal(n),  # unvoiced noise
    ]).astype(np.float32)


def _assert_matches_host(waves, f0b, vb, pb, sr=SR):
    for i in range(waves.shape[0]):
        f0h, vh, ph = pyin(waves[i], FMIN, FMAX, sr=sr)
        assert f0b.shape[1] == len(f0h)
        assert np.array_equal(vb[i], vh), f"voiced flags differ (sig {i})"
        both = vb[i] & vh
        if both.any():
            assert np.array_equal(f0b[i][both], f0h[both]), f"f0 differs (sig {i})"
        assert np.isnan(f0b[i][~vb[i]]).all()
        np.testing.assert_allclose(pb[i], ph, atol=5e-7)


def test_pyin_batch_matches_host(rng):
    waves = _mk(SR * 2, rng)
    f0b, vb, pb = PD.pyin_batch(waves, FMIN, FMAX, sr=SR)
    _assert_matches_host(waves, f0b, vb, pb)


@pytest.mark.parametrize("n", [SR * 2 + 1234, int(SR * 1.43)])
def test_pyin_batch_bucket_masking(n, rng):
    """Different lengths inside one bucket reuse one program; the identity
    steps past T_real must leave the decode of the real frames unchanged."""
    waves = _mk(n, rng)
    f0b, vb, pb = PD.pyin_batch(waves, FMIN, FMAX, sr=SR)
    _assert_matches_host(waves, f0b, vb, pb)


def test_pyin_batch_sr_quirk(rng):
    """44.1 kHz samples through the reference's sr=22050 default
    (src/feature_extraction.py:11-13) — the device path must reproduce the
    host quirk, not resample."""
    n = 44100 * 2
    t = np.arange(n) / 44100
    w = (0.3 * np.sin(2 * np.pi * 330 * t)
         + 0.2 * np.sin(2 * np.pi * 661 * t)
         + 0.04 * rng.standard_normal(n)).astype(np.float32)[None]
    f0b, vb, pb = PD.pyin_batch(w, FMIN, FMAX)  # default sr=22050
    _assert_matches_host(w, f0b, vb, pb, sr=22050)


def test_pyin_batch_device_resident_input(rng):
    """A jax-array input skips the host pad path (callers pass the batch
    already shipped once for all feature programs)."""
    import jax.numpy as jnp

    waves = _mk(SR, rng)
    f0a, va, pa = PD.pyin_batch(waves, FMIN, FMAX, sr=SR)
    f0b, vb, pb = PD.pyin_batch(jnp.asarray(waves), FMIN, FMAX, sr=SR)
    assert np.array_equal(va, vb)
    both = va & vb
    assert np.array_equal(f0a[both], f0b[both])
    np.testing.assert_allclose(pa, pb, atol=1e-7)


def test_pyin_batch_validates(rng):
    with pytest.raises(ValueError, match="win_length"):
        PD.pyin_batch(_mk(SR, rng), FMIN, FMAX, sr=SR, win_length=2000)
    with pytest.raises(ValueError, match=r"\[B, n\]"):
        PD.pyin_batch(np.zeros(100, np.float32), FMIN, FMAX, sr=SR)


def test_pyin_batch_short_signal(rng):
    """A clip barely longer than one frame decodes without shape errors and
    matches the host path (identity-step masking covers most of the padded
    scan)."""
    n = 3000  # ~2 frames at hop 512
    t = np.arange(n) / SR
    w = (0.3 * np.sin(2 * np.pi * 220 * t)
         + 0.01 * rng.standard_normal(n)).astype(np.float32)[None]
    f0b, vb, pb = PD.pyin_batch(w, FMIN, FMAX, sr=SR)
    _assert_matches_host(w, f0b, vb, pb)


def test_pyin_batch_b1(rng):
    """B=1 (the sweep drivers' singleton groups route through here)."""
    waves = _mk(SR, rng)[:1]
    f0b, vb, pb = PD.pyin_batch(waves, FMIN, FMAX, sr=SR)
    _assert_matches_host(waves, f0b, vb, pb)
