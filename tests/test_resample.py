"""Polyphase device resampler quality tests vs scipy.signal.resample_poly."""

import numpy as np
import pytest

import jax.numpy as jnp

from adx_tpu.ops.audio import resample_poly_device


@pytest.mark.parametrize("up,down", [(160, 441), (441, 160), (1, 2), (2, 1), (16000, 44100)])
def test_resample_length_matches_scipy(up, down):
    from scipy.signal import resample_poly

    x = np.random.default_rng(0).standard_normal(44100).astype(np.float32)
    got = np.asarray(resample_poly_device(jnp.asarray(x), up, down))
    want = resample_poly(x, up, down)
    assert got.shape == want.shape


def test_resample_preserves_tone_frequency():
    sr_in, sr_out = 44100, 16000
    n = sr_in  # 1 second
    t = np.arange(n) / sr_in
    f0 = 1000.0
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    y = np.asarray(resample_poly_device(jnp.asarray(x), sr_out, sr_in))
    spec = np.abs(np.fft.rfft(y[800:-800] * np.hanning(len(y) - 1600)))
    freqs = np.fft.rfftfreq(len(y) - 1600, 1 / sr_out)
    peak = freqs[np.argmax(spec)]
    assert abs(peak - f0) < 3.0


def test_resample_antialiasing():
    """Content above the output Nyquist must be strongly attenuated."""
    sr_in, sr_out = 44100, 16000
    n = sr_in
    t = np.arange(n) / sr_in
    x = np.sin(2 * np.pi * 12000.0 * t).astype(np.float32)  # > 8 kHz Nyquist
    y = np.asarray(resample_poly_device(jnp.asarray(x), sr_out, sr_in))
    in_rms = np.sqrt(np.mean(x**2))
    out_rms = np.sqrt(np.mean(y[800:-800] ** 2))
    assert out_rms < 0.02 * in_rms  # ≥ 34 dB suppression


def test_resample_close_to_scipy_waveform():
    from scipy.signal import resample_poly

    rng = np.random.default_rng(1)
    x = rng.standard_normal(22050).astype(np.float32)
    got = np.asarray(resample_poly_device(jnp.asarray(x), 160, 441))
    want = resample_poly(x, 160, 441)
    # interior agreement (different windows ⇒ not bit-equal)
    g, w = got[200:-200], want[200:-200]
    corr = np.dot(g, w) / (np.linalg.norm(g) * np.linalg.norm(w))
    assert corr > 0.99


def test_resample_batched():
    x = np.random.default_rng(2).standard_normal((3, 8820)).astype(np.float32)
    got = np.asarray(resample_poly_device(jnp.asarray(x), 160, 441))
    one = np.asarray(resample_poly_device(jnp.asarray(x[0]), 160, 441))
    assert got.shape == (3, one.shape[0])
    np.testing.assert_allclose(got[0], one, atol=1e-5)


def test_load_audio_trims_at_native_rate(tmp_path):
    """librosa.load seeks int(offset*sr_native) and reads
    int(duration*sr_native) native frames, THEN resamples the excerpt —
    boundary samples must match resampling the native-trimmed signal, not
    slicing a full-file resample."""
    from adx_tpu.io.audio_io import load_audio, write_wav
    from adx_tpu.ops.audio import resample_poly

    native_sr, target_sr = 8000, 16000
    rng = np.random.default_rng(4)
    y = (0.4 * rng.standard_normal(3 * native_sr)).astype(np.float32)
    p = tmp_path / "x.wav"
    write_wav(p, y, native_sr)
    y_q = np.clip(np.round(y * 32768.0), -32768, 32767) / 32768.0  # PCM16

    got, sr_out = load_audio(p, sr=target_sr, offset=0.5, duration=1.25)
    assert sr_out == target_sr
    excerpt = y_q[int(0.5 * native_sr): int(0.5 * native_sr) + int(1.25 * native_sr)]
    want = resample_poly(excerpt.astype(np.float32), native_sr, target_sr)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-7)

    # no-resample path: identical to plain native slicing
    got_n, _ = load_audio(p, sr=native_sr, offset=0.5, duration=1.25)
    np.testing.assert_allclose(got_n, excerpt, atol=1e-7)


def test_resample_fourier_matches_scipy_even_odd():
    """scipy.signal.resample parity incl. the even-length Nyquist-bin
    corrections (upsample halves the old Nyquist bin, downsample doubles
    the real part of the new one — omitting them doubled a pure Nyquist
    tone)."""
    from scipy.signal import resample as sp_resample

    from adx_tpu.ops.audio import resample_fourier

    rng = np.random.default_rng(0)
    for n_in, n_out in [(64, 128), (128, 64), (100, 250), (250, 100),
                        (63, 128), (128, 63), (64, 96), (96, 64)]:
        x = rng.standard_normal(n_in)
        want = sp_resample(x, n_out)
        got = np.asarray(resample_fourier(jnp.asarray(x), n_out))
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=f"{n_in}->{n_out}")
    nyq = np.cos(np.pi * np.arange(64))
    np.testing.assert_allclose(
        np.asarray(resample_fourier(jnp.asarray(nyq), 128)),
        sp_resample(nyq, 128), atol=1e-6,
    )


def test_pcm16_libsndfile_scale_and_idempotent_roundtrip(tmp_path):
    """quantize scales by 32768 like libsndfile (the reference's soundfile
    writer): 0.5 -> 16384, and write->read->write is a fixed point (the old
    32767-write/32768-read pair decayed one LSB per trip)."""
    from adx_tpu.io.audio_io import (
        pcm16_quantize, pcm16_roundtrip, read_wav, write_wav,
    )

    assert pcm16_quantize(np.array([0.5]))[0] == 16384
    assert pcm16_quantize(np.array([1.0]))[0] == 32767   # clip, not wrap
    assert pcm16_quantize(np.array([-1.0]))[0] == -32768

    rng = np.random.default_rng(9)
    y = (0.7 * rng.standard_normal(2048)).astype(np.float32)
    once = pcm16_roundtrip(y)
    np.testing.assert_array_equal(pcm16_roundtrip(once), once)

    p = tmp_path / "q.wav"
    write_wav(p, y, 8000)
    back, sr = read_wav(p)
    assert sr == 8000
    np.testing.assert_array_equal(back, once)  # file path == in-memory twin
