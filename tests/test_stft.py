"""Golden tests for the STFT/ISTFT/Griffin-Lim kernels.

The reference delegates to librosa (src/spectrogram_explainability.py:364-411);
librosa is not installed here, so the gold standard is a direct, loop-based
numpy transcription of librosa 0.10's documented semantics, against which the
vectorized JAX implementations are checked.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import importlib

stft_mod = importlib.import_module("adx_tpu.ops.stft")
from adx_tpu.ops import istft, griffin_lim, stft


def np_hann(n):
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))


def np_stft_ref(y, n_fft, hop, win_length=None, center=True, pad_mode="constant"):
    """Direct librosa-semantics STFT: loop over frames."""
    win_length = win_length or n_fft
    w = np_hann(win_length)
    lpad = (n_fft - win_length) // 2
    w_full = np.zeros(n_fft)
    w_full[lpad : lpad + win_length] = w
    if center:
        y = np.pad(y, n_fft // 2, mode="constant" if pad_mode == "constant" else "reflect")
    n_frames = 1 + (len(y) - n_fft) // hop
    out = np.empty((n_fft // 2 + 1, n_frames), dtype=np.complex128)
    for t in range(n_frames):
        out[:, t] = np.fft.rfft(y[t * hop : t * hop + n_fft] * w_full)
    return out


def np_istft_ref(S, hop, n_fft=None, win_length=None, center=True):
    """Direct librosa-semantics ISTFT: windowed OLA / window-sum-square."""
    n_fft = n_fft or 2 * (S.shape[0] - 1)
    win_length = win_length or n_fft
    w = np_hann(win_length)
    lpad = (n_fft - win_length) // 2
    w_full = np.zeros(n_fft)
    w_full[lpad : lpad + win_length] = w
    n_frames = S.shape[1]
    out_len = n_fft + hop * (n_frames - 1)
    y = np.zeros(out_len)
    env = np.zeros(out_len)
    for t in range(n_frames):
        frame = np.fft.irfft(S[:, t], n=n_fft)
        y[t * hop : t * hop + n_fft] += frame * w_full
        env[t * hop : t * hop + n_fft] += w_full**2
    nz = env > 1.1754944e-38
    y[nz] /= env[nz]
    if center:
        y = y[n_fft // 2 : -(n_fft // 2)]
    return y


def test_hann_window_matches_scipy():
    from scipy.signal import get_window

    for n in [256, 2048, 401]:
        got = np.asarray(stft_mod.hann_window(n))
        want = get_window("hann", n, fftbins=True)
        np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize(
    "n_fft,hop,win_length",
    [(2048, 512, 2048), (1024, 256, 1024), (2048, 512, 1024), (512, 160, 512)],
)
def test_stft_matches_loop_reference(short_audio, n_fft, hop, win_length):
    y, _ = short_audio
    got = np.asarray(stft(jnp.asarray(y), n_fft=n_fft, hop_length=hop, win_length=win_length))
    want = np_stft_ref(y.astype(np.float64), n_fft, hop, win_length)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=1e-4)
    # relative Frobenius error must be tiny (fp32 vs fp64 FFT)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 1e-5


def test_stft_frame_count_matches_librosa_formula(short_audio):
    y, _ = short_audio
    S = stft(jnp.asarray(y), n_fft=2048, hop_length=512)
    assert S.shape == (1025, 1 + len(y) // 512)


@pytest.mark.parametrize("n_fft,hop", [(2048, 512), (1024, 256)])
def test_istft_matches_loop_reference(short_audio, n_fft, hop):
    y, _ = short_audio
    S = np_stft_ref(y.astype(np.float64), n_fft, hop)
    got = np.asarray(istft(jnp.asarray(S.astype(np.complex64)), hop_length=hop))
    want = np_istft_ref(S, hop)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_stft_istft_roundtrip(short_audio):
    y, _ = short_audio
    S = stft(jnp.asarray(y), n_fft=2048, hop_length=512)
    y_rec = np.asarray(istft(S, hop_length=512, length=len(y)))
    # interior must round-trip to float32 accuracy; edges are attenuated by
    # the half-window (same as librosa with center=True on zero-padded edges)
    np.testing.assert_allclose(y_rec[2048:-2048], y[2048:-2048], atol=1e-4)


def test_stft_batched_equals_single(short_audio):
    y, _ = short_audio
    y2 = np.stack([y, y[::-1].copy()])
    S_b = np.asarray(stft(jnp.asarray(y2), n_fft=1024, hop_length=256))
    S_0 = np.asarray(stft(jnp.asarray(y2[0]), n_fft=1024, hop_length=256))
    S_1 = np.asarray(stft(jnp.asarray(y2[1]), n_fft=1024, hop_length=256))
    np.testing.assert_allclose(S_b[0], S_0, atol=1e-6)
    np.testing.assert_allclose(S_b[1], S_1, atol=1e-6)


def test_istft_batched_equals_single(short_audio):
    y, _ = short_audio
    S = stft(jnp.asarray(np.stack([y, 0.5 * y])), n_fft=1024, hop_length=256)
    got = np.asarray(istft(S, hop_length=256))
    one = np.asarray(istft(S[0], hop_length=256))
    np.testing.assert_allclose(got[0], one, atol=1e-6)
    np.testing.assert_allclose(got[1], 0.5 * one, atol=1e-5)


def test_griffin_lim_reconstructs_magnitude(short_audio):
    y, _ = short_audio
    y = y[:16384]
    S_mag = jnp.abs(stft(jnp.asarray(y), n_fft=1024, hop_length=256))
    y_gl = griffin_lim(
        S_mag, n_iter=32, hop_length=256, n_fft=1024, length=len(y),
        key=jax.random.key(7),
    )
    S_rec = jnp.abs(stft(jnp.asarray(y_gl), n_fft=1024, hop_length=256))
    err = float(
        jnp.linalg.norm(S_rec[..., : S_mag.shape[-1]] - S_mag) / jnp.linalg.norm(S_mag)
    )
    # phase recovery should converge well below the no-iteration error
    assert err < 0.15


def test_magphase():
    S = np.array([[3 + 4j, 0.0], [1.0, -2.0]], dtype=np.complex64)
    mag, phase = stft_mod.magphase(jnp.asarray(S))
    np.testing.assert_allclose(np.asarray(mag), np.abs(S), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mag * phase), S, atol=1e-6)
    np.testing.assert_allclose(np.abs(np.asarray(phase)), np.ones((2, 2)), atol=1e-6)


@pytest.mark.parametrize("n_fft,hop", [(512, 160)])
def test_istft_scatter_fallback_path(short_audio, n_fft, hop):
    """hop not dividing n_fft exercises the gather/scatter OLA fallback."""
    y, _ = short_audio
    y = y[:16000]
    S = stft(jnp.asarray(y), n_fft=n_fft, hop_length=hop)
    y_rec = np.asarray(istft(S, hop_length=hop, length=len(y)))
    np.testing.assert_allclose(y_rec[n_fft:-n_fft], y[n_fft:-n_fft], atol=1e-4)


def test_istft_matmul_matches_fft_istft(short_audio):
    """inverse-rDFT matmul ISTFT == FFT ISTFT (f32 path), close in bf16."""
    y, _ = short_audio
    y = y[:16000]
    S = stft(jnp.asarray(y), n_fft=512, hop_length=128)
    Sr, Si = jnp.real(S), jnp.imag(S)
    want = np.asarray(istft(S, hop_length=128, length=len(y)))
    got32 = np.asarray(
        stft_mod.istft_matmul(Sr, Si, hop_length=128, length=len(y),
                              compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got32, want, atol=2e-5)
    got16 = np.asarray(
        stft_mod.istft_matmul(Sr, Si, hop_length=128, length=len(y),
                              compute_dtype=jnp.bfloat16)
    )
    scale = np.abs(y).max()
    assert np.abs(got16 - want).max() < 0.02 * scale
    # batched input broadcasts like istft
    Sb = jnp.stack([Sr, 0.5 * Sr]), jnp.stack([Si, 0.5 * Si])
    out = stft_mod.istft_matmul(Sb[0], Sb[1], hop_length=128, length=len(y),
                                compute_dtype=jnp.float32)
    assert out.shape == (2, len(y))
    np.testing.assert_allclose(np.asarray(out[0]), want, atol=2e-5)
    # row 1 must be computed from ITS OWN spectrogram (the whole pipeline
    # is linear in S, so the half-scaled input gives half the waveform)
    np.testing.assert_allclose(np.asarray(out[1]), 0.5 * want, atol=2e-5)


def test_stft_matmul_matches_fft_stft(short_audio):
    """Forward-rDFT matmul STFT must match the FFT stft (f32 exactly;
    bf16 within matmul tolerance)."""
    y, _ = short_audio
    S = stft(jnp.asarray(y), n_fft=512, hop_length=128)
    Sr, Si = stft_mod.stft_matmul(jnp.asarray(y), n_fft=512, hop_length=128,
                                  compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(Sr), np.real(np.asarray(S)), atol=5e-4)
    np.testing.assert_allclose(np.asarray(Si), np.imag(np.asarray(S)), atol=5e-4)
    Sr16, Si16 = stft_mod.stft_matmul(jnp.asarray(y), n_fft=512,
                                      hop_length=128,
                                      compute_dtype=jnp.bfloat16)
    scale = float(jnp.abs(S).max())
    assert float(jnp.abs(Sr16 - S.real).max()) < 0.02 * scale
    assert float(jnp.abs(Si16 - S.imag).max()) < 0.02 * scale


def test_griffin_lim_matmul_matches_fft_griffin_lim(short_audio):
    """The all-real matmul Griffin-Lim uses the identical update rule and
    phase init (cos/sin of the same uniform draw), so the f32 variant must
    track the FFT-pair loop closely, and bf16 must reconstruct the target
    magnitude just as well (each iteration renormalizes the phase, so bf16
    rounding does not accumulate)."""
    y, _ = short_audio
    S = stft(jnp.asarray(y), n_fft=512, hop_length=128)
    mag = jnp.abs(S)
    g_fft = stft_mod.griffin_lim(mag, n_iter=8, hop_length=128, n_fft=512,
                                 length=len(y))
    g_f32 = stft_mod.griffin_lim_matmul(mag, n_iter=8, hop_length=128,
                                        n_fft=512, length=len(y),
                                        compute_dtype=jnp.float32)
    scale = float(jnp.abs(g_fft).max())
    assert float(jnp.abs(g_fft - g_f32).max()) < 1e-3 * scale

    def recon_err(g):
        R = stft(g, n_fft=512, hop_length=128)
        return float(jnp.linalg.norm(jnp.abs(R)[..., : mag.shape[-1]] - mag)
                     / jnp.linalg.norm(mag))

    g_bf = stft_mod.griffin_lim_matmul(mag, n_iter=8, hop_length=128,
                                       n_fft=512, length=len(y),
                                       compute_dtype=jnp.bfloat16)
    assert recon_err(g_bf) < recon_err(g_fft) * 1.05

    # batched (the engine's use): [B, F, T] in, [B, n] out
    magb = jnp.stack([mag, 0.5 * mag])
    gb = stft_mod.griffin_lim_matmul(magb, n_iter=4, hop_length=128,
                                     n_fft=512, length=len(y))
    assert gb.shape == (2, len(y))


def test_n_frames_for_matches_stft_odd_even():
    from adx_tpu.ops.stft import n_frames_for

    y = jnp.zeros(4096)
    for n_fft in (1024, 1023, 513):
        for hop in (256, 250):
            T = stft(y, n_fft=n_fft, hop_length=hop).shape[-1]
            assert n_frames_for(4096, n_fft, hop) == T, (n_fft, hop)


def test_stft_coerces_integer_input():
    """int16 wire-format waves that missed their dequant must still get a
    REAL hann window (an int-cast window degenerates to a unit impulse and
    returns garbage spectra with no error)."""
    t = np.arange(4096) / 8000.0
    y = np.round(0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    S_int = np.abs(np.asarray(stft(jnp.asarray(y), n_fft=1024, hop_length=256)))
    S_f = np.abs(np.asarray(stft(jnp.asarray(y).astype(jnp.float32),
                                 n_fft=1024, hop_length=256)))
    np.testing.assert_allclose(S_int, S_f, rtol=1e-5, atol=1e-2)


def test_stft_rejects_unknown_pad_mode():
    with pytest.raises(ValueError, match="pad_mode"):
        stft(jnp.zeros(2048), n_fft=512, pad_mode="edge")


def test_frame_signal_too_short_raises():
    from adx_tpu.ops.stft import frame_signal

    with pytest.raises(ValueError, match="shorter than"):
        frame_signal(jnp.ones(100), 512, 128)
