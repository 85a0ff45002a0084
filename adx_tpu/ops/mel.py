"""Mel-frequency filterbanks, mel spectrograms, and mel inversion.

Two filterbank conventions are supported because the system needs both:

* ``htk=False, norm='slaney'`` — librosa's default, used by the explainer
  spectrograms (reference: src/spectrogram_explainability.py:368-376).
* ``htk=True, norm=None`` — torchaudio's default, used by the SONICS
  SpecTTTra feature extractor that the classifier was trained with.

Mel inversion (``mel_to_stft``) replaces librosa's scipy-based NNLS with a
fixed-iteration projected-gradient solve that runs entirely on device as one
XLA program, followed by Griffin-Lim phase recovery.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from adx_tpu.ops.stft import stft, griffin_lim


def hz_to_mel(frequencies, htk: bool = False):
    frequencies = np.asarray(frequencies, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + frequencies / 700.0)
    # Slaney formula
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (frequencies - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = frequencies >= min_log_hz
    mels = np.where(
        log_t,
        min_log_mel + np.log(np.maximum(frequencies, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def mel_to_hz(mels, htk: bool = False):
    mels = np.asarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    freqs = np.where(
        log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs
    )
    return freqs


def mel_frequencies(n_mels: int, fmin: float = 0.0, fmax: float = 11025.0, htk: bool = False):
    mels = np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels)
    return mel_to_hz(mels, htk)


def fft_frequencies(sr: int, n_fft: int) -> np.ndarray:
    """Center frequencies of rFFT bins (librosa.fft_frequencies;
    reference uses it for band masks at src/dsp_band_ops.py:567)."""
    return np.fft.rfftfreq(n_fft, d=1.0 / sr)


@functools.lru_cache(maxsize=32)
def _mel_filterbank_np(
    sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float, htk: bool, norm: Optional[str]
) -> np.ndarray:
    fftfreqs = fft_frequencies(sr, n_fft)
    mel_f = mel_frequencies(n_mels + 2, fmin, fmax, htk)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    weights = np.zeros((n_mels, len(fftfreqs)))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
        weights *= enorm[:, None]
    elif norm is not None:
        raise ValueError(f"Unsupported mel norm: {norm!r}")
    return weights.astype(np.float32)


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
    norm: Optional[str] = "slaney",
) -> jnp.ndarray:
    """Triangular mel filterbank ``[n_mels, 1 + n_fft // 2]``."""
    if fmax is None:
        fmax = sr / 2.0
    return jnp.asarray(
        _mel_filterbank_np(int(sr), int(n_fft), int(n_mels), float(fmin), float(fmax), bool(htk), norm)
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "sr", "n_fft", "hop_length", "win_length", "n_mels", "fmin", "fmax",
        "htk", "norm", "power", "center", "pad_mode",
    ),
)
def melspectrogram(
    y: jnp.ndarray,
    sr: int = 44100,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: Optional[int] = None,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
    norm: Optional[str] = "slaney",
    power: float = 2.0,
    center: bool = True,
    pad_mode: str = "constant",
) -> jnp.ndarray:
    """Mel power spectrogram ``[..., n_mels, T]``.

    The mel projection is a single ``[n_mels, F] @ [F, T]`` matmul, which XLA
    tiles onto the MXU and fuses with the magnitude computation.
    """
    S = stft(
        y, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
        center=center, pad_mode=pad_mode,
    )
    mag = jnp.abs(S) ** power
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk, norm)
    # HIGHEST like every other f32 frontend dot: TPU f32 einsums default
    # to FAST (bf16 passes), which would put ~1e-3 relative noise on the
    # mel engines' analyze path vs the librosa-exact result
    return jnp.einsum(
        "mf,...ft->...mt", fb, mag, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.lru_cache(maxsize=8)
def _dft_matrices_np(n_fft: int):
    """Real-DFT basis matrices ``cos/-sin [n_fft, 1 + n_fft//2]`` — ONE
    cached copy shared with the stft module (the tables are 8.4 MB each at
    n_fft=2048; two independent lru_caches doubled that and let the copies
    drift)."""
    from adx_tpu.ops.stft import _forward_rdft_matrices

    return _forward_rdft_matrices(n_fft)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop_length", "win_length", "center", "pad_mode", "compute_dtype",
    ),
)
def stft_dft_realimag(
    y: jnp.ndarray,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: Optional[int] = None,
    center: bool = True,
    pad_mode: str = "constant",
    compute_dtype=jnp.float32,
):
    """Framed real-DFT as two matmuls; returns ``(re, im)`` ``[..., T, K]``.

    The MXU-friendly STFT core shared by ``melspectrogram_dft`` and the
    LIME frontend hoist (the real/imag layout also avoids complex arrays,
    which some TPU runtimes cannot transfer). Accumulates in f32."""
    from adx_tpu.ops.stft import (
        _matmul_precision, _pad_mode, frame_signal, get_window,
    )

    win_length = win_length or n_fft
    w = get_window("hann", win_length, n_fft, dtype=jnp.float32)
    if center:
        pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        y = jnp.pad(y, pad, mode=_pad_mode(pad_mode))
    frames = frame_signal(y.astype(jnp.float32), n_fft, hop_length) * w  # [..., T, n_fft]
    frames = frames.astype(compute_dtype)
    cos_m, sin_m = _dft_matrices_np(n_fft)
    # f32 requests HIGHEST like stft_matmul — TPU f32 dots default to FAST
    # (bf16 passes), which would silently break the documented 1e-4 parity
    # with the FFT melspectrogram; bf16 keeps the backend default
    prec = _matmul_precision(compute_dtype)
    re = jnp.einsum("...tn,nk->...tk", frames, jnp.asarray(cos_m, compute_dtype),
                    preferred_element_type=jnp.float32, precision=prec)
    im = jnp.einsum("...tn,nk->...tk", frames, jnp.asarray(sin_m, compute_dtype),
                    preferred_element_type=jnp.float32, precision=prec)
    return re, im


@functools.partial(
    jax.jit,
    static_argnames=(
        "sr", "n_fft", "hop_length", "win_length", "n_mels", "fmin", "fmax",
        "htk", "norm", "power", "center", "pad_mode", "compute_dtype",
    ),
)
def melspectrogram_dft(
    y: jnp.ndarray,
    sr: int = 44100,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: Optional[int] = None,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
    norm: Optional[str] = "slaney",
    power: float = 2.0,
    center: bool = True,
    pad_mode: str = "constant",
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """Mel power spectrogram via an explicit real-DFT **matmul** instead of
    the FFT: frames × cos/sin bases → power → mel projection, three MXU
    matmuls XLA fuses end to end.

    Rationale: XLA's TPU rFFT is slow at classifier-frontend shapes
    (measured 155 ms for a batch-64 × 120 s mel frontend vs ~30 ms via DFT
    matmuls); the O(N²) DFT costs more FLOPs but they are MXU FLOPs.
    Identical semantics to ``melspectrogram`` (float32 bases, ≤1e-4 relative
    difference — see tests).

    ``compute_dtype=bfloat16`` runs the matmul *inputs* in bf16 (f32
    accumulation via ``preferred_element_type``), ≲0.5 dB error on energy-
    carrying log-mel bins; the power/dB math stays f32. In-context impact on
    the full-explain bench is neutral (the encoder dominates).
    """
    re, im = stft_dft_realimag(
        y, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
        center=center, pad_mode=pad_mode, compute_dtype=compute_dtype,
    )
    if power == 2.0:
        mag = re * re + im * im
    else:
        mag = jnp.sqrt(re * re + im * im) ** power
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk, norm)
    return jnp.einsum("mk,...tk->...mt", fb.astype(compute_dtype), mag.astype(compute_dtype),
                      preferred_element_type=jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("sr", "n_fft", "n_mels", "fmin", "fmax", "htk", "norm", "power", "n_iter_nnls"),
)
def mel_to_stft(
    M: jnp.ndarray,
    sr: int = 44100,
    n_fft: int = 2048,
    n_mels: Optional[int] = None,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
    norm: Optional[str] = "slaney",
    power: float = 2.0,
    n_iter_nnls: int = 200,
) -> jnp.ndarray:
    """Approximate STFT magnitude from a mel power spectrogram.

    Solves ``min_{X >= 0} || fb @ X - M ||_F^2`` by projected gradient with
    the exact Lipschitz step ``1 / ||fb^T fb||_2``, entirely on device
    (librosa's equivalent is a scipy block-LBFGS NNLS). Returns the
    ``power``-th root (amplitude for power=2), like
    ``librosa.feature.inverse.mel_to_stft``.
    """
    n_mels = n_mels or M.shape[-2]
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk, norm)  # [m, F]
    # NOTE: the PG iteration's matmuls run at the BACKEND DEFAULT precision
    # (bf16 passes on TPU) deliberately — NNLS is an approximate iterative
    # solver whose projected-gradient steps tolerate bf16-pass noise, and
    # forcing HIGHEST would cost 3-6× on the mel sweep path that was
    # specifically optimized (78560b0); fidelity mode's global override
    # still upgrades these dots when exactness is being measured.
    gram = fb.T @ fb  # [F, F]
    # power-iteration bound on the spectral norm for the PG step size
    v = jnp.ones((gram.shape[0],), jnp.float32) / np.sqrt(gram.shape[0])
    def _pow(_, v):
        v = gram @ v
        return v / (jnp.linalg.norm(v) + 1e-12)
    v = jax.lax.fori_loop(0, 30, _pow, v)
    lips = jnp.dot(v, gram @ v)
    step = 1.0 / (lips + 1e-12)

    bt = jnp.einsum("mf,...mt->...ft", fb, M)  # fb^T M
    # warm start from the transpose projection (a decent unconstrained guess)
    x0 = bt / (jnp.sum(fb * fb) / n_mels + 1e-12)

    def body(_, x):
        grad = jnp.einsum("fg,...gt->...ft", gram, x) - bt
        return jnp.maximum(x - step * grad, 0.0)

    x = jax.lax.fori_loop(0, n_iter_nnls, body, jnp.maximum(x0, 0.0))
    return jnp.power(x, 1.0 / power)


def mel_to_audio(
    M: jnp.ndarray,
    sr: int = 44100,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: Optional[int] = None,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
    norm: Optional[str] = "slaney",
    power: float = 2.0,
    n_iter: int = 32,
    length: Optional[int] = None,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Invert a mel power spectrogram to audio (NNLS + Griffin-Lim),
    the TPU equivalent of ``librosa.feature.inverse.mel_to_audio``
    (reference: src/spectrogram_explainability.py:395-402)."""
    S_mag = mel_to_stft(
        M, sr=sr, n_fft=n_fft, fmin=fmin, fmax=fmax, htk=htk, norm=norm, power=power
    )
    return griffin_lim(
        S_mag,
        n_iter=n_iter,
        hop_length=hop_length,
        win_length=win_length,
        n_fft=n_fft,
        length=length,
        key=key,
    )
