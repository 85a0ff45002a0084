"""Spectral feature kernels (librosa.feature.* semantics, JAX).

Each function reproduces the corresponding librosa formula the reference
calls in ``extract_all_features`` (reference: src/feature_extraction.py:5-96)
and runs as batched device code: one STFT feeds every spectral statistic.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adx_tpu.ops.db import power_to_db
from adx_tpu.ops.mel import fft_frequencies, melspectrogram
from adx_tpu.ops.stft import frame_signal, stft


def rms_from_audio(
    y: jnp.ndarray, frame_length: int = 2048, hop_length: int = 512
) -> jnp.ndarray:
    """Frame RMS with center padding (librosa.feature.rms(y=...))."""
    pad = [(0, 0)] * (y.ndim - 1) + [(frame_length // 2, frame_length // 2)]
    yp = jnp.pad(y, pad)
    frames = frame_signal(yp, frame_length, hop_length)
    return jnp.sqrt(jnp.mean(frames**2, axis=-1))


def rms_from_spectrogram(S_mag: jnp.ndarray, n_fft: Optional[int] = None) -> jnp.ndarray:
    """Frame RMS from a magnitude spectrogram (librosa.feature.rms(S=...)):
    Parseval with DC/Nyquist halving."""
    n_fft = n_fft or 2 * (S_mag.shape[-2] - 1)
    power = S_mag.astype(jnp.float32) ** 2
    power = power.at[..., 0, :].mul(0.5)
    if n_fft % 2 == 0:
        power = power.at[..., -1, :].mul(0.5)
    return jnp.sqrt(2.0 * jnp.sum(power, axis=-2) / n_fft**2)


def zero_crossing_rate(
    y: jnp.ndarray, frame_length: int = 2048, hop_length: int = 512, threshold: float = 1e-10
) -> jnp.ndarray:
    """librosa.feature.zero_crossing_rate: edge-padded frames, mean of
    sign-change indicators (tiny values clamped to +0)."""
    pad = [(0, 0)] * (y.ndim - 1) + [(frame_length // 2, frame_length // 2)]
    yp = jnp.pad(y, pad, mode="edge")
    yc = jnp.where(jnp.abs(yp) <= threshold, 0.0, yp)
    sign = yc >= 0  # librosa: zeros count as positive
    crossings = sign[..., 1:] != sign[..., :-1]
    crossings = jnp.concatenate(
        [jnp.zeros((*crossings.shape[:-1], 1), bool), crossings], axis=-1
    )
    frames = frame_signal(crossings.astype(jnp.float32), frame_length, hop_length)
    # librosa runs zero_crossings(pad=False) on the FRAMED signal, so each
    # frame's element 0 is forced False; the global indicator framed above
    # would otherwise carry the crossing across the frame boundary
    frames = frames.at[..., 0].set(0.0)
    return jnp.mean(frames, axis=-1)


def spectral_centroid(S_mag: jnp.ndarray, sr: int, n_fft: int) -> jnp.ndarray:
    freqs = jnp.asarray(fft_frequencies(sr, n_fft), jnp.float32)
    norm = jnp.sum(S_mag, axis=-2) + 1e-10
    return jnp.einsum("f,...ft->...t", freqs, S_mag) / norm


def spectral_bandwidth(S_mag: jnp.ndarray, sr: int, n_fft: int, p: float = 2.0) -> jnp.ndarray:
    freqs = jnp.asarray(fft_frequencies(sr, n_fft), jnp.float32)
    centroid = spectral_centroid(S_mag, sr, n_fft)
    # librosa normalizes S columns to sum 1 before the deviation average
    Sn = S_mag / (jnp.sum(S_mag, axis=-2, keepdims=True) + 1e-10)
    dev = jnp.abs(freqs[:, None] - centroid[..., None, :]) ** p
    return jnp.sum(Sn * dev, axis=-2) ** (1.0 / p)


def spectral_rolloff(S_mag: jnp.ndarray, sr: int, n_fft: int, roll_percent: float = 0.85) -> jnp.ndarray:
    freqs = jnp.asarray(fft_frequencies(sr, n_fft), jnp.float32)
    total = jnp.cumsum(S_mag, axis=-2)
    threshold = roll_percent * total[..., -1:, :]
    above = total >= threshold
    # first bin meeting the threshold (librosa: nanmin of freqs where cum >= thr)
    idx = jnp.argmax(above, axis=-2)
    return freqs[idx]


def spectral_flatness(S_mag: jnp.ndarray, amin: float = 1e-10, power: float = 2.0) -> jnp.ndarray:
    # librosa floors the POWER spectrum at amin (np.maximum(amin, S**power)),
    # not the magnitude — flooring first would lower the floor to amin**2
    # and shrink flatness wherever quiet bins sit between amin and sqrt(amin)
    Sp = jnp.maximum(S_mag.astype(jnp.float32) ** power, amin)
    gmean = jnp.exp(jnp.mean(jnp.log(Sp), axis=-2))
    amean = jnp.mean(Sp, axis=-2)
    return gmean / amean


def spectral_contrast(
    S_mag: jnp.ndarray,
    sr: int,
    n_fft: int,
    fmin: float = 200.0,
    n_bands: int = 6,
    quantile: float = 0.02,
    linear: bool = False,
) -> jnp.ndarray:
    """librosa.feature.spectral_contrast: per-octave-band peak − valley in dB.

    Returns ``[..., n_bands + 1, T]``.
    """
    freqs = fft_frequencies(sr, n_fft)
    octa = np.zeros(n_bands + 2)
    octa[1:] = fmin * (2.0 ** np.arange(0, n_bands + 1))

    # librosa band selection: band k > 0 reaches one bin below its lower
    # edge; the last band extends to Nyquist; every band but the last drops
    # its top bin after sorting-selection; the quantile count comes from the
    # EXTENDED band width. The dB form is 10·log10 on MAGNITUDES (power=1
    # spectrogram through power_to_db), with the default top_db=80 clamp
    # applied to the full peak/valley arrays.
    valleys, peaks = [], []
    for k in range(n_bands + 1):
        f_low, f_high = octa[k], octa[k + 1]
        current = (freqs >= f_low) & (freqs <= f_high)
        idx = np.flatnonzero(current)
        if len(idx) == 0:
            idx = np.array([0])
            current[0] = True
        if k > 0 and idx[0] > 0:
            current[idx[0] - 1] = True
        if k == n_bands:
            current[idx[-1] + 1 :] = True
        sel = np.flatnonzero(current)
        sub = S_mag[..., sel, :]
        if k < n_bands:
            sub = sub[..., :-1, :]
        n_q = int(np.maximum(np.rint(quantile * int(current.sum())), 1))
        sorted_sub = jnp.sort(sub, axis=-2)
        valleys.append(jnp.mean(sorted_sub[..., :n_q, :], axis=-2))
        peaks.append(jnp.mean(sorted_sub[..., -n_q:, :], axis=-2))
    valley = jnp.stack(valleys, axis=-2)
    peak = jnp.stack(peaks, axis=-2)
    if linear:
        return peak - valley  # librosa: "linear difference of magnitudes"
    return (power_to_db(peak, ref=1.0, top_db=80.0)
            - power_to_db(valley, ref=1.0, top_db=80.0))


def hpss(
    S_mag: jnp.ndarray, kernel_harm: int = 31, kernel_perc: int = 31, power: float = 2.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Median-filtering harmonic/percussive soft masks (librosa.decompose.hpss).

    Returns (harmonic_mask, percussive_mask); multiply with the complex S
    and invert for librosa.effects.harmonic/percussive equivalents.
    """
    def rolling_median(x, size, axis):
        # symmetric edge padding = scipy.ndimage's default 'reflect' mode
        # (librosa's median_filter call); a wrapped roll would couple the
        # track's start/end and make the masks differ from the scipy host
        # path near the edges
        axis = axis % x.ndim
        half = size // 2
        pad = [(0, 0)] * x.ndim
        pad[axis] = (half, half)
        xp = jnp.pad(x, pad, mode="symmetric")
        n = x.shape[axis]
        windows = [
            jax.lax.slice_in_dim(xp, s, s + n, axis=axis) for s in range(size)
        ]
        return jnp.median(jnp.stack(windows, axis=0), axis=0)

    H = rolling_median(S_mag, kernel_harm, axis=-1)
    P = rolling_median(S_mag, kernel_perc, axis=-2)
    Hp = H**power
    Pp = P**power
    total = Hp + Pp
    mask_h = jnp.where(total > 0, Hp / jnp.where(total > 0, total, 1.0), 0.5)
    return mask_h, 1.0 - mask_h


@functools.lru_cache(maxsize=8)
def _chroma_filterbank_np(sr: int, n_fft: int, n_chroma: int = 12) -> np.ndarray:
    """Chroma filterbank [n_chroma, 1 + n_fft//2]: wrapped-Gaussian pitch
    class profiles with octave weighting (librosa.filters.chroma semantics)."""
    freqs = fft_frequencies(sr, n_fft)[1:]
    frqbins = n_chroma * np.log2(freqs / (440.0 / 16))  # ref C ~ A440/16
    frqbins = np.concatenate(([frqbins[0] - 1.5 * n_chroma], frqbins))
    binwidthbins = np.concatenate((np.maximum(frqbins[1:] - frqbins[:-1], 1.0), [1.0]))
    D = np.subtract.outer(frqbins, np.arange(0, n_chroma, dtype="d")).T
    n_chroma2 = np.round(float(n_chroma) / 2)
    D = np.remainder(D + n_chroma2 + 10 * n_chroma, n_chroma) - n_chroma2
    wts = np.exp(-0.5 * (2 * D / np.tile(binwidthbins, (n_chroma, 1))) ** 2)
    wts /= np.sqrt(np.sum(wts**2, axis=0, keepdims=True)) + 1e-12
    # octave weighting: Gaussian centered at octave 5, width 2
    ctroct, octwidth = 5.0, 2.0
    wts *= np.tile(
        np.exp(-0.5 * (((frqbins / n_chroma - ctroct) / octwidth) ** 2)), (n_chroma, 1)
    )
    # librosa filters.chroma base_c=True (the feature.chroma_stft default):
    # the A440/16 reference makes row 0 pitch class A; roll so row 0 is C
    wts = np.roll(wts, -3 * (n_chroma // 12), axis=0)
    return wts.astype(np.float32)


def chroma_stft(y: jnp.ndarray, sr: int, n_fft: int = 2048, hop_length: int = 512,
                n_chroma: int = 12) -> jnp.ndarray:
    """Chromagram (librosa.feature.chroma_stft semantics: power spectrogram ×
    chroma filterbank, max-normalized per frame)."""
    S = jnp.abs(stft(y, n_fft=n_fft, hop_length=hop_length)) ** 2
    fb = jnp.asarray(_chroma_filterbank_np(int(sr), int(n_fft), int(n_chroma)))
    raw = jnp.einsum("cf,...ft->...ct", fb, S)
    return raw / (jnp.max(raw, axis=-2, keepdims=True) + 1e-10)


def mfcc(y: jnp.ndarray, sr: int, n_mfcc: int = 13, n_fft: int = 2048,
         hop_length: int = 512, n_mels: int = 128) -> jnp.ndarray:
    """MFCCs: DCT-II (ortho) of the dB mel spectrogram (librosa defaults)."""
    from adx_tpu.ops.db import power_to_db as _p2db

    # librosa.feature.mfcc: power_to_db with DEFAULTS — ref=1.0 AND the
    # top_db=80 clamp (dropping it changes every coefficient on any track
    # whose mel dynamic range exceeds 80 dB, i.e. almost all of them)
    M = melspectrogram(y, sr=sr, n_fft=n_fft, hop_length=hop_length, n_mels=n_mels)
    S_db = _p2db(M, ref=1.0, top_db=80.0)
    n = S_db.shape[-2]
    k = np.arange(n_mfcc)[:, None]
    m = np.arange(n)[None, :]
    dct = np.cos(np.pi * k * (2 * m + 1) / (2 * n)) * np.sqrt(2.0 / n)
    dct[0] /= np.sqrt(2.0)
    return jnp.einsum("km,...mt->...kt", jnp.asarray(dct, jnp.float32), S_db)


def onset_strength(
    y: jnp.ndarray, sr: int, n_fft: int = 2048, hop_length: int = 512, n_mels: int = 128
) -> jnp.ndarray:
    """librosa.onset.onset_strength: mel-dB spectral flux (positive part,
    mean over bands, lag-1 reference), with librosa's centering
    compensation — the envelope is front-padded by
    ``lag + n_fft // (2 * hop_length)`` frames and trimmed back to the
    spectrogram frame count, so onsets align with the centered STFT grid
    (padding only the lag leaves the envelope ~2 frames early at the
    2048/512 defaults and keeps tail flux librosa discards)."""
    lag = 1
    M = melspectrogram(y, sr=sr, n_fft=n_fft, hop_length=hop_length, n_mels=n_mels)
    S_db = power_to_db(M, ref="max")  # flux diffs are ref-invariant; top_db=80 as librosa
    diff = S_db[..., :, lag:] - S_db[..., :, :-lag]
    flux = jnp.mean(jnp.maximum(0.0, diff), axis=-2)
    pad_width = lag + n_fft // (2 * hop_length)
    pad = [(0, 0)] * (flux.ndim - 1) + [(pad_width, 0)]
    return jnp.pad(flux, pad)[..., : M.shape[-1]]
