"""Waveform utilities: RMS matching, length fixing, normalization, resampling."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def match_rms(ref: jnp.ndarray, x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Scale ``x`` to the RMS of ``ref`` (reference: src/dsp_band_ops.py:228-233).

    Broadcasts over leading batch dims: ``ref [..., n]`` vs ``x [..., n]``.
    """
    r_ref = jnp.sqrt(jnp.mean(ref**2, axis=-1, keepdims=True) + eps)
    r_x = jnp.sqrt(jnp.mean(x**2, axis=-1, keepdims=True) + eps)
    scale = jnp.where(r_x < eps, 1.0, r_ref / jnp.where(r_x < eps, 1.0, r_x))
    return x * scale


def fix_length(y: jnp.ndarray, length: int) -> jnp.ndarray:
    """Trim or zero-pad the last axis to ``length`` (librosa.util.fix_length)."""
    n = y.shape[-1]
    if n > length:
        return y[..., :length]
    if n < length:
        pad = [(0, 0)] * (y.ndim - 1) + [(0, length - n)]
        return jnp.pad(y, pad)
    return y


def peak_normalize(y: jnp.ndarray, peak: float = 0.99) -> jnp.ndarray:
    """Scale so max |y| == peak; identity for silent input
    (reference clipping guard: src/dsp_band_ops.py:630-633)."""
    m = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    return jnp.where(m > 0, y / jnp.where(m > 0, m, 1.0) * peak, y)


def resample_poly(y: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Host-side polyphase resampling (decode path only; the hot path never
    resamples — tracks are decoded once and stay on device)."""
    if orig_sr == target_sr:
        return y
    from scipy.signal import resample_poly as _rp
    from math import gcd

    g = gcd(int(orig_sr), int(target_sr))
    return _rp(y, target_sr // g, orig_sr // g, axis=-1).astype(y.dtype, copy=False)


def resample_fourier(y: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Exact bandlimited resampling via rFFT truncation/zero-padding
    (scipy.signal.resample semantics), batched over leading dims.

    This is the *device-side* resampler used in the explainer hot path: the
    explainers synthesize perturbed audio at the analysis rate (44.1 kHz)
    while the classifier consumes its training rate (16 kHz); one rFFT +
    truncation + irFFT keeps the whole conversion inside the XLA program.
    Edge behavior assumes periodicity (negligible for 120 s tracks).
    """
    n_in = y.shape[-1]
    if n_in == n_out:
        return y
    F = jnp.fft.rfft(y, axis=-1)
    n_keep = min(n_in, n_out) // 2 + 1
    F = F[..., :n_keep]
    if n_out > n_in:
        pad = [(0, 0)] * (F.ndim - 1) + [(0, n_out // 2 + 1 - n_keep)]
        F = jnp.pad(F, pad)
    out = jnp.fft.irfft(F, n=n_out, axis=-1)
    return (out * (n_out / n_in)).astype(y.dtype)


def to_mono(y: np.ndarray) -> np.ndarray:
    """Average channels down to mono (librosa.to_mono semantics)."""
    if y.ndim == 1:
        return y
    return np.mean(y, axis=tuple(range(y.ndim - 1)))
