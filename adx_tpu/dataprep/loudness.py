"""Loudness measurement and normalization (ITU-R BS.1770-4 / EBU R128).

The reference's notebook (Notebooks/0. AnalyzeSongs/analyzesongs.ipynb,
cell 7) delegates loudness to ``pyloudnorm``; that package is not available
here, so the meter is implemented from the standard: K-weighting (RBJ
high-shelf + high-pass biquads parameterized for any sample rate), 400 ms
gating blocks with 75 % overlap, −70 LUFS absolute gate and −10 LU relative
gate. The normalization / true-peak / limiter / dither functions mirror the
notebook's semantics exactly (same defaults and control flow).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
from scipy.signal import lfilter

from adx_tpu.ops.audio import to_mono  # noqa: F401 — canonical downmix, re-exported


def _k_weighting_coeffs(fs: float):
    """Biquad coefficients for the two K-weighting stages at rate ``fs``
    (RBJ audio-EQ-cookbook parameterization, the same approach pyloudnorm
    uses for arbitrary sample rates)."""
    # stage 1: spherical-head high shelf (+4 dB above ~1.5 kHz)
    G, f0, Q = 3.999843853973347, 1681.974450955533, 0.7071752369554196
    A = 10.0 ** (G / 40.0)
    w0 = 2.0 * np.pi * f0 / fs
    alpha = np.sin(w0) / (2.0 * Q)
    cosw = np.cos(w0)
    b_shelf = np.array(
        [
            A * ((A + 1) + (A - 1) * cosw + 2 * np.sqrt(A) * alpha),
            -2 * A * ((A - 1) + (A + 1) * cosw),
            A * ((A + 1) + (A - 1) * cosw - 2 * np.sqrt(A) * alpha),
        ]
    )
    a_shelf = np.array(
        [
            (A + 1) - (A - 1) * cosw + 2 * np.sqrt(A) * alpha,
            2 * ((A - 1) - (A + 1) * cosw),
            (A + 1) - (A - 1) * cosw - 2 * np.sqrt(A) * alpha,
        ]
    )
    b_shelf, a_shelf = b_shelf / a_shelf[0], a_shelf / a_shelf[0]

    # stage 2: RLB high-pass (revised low-frequency B curve)
    f0_hp, Q_hp = 38.13547087602444, 0.5003270373238773
    w0 = 2.0 * np.pi * f0_hp / fs
    alpha = np.sin(w0) / (2.0 * Q_hp)
    cosw = np.cos(w0)
    b_hp = np.array([(1 + cosw) / 2, -(1 + cosw), (1 + cosw) / 2])
    a_hp = np.array([1 + alpha, -2 * cosw, 1 - alpha])
    b_hp, a_hp = b_hp / a_hp[0], a_hp / a_hp[0]
    return (b_shelf, a_shelf), (b_hp, a_hp)


def k_weight(y: np.ndarray, sr: int) -> np.ndarray:
    (b1, a1), (b2, a2) = _k_weighting_coeffs(float(sr))
    return lfilter(b2, a2, lfilter(b1, a1, y, axis=-1), axis=-1)


def integrated_lufs(y_mono: np.ndarray, sr: int) -> float:
    """Gated integrated loudness of a mono signal in LUFS."""
    y = np.asarray(y_mono, dtype=np.float64)
    if y.ndim != 1:
        y = np.mean(y, axis=0)
    z = k_weight(y, sr) ** 2

    block = int(round(0.400 * sr))
    hop = int(round(0.100 * sr))
    if len(z) < block:
        ms = float(np.mean(z)) if len(z) else 0.0
        return -0.691 + 10.0 * np.log10(ms + 1e-12)

    n_blocks = 1 + (len(z) - block) // hop
    idx = np.arange(block)[None, :] + hop * np.arange(n_blocks)[:, None]
    block_ms = np.mean(z[idx], axis=1)
    block_loud = -0.691 + 10.0 * np.log10(block_ms + 1e-12)

    above_abs = block_loud > -70.0
    if not above_abs.any():
        return -np.inf
    rel_threshold = (
        -0.691 + 10.0 * np.log10(np.mean(block_ms[above_abs]) + 1e-12) - 10.0
    )
    gated = above_abs & (block_loud > rel_threshold)
    if not gated.any():
        return -np.inf
    return float(-0.691 + 10.0 * np.log10(np.mean(block_ms[gated]) + 1e-12))


def true_peak_dbtp(y: np.ndarray, sr: int, oversample: int = 4) -> float:
    """True peak in dBTP via ×oversample polyphase upsampling
    (notebook cell 7 semantics)."""
    from adx_tpu.ops.audio import resample_poly as _rp

    def ch_tp(x):
        x_os = _rp(np.asarray(x, np.float32), sr, sr * oversample) if oversample > 1 else x
        p = np.max(np.abs(x_os))
        return -np.inf if p <= 0 else 20 * np.log10(p)

    if y.ndim == 1:
        return float(ch_tp(y))
    return float(max(ch_tp(y[ch]) for ch in range(y.shape[0])))


def apply_gain(y: np.ndarray, gain_db: float) -> np.ndarray:
    return y * (10.0 ** (gain_db / 20.0))


def soft_limiter(y: np.ndarray, ceiling_dbfs: float = -1.0, knee_db: float = 1.0) -> np.ndarray:
    """Soft limiter with knee (notebook cell 7 formula, bit-for-bit)."""
    ceiling = 10.0 ** (ceiling_dbfs / 20.0)
    x = y.copy()
    thr = ceiling / (10.0 ** (knee_db / 20.0))
    mag = np.abs(x)
    mask = mag > thr
    x[mask] = np.sign(x[mask]) * (
        thr + (mag[mask] - thr) * (ceiling - thr) / (mag[mask] - thr + 1e-12)
    )
    return np.clip(x, -ceiling, ceiling)


def normalize_to_lufs_with_tp(
    y: np.ndarray,
    sr: int,
    target_lufs: float,
    tp_limit_db: float = -1.0,
    oversample_tp: int = 4,
    post_lufs_trim_db: float = 0.5,
) -> Tuple[np.ndarray, Dict[str, Any]]:
    """Normalize to target LUFS with true-peak control: gain → TP check →
    soft limit → ±trim re-adjust → re-verify (notebook cell 7 control flow)."""
    info: Dict[str, Any] = {}
    init_lufs = integrated_lufs(to_mono(y), sr)
    if not np.isfinite(init_lufs):
        # fully-gated input (digital silence / < -70 LUFS absolute gate):
        # the gain would be +inf and 0·inf = NaN, which the reference
        # notebook writes out as garbage int16 — deviate where broken and
        # pass the audio through unchanged instead
        info.update({
            "init_lufs": float(init_lufs),
            "desired_gain_db": 0.0,
            "limited": False,
            "final_lufs": float(init_lufs),
            "final_true_peak_dbTP": true_peak_dbtp(y, sr, oversample=oversample_tp),
            "skipped_gated": True,
        })
        return y.astype(np.float32, copy=True), info
    desired_gain_db = target_lufs - init_lufs
    y1 = apply_gain(y, desired_gain_db)

    tp_after = true_peak_dbtp(y1, sr, oversample=oversample_tp)
    limited = False
    if tp_after > tp_limit_db:
        y1 = soft_limiter(y1, ceiling_dbfs=tp_limit_db, knee_db=1.0)
        limited = True

    lufs_after = integrated_lufs(to_mono(y1), sr)
    adjust_db = float(np.clip(target_lufs - lufs_after, -post_lufs_trim_db, post_lufs_trim_db))
    if abs(adjust_db) > 0.05:
        y1 = apply_gain(y1, adjust_db)
        if true_peak_dbtp(y1, sr, oversample=oversample_tp) > tp_limit_db:
            y1 = soft_limiter(y1, ceiling_dbfs=tp_limit_db, knee_db=1.0)

    info.update(
        {
            "init_lufs": init_lufs,
            "desired_gain_db": desired_gain_db,
            "limited": limited,
            "final_lufs": integrated_lufs(to_mono(y1), sr),
            "final_true_peak_dbTP": true_peak_dbtp(y1, sr, oversample=oversample_tp),
        }
    )
    return y1, info


def tpdf_dither(signal: np.ndarray, bit_depth: int = 16, peak: float = 1.0) -> np.ndarray:
    """Triangular-PDF dither before 16/24-bit quantization."""
    if bit_depth not in (16, 24):
        return signal
    q_step = peak / (2 ** (bit_depth - 1))
    noise = (
        np.random.rand(*signal.shape) - 0.5 + np.random.rand(*signal.shape) - 0.5
    ) * q_step
    return signal + noise
