"""Degradation arms (notebook cell 7 capability): mp3 round trip, resample
round trip, pink noise at fixed SNR, synthetic room reverb."""

from __future__ import annotations

import shutil
import subprocess
import tempfile
from pathlib import Path
from typing import Optional, Tuple

import numpy as np
from scipy import signal as sig

from adx_tpu.ops.audio import resample_poly


def degrade_mp3_roundtrip(y: np.ndarray, sr: int, bitrate: str = "192k") -> np.ndarray:
    """WAV → MP3(bitrate) → WAV round trip (notebook cell 7
    ``degrade_mp3_roundtrip``). Uses the in-process libmp3lame/libmpg123
    codecs (``adx_tpu.io.mp3`` — the same encoder/decoder ffmpeg wraps),
    falling back to an ffmpeg binary if present, else to the notebook's
    graceful "return input unchanged"."""
    try:
        from adx_tpu.io.mp3 import have_mp3, mp3_roundtrip

        # parse inside the fallback chain: a non-"<int>k" bitrate spelling
        # must degrade gracefully like every other failure here, not abort
        # the dataprep arm
        kbps = int(str(bitrate).rstrip("kK"))
        if have_mp3():
            return mp3_roundtrip(y, sr, kbps)
    except Exception as e:  # noqa: BLE001 — fall through to ffmpeg/identity
        print(f"[Warning] native mp3 round trip failed ({e}); trying ffmpeg.")
    if shutil.which("ffmpeg") is None:
        print("[Warning] no mp3 codec available; mp3_192 arm returns input unchanged.")
        return y
    try:
        from adx_tpu.io.audio_io import read_wav, write_wav

        with tempfile.TemporaryDirectory() as td:
            inp = Path(td) / "in.wav"
            mid = Path(td) / "mid.mp3"
            out = Path(td) / "out.wav"
            write_wav(inp, y.T if y.ndim > 1 else y, sr)
            subprocess.run(
                ["ffmpeg", "-y", "-loglevel", "error", "-i", str(inp), "-b:a", bitrate, str(mid)],
                check=True,
            )
            subprocess.run(
                ["ffmpeg", "-y", "-loglevel", "error", "-i", str(mid), "-ar", str(sr), str(out)],
                check=True,
            )
            y2, _ = read_wav(out)
            if y2.ndim > 1:
                y2 = y2.T
            return y2.astype(np.float32)
    except Exception:
        return y


def degrade_resample(y: np.ndarray, sr: int, down_sr: int = 22050) -> Tuple[np.ndarray, int]:
    """Down/up resample round trip (bandlimiting artifacts)."""
    def rt(x):
        y_d = resample_poly(np.asarray(x, np.float32), sr, down_sr)
        return resample_poly(y_d, down_sr, sr)

    if y.ndim == 1:
        y_u = rt(y)
    else:
        y_u = np.vstack([rt(y[ch]) for ch in range(y.shape[0])])
    # round trips can change length by a sample; trim/pad back
    n = y.shape[-1]
    if y_u.shape[-1] > n:
        y_u = y_u[..., :n]
    elif y_u.shape[-1] < n:
        pad = [(0, 0)] * (y_u.ndim - 1) + [(0, n - y_u.shape[-1])]
        y_u = np.pad(y_u, pad)
    return y_u.astype(np.float32), sr


def degrade_add_noise(
    y: np.ndarray, snr_db: float = 30, rng: Optional[np.random.Generator] = None
) -> np.ndarray:
    """Add spectrally-shaped (1/f) pink noise at the target SNR."""
    if rng is None:
        rng = np.random.default_rng()
    n = y.shape[-1]

    def pink(n_samples):
        w = rng.standard_normal(n_samples)
        spec = np.fft.rfft(w)
        freqs = np.fft.rfftfreq(n_samples, d=1.0)
        spec[1:] /= np.sqrt(np.maximum(freqs[1:], 1e-12))
        pn = np.fft.irfft(spec, n=n_samples)
        pn /= np.max(np.abs(pn)) + 1e-12
        return pn.astype(np.float32)

    def add(ch):
        noise = pink(n)
        sig_rms = np.sqrt(np.mean(ch**2) + 1e-12)
        noise_target = sig_rms / (10 ** (snr_db / 20))
        noise *= noise_target / (np.sqrt(np.mean(noise**2)) + 1e-12)
        return (ch + noise).astype(np.float32)

    if y.ndim == 1:
        return add(y)
    return np.vstack([add(y[ch]) for ch in range(y.shape[0])])


def degrade_reverb_synthetic(
    y: np.ndarray, sr: int, rt60: float = 0.6, mix: float = 0.15
) -> np.ndarray:
    """Synthetic exponential-decay IR reverb, 15 % wet by default."""
    ir_len = int(sr * rt60 / 4)
    t = np.linspace(0, ir_len / sr, num=ir_len, endpoint=False)
    ir = (np.exp(-3.0 * t / (rt60 / 4)) * (0.7 + 0.3 * np.sin(2 * np.pi * 0.7 * t))).astype(
        np.float32
    )
    ir /= np.max(np.abs(ir)) + 1e-12

    def conv(x):
        return sig.fftconvolve(x, ir, mode="full")[: x.shape[-1]]

    if y.ndim == 1:
        return ((1 - mix) * y + mix * conv(y)).astype(np.float32)
    return np.vstack(
        [((1 - mix) * y[ch] + mix * conv(y[ch])).astype(np.float32) for ch in range(y.shape[0])]
    )
