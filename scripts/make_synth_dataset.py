#!/usr/bin/env python
"""Generate a REAL-vs-generated synthetic music dataset with a localized,
physically-motivated "deepfake artifact" class signal.

The reference consumes curated real datasets it cannot ship
(`/root/reference/src/sonics_api.py` assumes trained SONICS checkpoints);
offline we need a dataset whose class signal is (a) learnable by the
SpecTTTra mel frontend (16 kHz, f_max 8 kHz), (b) NOT a loudness or
duration shortcut, and (c) localized in frequency so trained-weight
saliency maps (FBP bands / occlusion patches) have ground truth to find.

Both classes share the same musical structure (harmonic voice with vibrato,
bass, percussion, noise floor, matched RMS). The "generated" class adds the
artifacts neural vocoders actually exhibit:

* a weak comb-modulated noise band at 5-6.5 kHz (the classic GAN-vocoder
  buzz; sits inside the model's 8 kHz f_max and inside the FBP
  (4000, 8000) preset band),
* a gentle high-shelf cut above ~6.8 kHz (band-limited synthesis),
* per-block harmonic phase resets every 0.5 s (frame-boundary
  discontinuities).

Each artifact is subtle (-26 to -30 dB relative) and the final RMS of every
track is matched, so the classifier must learn spectro-temporal structure.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def _harmonic_voice(rng, t, sr, fake: bool):
    """Vibrato harmonic stack; fake variant resets harmonic phases per
    0.5 s block (vocoder frame-boundary artifact)."""
    n = len(t)
    f0 = float(rng.uniform(110.0, 330.0))
    drift = 1.0 + 0.02 * np.sin(2 * np.pi * rng.uniform(0.05, 0.2) * t
                                + rng.uniform(0, 2 * np.pi))
    vib = 1.0 + 0.015 * np.sin(2 * np.pi * rng.uniform(4.5, 6.5) * t
                               + rng.uniform(0, 2 * np.pi))
    inst_f = f0 * drift * vib
    phase = 2 * np.pi * np.cumsum(inst_f) / sr
    y = np.zeros(n, np.float64)
    n_harm = 8
    block = int(0.5 * sr)
    for h in range(1, n_harm + 1):
        amp = h ** -1.2
        ph = phase * h + rng.uniform(0, 2 * np.pi)
        if fake:
            # phase reset at each 0.5 s block boundary: a small random
            # offset per block produces the frame-discontinuity clicks of
            # a non-streaming vocoder
            n_blocks = n // block + 1
            offsets = rng.uniform(-0.35, 0.35, n_blocks)
            ph = ph + np.repeat(offsets, block)[:n]
        y += amp * np.sin(ph)
    # slow natural AM
    y *= 0.6 + 0.4 * np.clip(np.sin(2 * np.pi * rng.uniform(0.2, 0.6) * t
                                    + rng.uniform(0, 2 * np.pi)), -0.8, 1.0)
    return y / n_harm


def _bass(rng, t):
    fb = float(rng.uniform(55.0, 90.0))
    return 0.5 * np.sin(2 * np.pi * fb * t) + 0.15 * np.sin(2 * np.pi * 2 * fb * t)


def _percussion(rng, t, sr):
    n = len(t)
    y = np.zeros(n, np.float64)
    bpm = rng.uniform(90.0, 140.0)
    step = int(sr * 60.0 / bpm)
    burst_len = int(0.04 * sr)
    env = np.exp(-np.linspace(0, 6, burst_len))
    for start in range(int(rng.integers(0, step)), n - burst_len, step):
        noise = rng.standard_normal(burst_len)
        y[start:start + burst_len] += env * noise
    # band-limit percussion to 2-6 kHz with an FFT brickwall (host-side,
    # generation only — not a DSP-path op)
    Y = np.fft.rfft(y)
    f = np.fft.rfftfreq(n, 1.0 / sr)
    Y *= np.clip((f - 1500.0) / 500.0, 0, 1) * np.clip((6500.0 - f) / 500.0, 0, 1)
    return np.fft.irfft(Y, n)


def _vocoder_buzz(rng, t, sr):
    """Comb-modulated narrowband noise at 5-6.5 kHz (the artifact)."""
    n = len(t)
    noise = rng.standard_normal(n)
    Y = np.fft.rfft(noise)
    f = np.fft.rfftfreq(n, 1.0 / sr)
    band = np.exp(-0.5 * ((f - 5750.0) / 450.0) ** 2)
    narrow = np.fft.irfft(Y * band, n)
    # comb AM at the vocoder frame rate (16 kHz model / 512 hop = 31.25 Hz)
    comb = 0.5 * (1.0 + np.sign(np.sin(2 * np.pi * 31.25 * t)))
    return narrow * (0.4 + 0.6 * comb)


def _high_shelf_cut(y, sr, corner=6800.0, depth_db=9.0):
    Y = np.fft.rfft(y)
    f = np.fft.rfftfreq(len(y), 1.0 / sr)
    gain = 10 ** (-depth_db / 20.0)
    w = 1.0 / (1.0 + np.exp(-(f - corner) / 250.0))  # sigmoid shelf
    return np.fft.irfft(Y * (1.0 - w * (1.0 - gain)), len(y))


def synth_track(rng, seconds: float, sr: int, fake: bool) -> np.ndarray:
    n = int(seconds * sr)
    t = np.arange(n) / sr
    y = (
        0.50 * _harmonic_voice(rng, t, sr, fake)
        + 0.22 * _bass(rng, t)
        + 0.18 * _percussion(rng, t, sr)
        + 0.012 * rng.standard_normal(n)  # noise floor
    )
    if fake:
        buzz = _vocoder_buzz(rng, t, sr)
        y = y + 0.035 * buzz / (np.sqrt(np.mean(buzz ** 2)) + 1e-12)
        y = _high_shelf_cut(y, sr)
    # RMS-match every track so loudness is never the class cue
    y = 0.1 * y / (np.sqrt(np.mean(y ** 2)) + 1e-12)
    return np.clip(y, -0.99, 0.99).astype(np.float32)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", required=True, help="Dataset root (REAL/ + fake folder)")
    ap.add_argument("--tracks-per-class", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=120.0)
    ap.add_argument("--sr", type=int, default=44100)
    ap.add_argument("--fake-label", default="SUNO",
                    help="Folder name for the generated class")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from adx_tpu.io.audio_io import write_wav

    out = Path(args.out)
    t0 = time.time()
    for ci, (folder, fake) in enumerate((("REAL", False), (args.fake_label, True))):
        for i in range(args.tracks_per_class):
            rng = np.random.default_rng(args.seed + 10_000 * ci + i)
            y = synth_track(rng, args.seconds, args.sr, fake)
            write_wav(out / folder / f"track_{i:03d}.wav", y, args.sr)
        print(f"{folder}: {args.tracks_per_class} × {args.seconds:.0f}s written "
              f"({time.time() - t0:.1f} s)", flush=True)
    print(f"Dataset at {out} ({time.time() - t0:.1f} s total)")


if __name__ == "__main__":
    main()
