#!/usr/bin/env python
"""Ready-to-run librosa golden comparison (blocked offline — needs librosa).

The reference's feature layer calls ``librosa.pyin`` / ``librosa.beat.
beat_track`` / spectral features directly (reference:
src/feature_extraction.py:13-22,313-326). This image has no librosa (zero
egress), so the ports in ``adx_tpu/features`` are behaviorally tested
(sine/vibrato/octave recovery, DP-beat-grid recovery) but never compared
numerically to librosa outputs. THE MOMENT librosa becomes installable,
run this script; it prints a per-quantity error table and an overall
PASS/FAIL against the documented tolerances.

Usage:  python scripts/compare_librosa_golden.py [--sr 22050] [--seconds 6]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

# (name, tolerance description, comparator) registry printed at the end
TOLS = {
    "pyin_f0_voiced_cents": 10.0,      # |cents| on frames both call voiced
    "pyin_voiced_agreement": 0.95,     # fraction of frames agreeing on voicing
    "tempo_rel_err": 0.05,             # relative tempo error (or octave)
    "beat_f_measure": 0.8,             # beats within ±70 ms
    "onset_env_corr": 0.95,            # onset-envelope correlation
    "spectral_rel_err": 1e-3,          # centroid/bandwidth/rolloff/flatness
}


def make_test_signal(sr: int, seconds: float) -> np.ndarray:
    """Voiced vibrato tone + percussive clicks + noise floor."""
    rng = np.random.default_rng(0)
    t = np.arange(int(sr * seconds)) / sr
    f_mod = 5.0
    voiced = 0.4 * np.sin(
        2 * np.pi * 220 * t + (0.02 * 220 / f_mod) * np.sin(2 * np.pi * f_mod * t)
    )
    clicks = np.zeros_like(t)
    period = int(0.5 * sr)  # 120 BPM
    burst = rng.standard_normal(int(0.02 * sr)) * np.exp(-np.arange(int(0.02 * sr)) / (0.004 * sr))
    for onset in range(0, len(t) - len(burst), period):
        clicks[onset : onset + len(burst)] += 0.6 * burst
    return (voiced + clicks + 0.01 * rng.standard_normal(len(t))).astype(np.float32)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sr", type=int, default=22050)
    ap.add_argument("--seconds", type=float, default=6.0)
    args = ap.parse_args()

    try:
        import librosa
    except ImportError:
        sys.exit(
            "BLOCKED: librosa is not installed in this environment (zero "
            "egress). Install librosa and rerun; the comparison is fully "
            "scripted below and needs no other changes."
        )

    from adx_tpu.features.pyin import pyin as adx_pyin
    from adx_tpu.features.rhythm import beat_track as adx_beat_track
    from adx_tpu.features.spectral import (
        onset_strength as adx_onset_strength,
        spectral_bandwidth, spectral_centroid, spectral_flatness, spectral_rolloff,
    )
    from adx_tpu.ops.stft import stft as adx_stft
    import jax.numpy as jnp

    sr = args.sr
    y = make_test_signal(sr, args.seconds)
    report = {}

    # ---- pyin ------------------------------------------------------------
    f0_l, v_l, _ = librosa.pyin(y, fmin=80, fmax=800, sr=sr)
    f0_a, v_a, _ = adx_pyin(y, fmin=80, fmax=800, sr=sr)
    n = min(len(f0_l), len(f0_a))
    both = v_l[:n] & v_a[:n]
    cents = 1200 * np.abs(np.log2(f0_a[:n][both] / f0_l[:n][both]))
    report["pyin_f0_voiced_cents"] = float(np.nanmedian(cents)) if both.any() else np.inf
    report["pyin_voiced_agreement"] = float(np.mean(v_l[:n] == v_a[:n]))

    # ---- onset envelope / tempo / beats -----------------------------------
    env_l = librosa.onset.onset_strength(y=y, sr=sr)
    env_a = adx_onset_strength(y, sr=sr)
    m = min(len(env_l), len(env_a))
    report["onset_env_corr"] = float(np.corrcoef(env_l[:m], env_a[:m])[0, 1])

    tempo_l, beats_l = librosa.beat.beat_track(onset_envelope=env_l, sr=sr)
    tempo_a, beats_a = adx_beat_track(env_a, sr=sr)
    tempo_l = float(np.atleast_1d(tempo_l)[0])
    rel = min(
        abs(tempo_a - tempo_l) / tempo_l,
        abs(tempo_a - 2 * tempo_l) / (2 * tempo_l),
        abs(2 * tempo_a - tempo_l) / tempo_l,
    )
    report["tempo_rel_err"] = float(rel)
    t_l = librosa.frames_to_time(beats_l, sr=sr)
    t_a = librosa.frames_to_time(beats_a, sr=sr)
    # precision matches predictions to references; recall matches
    # references to predictions (reusing the prediction hit count for
    # recall lets duplicate predictions push recall past 1.0)
    hits_p = sum(1 for tb in t_a if len(t_l) and np.min(np.abs(t_l - tb)) < 0.07)
    hits_r = sum(1 for tb in t_l if len(t_a) and np.min(np.abs(t_a - tb)) < 0.07)
    prec = hits_p / max(1, len(t_a))
    rec = hits_r / max(1, len(t_l))
    report["beat_f_measure"] = 2 * prec * rec / max(1e-9, prec + rec)

    # ---- spectral features -------------------------------------------------
    S = np.abs(librosa.stft(y))
    S_adx = jnp.abs(adx_stft(jnp.asarray(y)))
    pairs = [
        ("centroid", librosa.feature.spectral_centroid(S=S, sr=sr),
         spectral_centroid(S_adx, sr, 2048)),
        ("bandwidth", librosa.feature.spectral_bandwidth(S=S, sr=sr),
         spectral_bandwidth(S_adx, sr, 2048)),
        ("rolloff", librosa.feature.spectral_rolloff(S=S, sr=sr),
         spectral_rolloff(S_adx, sr, 2048)),
        ("flatness", librosa.feature.spectral_flatness(S=S), spectral_flatness(S_adx)),
    ]
    worst = 0.0
    for name, want, got in pairs:
        want = np.ravel(want)
        got = np.ravel(np.asarray(got))
        m = min(len(want), len(got))
        err = float(np.median(np.abs(got[:m] - want[:m]) / (np.abs(want[:m]) + 1e-9)))
        print(f"  spectral_{name}: median rel err {err:.2e}")
        worst = max(worst, err)
    report["spectral_rel_err"] = worst

    # ---- verdict -----------------------------------------------------------
    print("\nquantity                     measured     tolerance   verdict")
    ok = True
    for k, tol in TOLS.items():
        v = report[k]
        if k in ("pyin_voiced_agreement", "beat_f_measure", "onset_env_corr"):
            good = v >= tol
            rel_s = f">= {tol}"
        else:
            good = v <= tol
            rel_s = f"<= {tol}"
        ok &= good
        print(f"{k:28s} {v:10.4f}   {rel_s:>10s}   {'PASS' if good else 'FAIL'}")
    print("\nOVERALL:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
