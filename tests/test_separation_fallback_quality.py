"""Quantify the weight-free fallback separator against known mixtures.

The reference's LIME stems are real Spleeter outputs
(src/lime_explainer.py:404-407); without converted weights this repo uses
``mask_separate`` (HPSS-median + band gating). These tests measure — not
hand-wave — how Spleeter-like those stems are, via SI-SNR against
ground-truth synthetic stems. Measured numbers are recorded in BASELINE.md.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from adx_tpu.explainers.separation import mask_separate

SR = 44100
DUR = 3.0


def si_snr(est: np.ndarray, ref: np.ndarray) -> float:
    """Scale-invariant SNR in dB."""
    ref = ref - ref.mean()
    est = est - est.mean()
    alpha = float(np.dot(est, ref) / (np.dot(ref, ref) + 1e-12))
    target = alpha * ref
    noise = est - target
    return float(10.0 * np.log10(
        (np.dot(target, target) + 1e-12) / (np.dot(noise, noise) + 1e-12)
    ))


@pytest.fixture(scope="module")
def ground_truth_mixture():
    n = int(SR * DUR)
    t = np.arange(n) / SR
    rng = np.random.default_rng(11)

    # "vocals": harmonic stack, 440 Hz fundamental with true FM vibrato
    # (phase modulation — NOT f·(1+ε sin)·t, which is a runaway chirp)
    f_mod = 5.5
    vocals = sum(
        (0.4 / h) * np.sin(
            2 * np.pi * 440 * h * t
            + (0.01 * 440 * h / f_mod) * np.sin(2 * np.pi * f_mod * t)
        )
        for h in (1, 2, 3, 4)
    )
    # "drums": broadband impulses at 2 Hz, short decaying noise bursts
    drums = np.zeros(n)
    burst = rng.standard_normal(int(0.03 * SR)) * np.exp(
        -np.arange(int(0.03 * SR)) / (0.005 * SR)
    )
    for onset in np.arange(0, n - len(burst), SR // 2):
        drums[onset : onset + len(burst)] += 0.8 * burst
    # "bass": low sine at 70 Hz
    bass = 0.5 * np.sin(2 * np.pi * 70 * t)

    stems = {
        "vocals": vocals.astype(np.float32),
        "drums": drums.astype(np.float32),
        "bass": bass.astype(np.float32),
    }
    mixture = (vocals + drums + bass).astype(np.float32)
    return mixture, stems


def test_fallback_separator_si_snr(ground_truth_mixture):
    mixture, truth = ground_truth_mixture
    est = mask_separate(mixture, SR, "spleeter:4stems")
    scores = {
        name: si_snr(np.asarray(est[f"{name}0"]), truth[name])
        for name in ("vocals", "drums", "bass")
    }
    mix_scores = {
        name: si_snr(mixture, truth[name]) for name in ("vocals", "drums", "bass")
    }
    print("fallback SI-SNR (dB):", {k: round(v, 2) for k, v in scores.items()})
    print("mixture SI-SNR (dB):", {k: round(v, 2) for k, v in mix_scores.items()})
    # every stem must beat just handing back the mixture (else the stems
    # carry no separation information at all)
    for name in scores:
        assert scores[name] > mix_scores[name] + 3.0, (name, scores, mix_scores)
    # vocals-energy recall floor: the vocals stem must capture most of the
    # true vocals (projection coefficient of truth onto the estimate)
    v_est = np.asarray(est["vocals0"])
    recall = float(np.dot(v_est, truth["vocals"]) / np.dot(truth["vocals"], truth["vocals"]))
    assert recall > 0.7, recall


def test_fallback_partition_property(ground_truth_mixture):
    """Σ stems == mixture (the invariant LIME recombinations rely on)."""
    mixture, _ = ground_truth_mixture
    est = mask_separate(mixture, SR, "spleeter:4stems")
    total = sum(np.asarray(w) for w in est.values())
    # soft masks sum to 1 per bin and the ISTFT is linear, so Σ stems must
    # reconstruct the FULL mixture — including the final partial hop, which
    # librosa's istft(length=...) fills from the tail frames' overlap-add
    # (the old implementation zeroed it; fixed in round 3)
    scale = max(1.0, np.abs(mixture).max())
    assert np.abs(total - mixture).max() < 2e-3 * scale
    # the tail is REAL audio now, not silence
    tail = total[1024 * (len(mixture) // 1024):]
    if np.abs(mixture[1024 * (len(mixture) // 1024):]).max() > 1e-3:
        assert np.abs(tail).max() > 0.0
