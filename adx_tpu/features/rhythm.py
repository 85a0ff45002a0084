"""Tempo estimation and beat tracking (host-side numpy).

Dynamic-programming beat tracker in the style of Ellis (2007), matching the
call semantics of ``librosa.beat.beat_track(onset_envelope=..., sr=...)``
the reference uses (src/feature_extraction.py:313-326). The DP is inherently
sequential, so it stays on host (SURVEY.md §2.3 "beat tracking = DP;
host-side acceptable").
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def tempo_estimate(
    onset_env: np.ndarray,
    sr: int = 22050,
    hop_length: int = 512,
    start_bpm: float = 120.0,
    std_bpm: float = 1.0,
    ac_size: float = 8.0,
    max_tempo: float = 320.0,
) -> float:
    """Global tempo from windowed autocorrelation with a log-normal prior."""
    onset_env = np.asarray(onset_env, dtype=np.float64)
    n = len(onset_env)
    win = min(n, int(ac_size * sr / hop_length))
    x = onset_env[:win] - onset_env[:win].mean()
    ac = np.correlate(x, x, mode="full")[win - 1 :]
    ac = ac / (ac[0] + 1e-10)

    if len(ac) < 2:
        # sub-hop clip: no lag to score — the prior's peak (= start_bpm) is
        # all the information there is, same as the degenerate branch below
        return float(start_bpm)
    lags = np.arange(1, len(ac))
    bpms = 60.0 * sr / (hop_length * lags)
    prior = np.exp(-0.5 * ((np.log2(bpms) - np.log2(start_bpm)) / std_bpm) ** 2)
    prior[bpms > max_tempo] = 0.0
    prior[bpms < 20] = 0.0
    score = ac[1:] * prior
    if not np.isfinite(score).any() or score.max() <= 0:
        # degenerate envelope (constant / zero flux → all-zero
        # autocorrelation): librosa's argmax of log1p(tempogram)+logprior
        # then reduces to the PRIOR's peak (≈ start_bpm), not lag 1
        # (which would report ~2584 BPM at the 22050/512 defaults)
        best = int(np.argmax(prior)) + 1
    else:
        best = int(np.argmax(score)) + 1
    return float(60.0 * sr / (hop_length * best))


def beat_track(
    onset_envelope: np.ndarray,
    sr: int = 22050,
    hop_length: int = 512,
    start_bpm: float = 120.0,
    tightness: float = 100.0,
    bpm: Optional[float] = None,
) -> Tuple[float, np.ndarray]:
    """(tempo_bpm, beat_frames) via the DP beat tracker."""
    onset_env = np.asarray(onset_envelope, dtype=np.float64)
    if onset_env.size == 0 or not onset_env.any():
        return 0.0, np.array([], dtype=int)
    if bpm is None:
        bpm = tempo_estimate(onset_env, sr=sr, hop_length=hop_length, start_bpm=start_bpm)
    if bpm <= 0:
        return 0.0, np.array([], dtype=int)
    period = round(60.0 * sr / (hop_length * bpm))
    period = max(1, int(period))

    # normalize onset strength
    oe = onset_env / (onset_env.std() + 1e-10)

    n = len(oe)
    backlink = np.full(n, -1, dtype=int)
    cumscore = oe.copy()
    prange = np.arange(-2 * period, -period // 2 + 1)
    txwt = -tightness * (np.log(-prange / period) ** 2)

    for i in range(n):
        timerange = i + prange
        valid = timerange >= 0
        if not valid.any():
            continue
        scorecands = np.full(len(prange), -np.inf)
        scorecands[valid] = txwt[valid] + cumscore[timerange[valid]]
        beat_location = int(np.argmax(scorecands))
        cumscore[i] = oe[i] + scorecands[beat_location]
        if scorecands[beat_location] > -np.inf:
            backlink[i] = timerange[beat_location]

    # pick the best scoring end point among high-score tail
    maxes = cumscore > 0.5 * cumscore.max()
    tail = np.flatnonzero(maxes)
    beats = [int(tail[-1])]
    while backlink[beats[-1]] >= 0:
        beats.append(int(backlink[beats[-1]]))
    beats = np.array(beats[::-1], dtype=int)
    return float(bpm), beats
