"""pYIN fundamental-frequency estimation (host-side numpy).

Implements the probabilistic-YIN algorithm (Mauch & Dixon 2014) with
librosa-compatible call semantics: ``pyin(y, fmin, fmax, sr=22050, ...)``
returns ``(f0, voiced_flag, voiced_prob)`` per frame with NaN where
unvoiced.

The reference calls ``librosa.pyin(y=audio, fmin=C2, fmax=C7)`` *without*
passing the true sample rate (src/feature_extraction.py:11-13), so its f0
values are computed against librosa's default sr=22050 even for 44.1 kHz
audio; the same default is kept here so features remain comparable.

Vectorized stages (difference function, CMNDF, trough probabilities,
observation matrix) run in numpy across all frames; the sequential Viterbi
recursion dispatches to the C kernel in ``adx_tpu/native/pyin_viterbi.c``
(bit-exact, ~7× on this host) with the banded numpy loop as fallback.
This is the documented "host fallback first" path (SURVEY.md §7.2.7) — the
Viterbi is sequential and off the latency-critical explain path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _frame(y: np.ndarray, frame_length: int, hop_length: int) -> np.ndarray:
    # strided view (no copy): consumers either make their own contiguous
    # copy (FFT) or stream it once (cumsum)
    from numpy.lib.stride_tricks import sliding_window_view

    return sliding_window_view(y, frame_length)[::hop_length]


def _difference_function(
    frames: np.ndarray, max_tau: int, y: np.ndarray, hop_length: int
) -> np.ndarray:
    """YIN difference function d[t, τ] for τ in [0, max_tau) via FFT
    autocorrelation. ``frames`` is [T, frame_length] (strided windows of
    ``y`` at ``hop_length``); window W = max_tau.

    FFTs go through scipy.fft, which keeps float32 (numpy upcasts to
    float64 — 2× the bandwidth for no benefit at CMNDF's ~1e-3 working
    precision) and accepts non-power-of-two fast lengths (3·2^k etc.),
    both measured wins on the 10k-frame 120 s workload."""
    from scipy.fft import irfft, next_fast_len, rfft

    T, N = frames.shape
    W = max_tau
    frames = np.ascontiguousarray(frames, dtype=np.float32)
    # r[τ] = Σ_{j=0}^{W-1} x[j] x[j+τ] — correlate the first-W window
    # against the full frame (correlation theorem; no wraparound for τ < W)
    n_fft = next_fast_len(N + W, real=True)
    F_full = rfft(frames, n_fft, axis=1)
    F_win = rfft(frames[:, :W], n_fft, axis=1)
    np.conjugate(F_win, out=F_win)
    np.multiply(F_full, F_win, out=F_full)
    acf = irfft(F_full, n_fft, axis=1)[:, :W]
    # energy terms: e0 = Σ_{j<W} x²; e_tau = Σ_{τ<=j<τ+W} x². Frames are
    # overlapping windows of one signal, so ONE global float64 cumsum of y²
    # (2.6M adds) replaces the old per-frame [T, N] cumsum — which squared
    # and accumulated a 200 MB float64 temporary on every call. Two [T, W]
    # gathers difference it back per (frame, lag).
    c = np.empty(len(y) + 1, np.float64)
    c[0] = 0.0
    np.cumsum(np.square(y, dtype=np.float64), out=c[1:])
    # win_energy[i] = Σ_{i<=j<i+W} y[j]²; frame t's lag-τ energy is the
    # contiguous slice win_energy[t·hop : t·hop+W] — a strided row view,
    # materialized once as the float32 e_tau
    from numpy.lib.stride_tricks import sliding_window_view

    win_energy = c[W:] - c[:-W]
    starts = np.arange(T, dtype=np.int64) * hop_length
    e_tau = sliding_window_view(win_energy, W)[starts].astype(np.float32)
    e0 = e_tau[:, [0]]  # τ = 0 window IS the first-W energy
    # d = e0 + e_tau - 2·acf, built in place on the acf buffer
    d = np.ascontiguousarray(acf)
    d *= -2.0
    d += e_tau
    d += e0
    return np.maximum(d, 0.0, out=d)


def _cmndf(d: np.ndarray) -> np.ndarray:
    tau = np.arange(d.shape[1])
    cum = np.cumsum(d[:, 1:], axis=1)
    out = np.ones_like(d)
    out[:, 1:] = d[:, 1:] * tau[1:] / (cum + 1e-12)
    return out


def _trough_probabilities(
    dp: np.ndarray,
    trough_mask: np.ndarray,
    thresholds: np.ndarray,
    beta_w: np.ndarray,
    no_trough_prob: float,
    sr: float,
    fmin: float,
    fmax: float,
    n_bins_per_semitone: int,
    n_pitch_bins: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-frame trough probabilities, fully vectorized over ALL
    (frame, trough) pairs.

    The per-threshold rule "the FIRST (lowest-τ) trough below the
    threshold wins that threshold's beta weight" has a closed form: a
    trough with value v and exclusive prefix-min m (over earlier troughs
    in its frame) wins exactly the thresholds in (v, m] — a contiguous
    interval of the threshold grid, summed via the cumulative beta
    weights. This replaces a ~10k-iteration per-frame Python loop.
    Returns ``(obs_voiced [T, n_pitch_bins], voiced_prob [T])``.
    """
    T = dp.shape[0]
    obs_voiced = np.zeros((T, n_pitch_bins))
    voiced_prob = np.zeros(T)

    fr, tau0 = np.nonzero(trough_mask)  # frame-major, τ ascending per frame
    if len(fr):
        vals = dp[fr, tau0]
        # parabolic interpolation (trough_mask only marks interior bins)
        a = dp[fr, tau0 - 1]
        c = dp[fr, tau0 + 1]
        denom = a - 2 * vals + c
        safe = np.abs(denom) > 1e-12
        shift = np.where(safe, 0.5 * (a - c) / np.where(safe, denom, 1.0), 0.0)
        shift = np.clip(shift, -0.5, 0.5)
        tau_interp = tau0 + shift  # float64
        val_interp = (vals - 0.25 * (a - c) * shift).astype(np.float32)

        counts = np.bincount(fr, minlength=T)
        c_end = np.cumsum(counts)
        c_start = c_end - counts

        # exclusive within-frame prefix min of val_interp, clipped to
        # [0, 1.5] (exact: C_of below is constant outside (0, 1], so
        # clipping changes nothing downstream). Groups are contiguous, so
        # shift by one, put the cap at each group start, and reset-free
        # cummax of (2·frame − value) isolates groups: earlier frames sit
        # ≥ 0.5 lower ONLY because the clip bounds values to < 2 — CMNDF
        # in silent regions reaches ~330 and parabolic interpolation can
        # go negative, either of which would leak the running min across
        # frame boundaries without the lower clip.
        capped = np.empty(len(fr), np.float64)
        capped[1:] = np.clip(val_interp[:-1], 0.0, 1.5)
        capped[c_start[counts > 0]] = 1.5
        cmax = np.maximum.accumulate(2.0 * fr - capped)
        prefix_min_excl = 2.0 * fr - cmax

        # C(x) = Σ beta_w over thresholds ≤ x; trough weight = C(m) − C(v)
        Cw = np.concatenate([[0.0], np.cumsum(beta_w)])
        C_of = lambda x: Cw[np.searchsorted(thresholds, x, side="right")]  # noqa: E731
        probs_flat = np.maximum(C_of(prefix_min_excl) - C_of(val_interp), 0.0)

        # thresholds with no trough below (thr ≤ frame min): tiny mass on
        # the frame's best trough, but only when that trough shows genuine
        # periodicity — otherwise a lone concentrated 0.01 beats the
        # unvoiced state's per-bin density and silence decodes as voiced
        nz = counts > 0
        gmin = np.full(T, np.inf)
        gmin[nz] = np.minimum.reduceat(val_interp, c_start[nz])
        # first index attaining the frame min (np.argmin tie semantics)
        is_min = val_interp == gmin[fr]
        cm = np.cumsum(is_min)
        before = cm - is_min - np.concatenate([[0], cm])[c_start[fr]]
        first_min = is_min & (before == 0)
        miss_w = np.zeros(T)
        miss_w[nz] = Cw[np.searchsorted(thresholds, gmin[nz], side="right")]
        add_miss = first_min & (miss_w[fr] > 0) & (gmin[fr] < 0.8)
        probs_flat[add_miss] += no_trough_prob * miss_w[fr[add_miss]]

        freqs_flat = sr / np.maximum(tau_interp, 1e-6)
        valid = (freqs_flat >= fmin) & (freqs_flat <= fmax)
        bins = np.clip(
            np.round(
                12 * n_bins_per_semitone * np.log2(freqs_flat[valid] / fmin)
            ).astype(int),
            0, n_pitch_bins - 1,
        )
        np.add.at(obs_voiced, (fr[valid], bins), probs_flat[valid])
        voiced_prob = np.minimum(
            1.0, np.bincount(fr[valid], weights=probs_flat[valid], minlength=T)
        )
    return obs_voiced, voiced_prob


def _viterbi_numpy(
    log_obs_v: np.ndarray,
    log_obs_u: np.ndarray,
    log_tri: np.ndarray,
    K: int,
    log_stay: float,
    log_switch: float,
    delta_init: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pure-numpy banded two-row Viterbi (fallback / ground truth for the
    C kernel in ``adx_tpu/native/pyin_viterbi.c``). Returns
    ``(states int32 [T], voiced bool [T])``.

    One banded max+argmax for BOTH source rows per frame. out[r, s] =
    max_{|s'-s|<=K} delta[r, s'] + log_tri[s'-s], computed as a single
    [2, M, 2K+1] matrix argmax over sliding windows of a -inf-padded
    delta (window element k holds delta[s-K+k], i.e. offset s'-s = k-K,
    whose transition weight is log_tri[k] by symmetry of the triangular
    kernel). Replaces a 4×(2K+1)-iteration Python slice loop per frame
    (K≈100, the dominant pyin cost: 6.3 s of 7.5 s compute on a 30 s
    track before vectorization).
    """
    from numpy.lib.stride_tricks import sliding_window_view

    T, M = log_obs_v.shape
    s_idx = np.arange(M)
    log_tri32 = log_tri.astype(np.float32)
    padded = np.full((2, M + 2 * K), -np.inf, np.float32)
    # hot-loop buffers preallocated once: the loop runs ~10k iterations on
    # a single-core host, so per-frame allocations/astype churn dominate
    windows = sliding_window_view(padded, 2 * K + 1, axis=1)  # view, no copy
    scores = np.empty((2, M, 2 * K + 1), np.float32)
    offset = (s_idx - K).astype(np.int32)  # window slot k ↔ source s-K+k
    delta_vu = delta_init.copy()
    back_v = np.zeros((T, M), dtype=np.int32)
    back_u = np.zeros((T, M), dtype=np.int32)
    from_u = np.zeros((T, M), dtype=bool)
    from_v = np.zeros((T, M), dtype=bool)

    for t in range(1, T):
        padded[:, K : K + M] = delta_vu
        np.add(windows, log_tri32, out=scores)
        k_best = scores.argmax(axis=2)  # [2, M]
        best = np.take_along_axis(scores, k_best[:, :, None], axis=2)[:, :, 0]
        bm_v, bm_u = best[0], best[1]
        # voiced[t] from voiced (stay) or unvoiced (switch)
        cand_vv = bm_v + log_stay
        cand_uv = bm_u + log_switch
        take_u = cand_uv > cand_vv
        np.add(np.where(take_u, cand_uv, cand_vv), log_obs_v[t], out=delta_vu[0])
        from_u[t] = take_u
        # unvoiced[t]
        cand_uu = bm_u + log_stay
        cand_vu = bm_v + log_switch
        take_v = cand_vu > cand_uu
        np.add(np.where(take_v, cand_vu, cand_uu), log_obs_u[t], out=delta_vu[1])
        from_v[t] = take_v

        arg = k_best.astype(np.int32)
        arg += offset  # band argmax as absolute state index
        back_v[t] = np.where(take_u, arg[1], arg[0])
        back_u[t] = np.where(take_v, arg[0], arg[1])

    # backtrace
    states = np.zeros(T, dtype=np.int32)
    voiced = np.zeros(T, dtype=bool)
    if delta_vu[0].max() >= delta_vu[1].max():
        states[-1] = int(np.argmax(delta_vu[0]))
        voiced[-1] = True
    else:
        states[-1] = int(np.argmax(delta_vu[1]))
        voiced[-1] = False
    for t in range(T - 1, 0, -1):
        if voiced[t]:
            states[t - 1] = back_v[t, states[t]]
            voiced[t - 1] = not from_u[t, states[t]]
        else:
            states[t - 1] = back_u[t, states[t]]
            voiced[t - 1] = from_v[t, states[t]]
    return states, voiced


def pyin(
    y: np.ndarray,
    fmin: float,
    fmax: float,
    sr: int = 22050,
    frame_length: int = 2048,
    win_length: Optional[int] = None,
    hop_length: Optional[int] = None,
    n_thresholds: int = 100,
    beta_parameters: Tuple[float, float] = (2.0, 18.0),
    resolution: float = 0.1,
    max_transition_rate: float = 35.92,
    switch_prob: float = 0.01,
    no_trough_prob: float = 0.01,
    center: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    # float32 end-to-end for the framed/FFT stages (half the bandwidth);
    # energy cumsums and the CMNDF ratios accumulate in float64 where the
    # running sums are long
    y = np.asarray(y, dtype=np.float32)
    win_length = win_length or frame_length // 2
    if not 1 <= win_length <= frame_length // 2:
        # the difference function correlates a win_length window against
        # lags up to win_length inside one frame_length frame — beyond
        # frame_length//2 the lag window runs off the frame (observed:
        # IndexError in the energy gather, or silently inconsistent CMNDF
        # where the acf zero-pads but the energy term reads real samples)
        raise ValueError(
            f"pyin: win_length={win_length} must be in [1, frame_length//2="
            f"{frame_length // 2}] (librosa's default is frame_length//2)"
        )
    hop_length = hop_length or frame_length // 4
    if center:
        y = np.pad(y, frame_length // 2)
    frames = _frame(y, frame_length, hop_length)
    T = frames.shape[0]

    tau_min = max(1, int(sr / fmax))
    tau_max = min(win_length, int(sr / fmin) + 1)
    d = _difference_function(frames, win_length, y, hop_length)
    dp = _cmndf(d)

    # --- trough candidates per frame -------------------------------------
    interior = dp[:, 1:-1]
    is_trough = (interior < dp[:, :-2]) & (interior <= dp[:, 2:])
    taus = np.arange(dp.shape[1])
    in_range = (taus >= tau_min) & (taus < tau_max)
    trough_mask = np.zeros_like(dp, dtype=bool)
    trough_mask[:, 1:-1] = is_trough
    trough_mask &= in_range[None, :]

    # threshold distribution (beta pdf over [0, 1]); betainc IS the
    # regularized beta CDF (scipy.special imports ~10× faster than
    # scipy.stats, which costs seconds on first use)
    from scipy.special import betainc

    thresholds = np.linspace(0, 1, n_thresholds + 1)[1:]
    beta_cdf = betainc(*beta_parameters, np.linspace(0, 1, n_thresholds + 1))
    beta_w = np.diff(beta_cdf)  # weight per threshold bin

    # pitch-bin grid
    n_bins_per_semitone = int(round(1.0 / resolution))
    n_pitch_bins = int(np.floor(12 * n_bins_per_semitone * np.log2(fmax / fmin))) + 1

    obs_voiced, voiced_prob = _trough_probabilities(
        dp, trough_mask, thresholds, beta_w, no_trough_prob,
        sr, fmin, fmax, n_bins_per_semitone, n_pitch_bins,
    )

    # --- Viterbi over 2M states (voiced bins + unvoiced bins) -------------
    M = n_pitch_bins
    # max pitch slew in bins per frame
    frames_per_sec = sr / hop_length
    max_step = max(
        1, int(round(max_transition_rate * 12 * n_bins_per_semitone / frames_per_sec))
    )
    offsets = np.arange(-max_step, max_step + 1)
    tri_w = 1.0 - np.abs(offsets) / (max_step + 1)
    tri_w /= tri_w.sum()

    log_obs_v = np.log(np.maximum(obs_voiced, 1e-30))
    log_obs_u = np.log(np.maximum((1.0 - voiced_prob)[:, None] / M, 1e-30))
    log_stay = np.log1p(-switch_prob)
    log_switch = np.log(switch_prob)
    log_tri = np.log(tri_w)

    K = max_step
    delta_init = np.full((2, M), np.log(1.0 / (2 * M)), np.float32)
    delta_init[0] += log_obs_v[0]
    delta_init[1] += log_obs_u[0]

    # C kernel first (~10× on the 1-core host; bit-exact to the numpy
    # twin — tests/test_pyin_native.py), numpy loop as the fallback when
    # no toolchain is available or the band exceeds the uint8 envelope.
    decoded = None
    if T > 1:
        from adx_tpu.native import pyin_viterbi_native

        decoded = pyin_viterbi_native(
            log_obs_v, log_obs_u, log_tri.astype(np.float32), K,
            float(log_stay), float(log_switch), delta_init,
        )
    if decoded is None:
        decoded = _viterbi_numpy(
            log_obs_v, log_obs_u, log_tri, K,
            float(log_stay), float(log_switch), delta_init,
        )
    states, voiced = decoded

    bin_freqs = fmin * 2.0 ** (np.arange(n_pitch_bins) / (12 * n_bins_per_semitone))
    f0 = bin_freqs[states].astype(np.float64)
    f0[~voiced] = np.nan
    return f0, voiced, voiced_prob


def note_to_hz(note: str) -> float:
    """'C2' → Hz (librosa.note_to_hz for natural notes with octave)."""
    names = {"C": 0, "D": 2, "E": 4, "F": 5, "G": 7, "A": 9, "B": 11}
    name = note[0].upper()
    rest = note[1:]
    semitone = names[name]
    if rest.startswith("#"):
        semitone += 1
        rest = rest[1:]
    elif rest.startswith("b"):
        semitone -= 1
        rest = rest[1:]
    octave = int(rest)
    midi = 12 * (octave + 1) + semitone
    return 440.0 * 2.0 ** ((midi - 69) / 12.0)
