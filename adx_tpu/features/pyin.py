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
    frames: np.ndarray, win_length: int, max_tau: int, y: np.ndarray,
    hop_length: int,
) -> np.ndarray:
    """YIN difference function d[t, τ] for τ in [0, max_tau) via FFT
    autocorrelation. ``frames`` is [T, frame_length] (strided windows of
    ``y`` at ``hop_length``); the correlated window has ``win_length``
    samples and lags run to ``max_tau`` (librosa allows lags up to
    frame_length − win_length − 1, beyond win_length when win_length is
    small — the two are independent). Requires
    ``max_tau ≤ frame_length − win_length + 1``.

    FFTs go through scipy.fft, which keeps float32 (numpy upcasts to
    float64 — 2× the bandwidth for no benefit at CMNDF's ~1e-3 working
    precision) and accepts non-power-of-two fast lengths (3·2^k etc.),
    both measured wins on the 10k-frame 120 s workload."""
    from scipy.fft import irfft, next_fast_len, rfft

    T, N = frames.shape
    W = win_length
    frames = np.ascontiguousarray(frames, dtype=np.float32)
    # r[τ] = Σ_{j=0}^{W-1} x[j] x[j+τ] — correlate the first-W window
    # against the full frame (correlation theorem; no wraparound for
    # τ ≤ N − W)
    n_fft = next_fast_len(N + W, real=True)
    F_full = rfft(frames, n_fft, axis=1)
    F_win = rfft(frames[:, :W], n_fft, axis=1)
    np.conjugate(F_win, out=F_win)
    np.multiply(F_full, F_win, out=F_full)
    acf = irfft(F_full, n_fft, axis=1)[:, :max_tau]
    # energy terms: e0 = Σ_{j<W} x²; e_tau = Σ_{τ<=j<τ+W} x². Frames are
    # overlapping windows of one signal, so ONE global float64 cumsum of y²
    # (2.6M adds) replaces the old per-frame [T, N] cumsum — which squared
    # and accumulated a 200 MB float64 temporary on every call. Two
    # [T, max_tau] gathers difference it back per (frame, lag).
    c = np.empty(len(y) + 1, np.float64)
    c[0] = 0.0
    np.cumsum(np.square(y, dtype=np.float64), out=c[1:])
    # win_energy[i] = Σ_{i<=j<i+W} y[j]²; frame t's lag-τ energy is the
    # contiguous slice win_energy[t·hop : t·hop+max_tau] — a strided row
    # view, materialized once as the float32 e_tau
    from numpy.lib.stride_tricks import sliding_window_view

    win_energy = c[W:] - c[:-W]
    starts = np.arange(T, dtype=np.int64) * hop_length
    e_tau = sliding_window_view(win_energy, max_tau)[starts].astype(np.float32)
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


_BOLTZMANN_LAMBDA = 2.0  # librosa pyin's boltzmann_parameter default


def _trough_mask(dp_trim: np.ndarray) -> np.ndarray:
    """librosa trough detection on the TRIMMED lag range: util.localmin
    with edge padding (last lag is a trough when it undercuts its
    predecessor) plus pyin's explicit boundary rule at lag 0."""
    T, L = dp_trim.shape
    mask = np.zeros((T, L), dtype=bool)
    if L >= 2:
        mask[:, 0] = dp_trim[:, 0] < dp_trim[:, 1]
        mask[:, -1] = dp_trim[:, -1] < dp_trim[:, -2]
    if L >= 3:
        interior = dp_trim[:, 1:-1]
        mask[:, 1:-1] = (interior < dp_trim[:, :-2]) & (interior <= dp_trim[:, 2:])
    return mask


def _parabolic_shifts(dp_trim: np.ndarray) -> np.ndarray:
    """librosa _parabolic_interpolation on the trimmed CMNDF: shift =
    −b/(2a); |shift| > 1 → 0; boundary lags → 0."""
    shifts = np.zeros_like(dp_trim, dtype=np.float64)
    if dp_trim.shape[1] >= 3:
        a = (dp_trim[:, :-2] + dp_trim[:, 2:] - 2.0 * dp_trim[:, 1:-1]) / 2.0
        b = (dp_trim[:, 2:] - dp_trim[:, :-2]) / 2.0
        s = -b / (2.0 * a + 1e-38)
        s[np.abs(s) > 1.0] = 0.0
        shifts[:, 1:-1] = s
    return shifts


def _trough_probabilities(
    dp_trim: np.ndarray,
    trough_mask: np.ndarray,
    thresholds: np.ndarray,
    beta_w: np.ndarray,
    no_trough_prob: float,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """librosa _pyin_helper steps 2-5, vectorized over ALL (frame, trough)
    pairs instead of a ~10k-iteration per-frame Python loop:

    * thresholds test the RAW CMNDF trough heights (librosa thresholds
      before parabolic refinement),
    * each threshold's beta weight is distributed over ALL troughs below
      it with a Boltzmann(λ=2) prior on the rank (position among the
      below-threshold troughs in ascending-lag order) — NOT all-to-the-
      first-trough,
    * each frame's global-min trough (first tie, np.argmin semantics)
      additionally receives ``no_trough_prob ×`` the beta mass of the
      thresholds it does not beat.

    Returns ``(fr, pos, probs_flat)`` aligned with
    ``np.nonzero(trough_mask)`` (frame-major, lag ascending per frame).
    """
    T = dp_trim.shape[0]
    fr, pos = np.nonzero(trough_mask)
    probs_flat = np.zeros(len(fr))
    if not len(fr):
        return fr, pos, probs_flat
    heights = dp_trim[fr, pos].astype(np.float64)
    counts = np.bincount(fr, minlength=T)
    c_end = np.cumsum(counts)
    c_start = c_end - counts
    start_of = c_start[fr]
    end_of = c_end[fr] - 1

    lam = _BOLTZMANN_LAMBDA
    one_minus = 1.0 - np.exp(-lam)
    # chunk the threshold axis so the [n_troughs, chunk] temporaries stay
    # a few MB even on 120 s tracks (~400k troughs × 100 thresholds)
    for lo in range(0, len(thresholds), 16):
        tc = thresholds[lo : lo + 16]
        below = heights[:, None] < tc[None, :]
        C = np.cumsum(below, axis=0, dtype=np.int64)
        base = np.where(start_of[:, None] > 0, C[start_of - 1, :], 0)
        rank = C - base - 1  # 0-based rank among the frame's below-troughs
        n_below = C[end_of, :] - base
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            pmf = one_minus * np.exp(-lam * rank) / (1.0 - np.exp(-lam * n_below))
        probs_flat += np.where(below, pmf, 0.0) @ beta_w[lo : lo + 16]

    # global-min bonus (librosa: unconditional, first-tie argmin on the
    # raw heights; mass = beta weight of the thresholds the min does NOT
    # beat, i.e. thresholds ≤ min height)
    nz = counts > 0
    gmin = np.full(T, np.inf)
    gmin[nz] = np.minimum.reduceat(heights, c_start[nz])
    is_min = heights == gmin[fr]
    cm = np.cumsum(is_min)
    before = cm - is_min - np.concatenate([[0], cm])[c_start[fr]]
    first_min = is_min & (before == 0)
    Cw = np.concatenate([[0.0], np.cumsum(beta_w)])
    miss_w = np.zeros(T)
    miss_w[nz] = Cw[np.searchsorted(thresholds, gmin[nz], side="right")]
    probs_flat[first_min] += no_trough_prob * miss_w[fr[first_min]]
    return fr, pos, probs_flat


def _viterbi_numpy(
    log_obs_v: np.ndarray,
    log_obs_u: np.ndarray,
    log_tri: np.ndarray,
    K: int,
    log_stay: float,
    log_switch: float,
    delta_init: np.ndarray,
    rn: Optional[np.ndarray] = None,
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
    # per-SOURCE edge-renormalization penalty (librosa transition_local
    # row normalization), subtracted when delta enters the band window
    rn32 = (np.zeros(M, np.float32) if rn is None
            else np.asarray(rn, np.float32))
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
        padded[:, K : K + M] = delta_vu - rn32
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

    # librosa lag range: min_period = floor(sr/fmax), max_period =
    # min(ceil(sr/fmin), frame_length − win_length − 1), both INCLUSIVE
    tau_min = max(1, int(np.floor(sr / fmax)))
    tau_max = min(int(np.ceil(sr / fmin)), frame_length - win_length - 1)
    if tau_max <= tau_min:
        raise ValueError(
            f"pyin: empty lag range [{tau_min}, {tau_max}] — fmin={fmin}/"
            f"fmax={fmax} do not fit frame_length={frame_length} at sr={sr}"
        )
    d = _difference_function(frames, win_length, tau_max + 1, y, hop_length)
    dp = _cmndf(d)
    dp_trim = dp[:, tau_min : tau_max + 1]

    trough_mask = _trough_mask(dp_trim)
    shifts = _parabolic_shifts(dp_trim)

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

    fr, pos, probs_flat = _trough_probabilities(
        dp_trim, trough_mask, thresholds, beta_w, no_trough_prob,
    )

    # candidate refinement + binning (librosa: parabolic shift refines the
    # PERIOD only; bins clip into range rather than dropping the mass)
    obs_voiced = np.zeros((T, n_pitch_bins))
    if len(fr):
        period = tau_min + pos + shifts[fr, pos]
        f0_cand = sr / np.maximum(period, 1e-6)
        bins = np.clip(
            np.round(12 * n_bins_per_semitone * np.log2(f0_cand / fmin)).astype(int),
            0, n_pitch_bins - 1,
        )
        keep = probs_flat > 0
        # fancy ASSIGNMENT like librosa's observation_probs[bin, frame] =
        # yin_probs[...]: within-frame bin collisions keep the LAST
        # (highest-lag) candidate, they do not accumulate
        obs_voiced[fr[keep], bins[keep]] = probs_flat[keep]
    voiced_prob = np.clip(obs_voiced.sum(axis=1), 0.0, 1.0)

    # --- Viterbi over 2M states (voiced bins + unvoiced bins) -------------
    M = n_pitch_bins
    # librosa transition_local width: semitones/frame rounded FIRST, then
    # scaled to bins; the local window spans ±width//2
    msf = int(round(max_transition_rate * 12 * hop_length / sr))
    K = max(1, (max(1, msf) * n_bins_per_semitone + 1) // 2)
    offsets = np.arange(-K, K + 1)
    tri_w = 1.0 - np.abs(offsets) / (K + 1)
    tri_w /= tri_w.sum()

    log_obs_v = np.log(np.maximum(obs_voiced, 1e-30))
    log_obs_u = np.log(np.maximum((1.0 - voiced_prob)[:, None] / M, 1e-30))
    log_stay = np.log1p(-switch_prob)
    log_switch = np.log(switch_prob)
    log_tri = np.log(tri_w)

    # librosa's transition_local renormalizes edge-truncated rows to sum 1.
    # That per-SOURCE factor is exact in the banded kernels as a per-state
    # penalty subtracted when the previous delta enters the band window:
    # max_{s'}(delta(s') − rn(s') + tri(s−s')) IS the renormalized
    # objective, and delta itself (and the final argmax) stay unadjusted.
    valid_mass = np.convolve(np.ones(M), tri_w, mode="full")[K : K + M]
    rn = np.log(np.minimum(valid_mass, 1.0)).astype(np.float32)

    # librosa p_init: all mass uniform on the UNVOICED block
    delta_init = np.empty((2, M), np.float32)
    delta_init[0] = np.float32(-1e30) + log_obs_v[0]
    delta_init[1] = np.float32(-np.log(M)) + log_obs_u[0]

    # C kernel first (~10× on the 1-core host; bit-exact to the numpy
    # twin — tests/test_pyin_native.py), numpy loop as the fallback when
    # no toolchain is available or the band exceeds the uint8 envelope.
    decoded = None
    if T > 1:
        from adx_tpu.native import pyin_viterbi_native

        decoded = pyin_viterbi_native(
            log_obs_v, log_obs_u, log_tri.astype(np.float32), K,
            float(log_stay), float(log_switch), delta_init, rn=rn,
        )
    if decoded is None:
        decoded = _viterbi_numpy(
            log_obs_v, log_obs_u, log_tri, K,
            float(log_stay), float(log_switch), delta_init, rn=rn,
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
