"""Feature pipeline tests: physical correctness of each extractor and the
reference dict schema."""

import numpy as np
import pytest

import jax.numpy as jnp

from adx_tpu.features.extraction import (
    compute_hnr,
    compute_jitter_extended,
    compute_rhythm_stats,
    compute_shimmer_extended,
    detect_breaths,
    detect_voice_breaks,
    extract_all_features,
)
from adx_tpu.features.pyin import note_to_hz, pyin
from adx_tpu.features import spectral as sp
from adx_tpu.ops.stft import stft

SR = 22050


def test_note_to_hz():
    assert note_to_hz("A4") == pytest.approx(440.0)
    assert note_to_hz("C2") == pytest.approx(65.406, abs=0.01)
    assert note_to_hz("C7") == pytest.approx(2093.0, abs=0.1)


def test_pyin_recovers_sine_frequency():
    t = np.arange(SR) / SR  # 1 s
    for f0_true in [110.0, 220.0, 440.0]:
        y = np.sin(2 * np.pi * f0_true * t).astype(np.float32)
        f0, voiced, vprob = pyin(y, fmin=note_to_hz("C2"), fmax=note_to_hz("C7"), sr=SR)
        est = np.nanmedian(f0)
        assert abs(est - f0_true) / f0_true < 0.02, (f0_true, est)
        assert voiced.mean() > 0.8


def test_pyin_silence_is_unvoiced():
    y = 1e-6 * np.random.default_rng(0).standard_normal(SR).astype(np.float32)
    f0, voiced, vprob = pyin(y, fmin=65.0, fmax=2000.0, sr=SR)
    assert voiced.mean() < 0.2
    assert np.mean(vprob) < 0.3


def test_spectral_centroid_of_tone():
    t = np.arange(SR) / SR
    y = np.sin(2 * np.pi * 2000.0 * t).astype(np.float32)
    S = jnp.abs(stft(jnp.asarray(y), n_fft=2048, hop_length=512))
    cent = np.asarray(sp.spectral_centroid(S, SR, 2048))
    assert abs(np.median(cent) - 2000.0) < 50.0


def test_spectral_rolloff_ordering():
    rng = np.random.default_rng(0)
    y = rng.standard_normal(SR).astype(np.float32)
    S = jnp.abs(stft(jnp.asarray(y), n_fft=2048, hop_length=512))
    r01 = np.median(np.asarray(sp.spectral_rolloff(S, SR, 2048, 0.01)))
    r85 = np.median(np.asarray(sp.spectral_rolloff(S, SR, 2048, 0.85)))
    r99 = np.median(np.asarray(sp.spectral_rolloff(S, SR, 2048, 0.99)))
    assert r01 < r85 < r99
    # white noise: 85% rolloff near 85% of Nyquist
    assert abs(r85 - 0.85 * SR / 2) < 0.1 * SR / 2


def test_hpss_rolling_median_matches_scipy_reflect():
    """The device median masks must use edge (reflect) semantics like
    librosa's scipy median_filter — a wrapped roll coupled track start/end
    and made TPU-vs-CPU hnr values differ near the edges."""
    from scipy.ndimage import median_filter

    rng = np.random.default_rng(1)
    S = rng.random((40, 60)).astype(np.float32)
    mask_h, mask_p = sp.hpss(jnp.asarray(S), kernel_harm=31, kernel_perc=31)
    H = median_filter(S, size=(1, 31), mode="reflect")
    P = median_filter(S, size=(31, 1), mode="reflect")
    Hp, Pp = H**2.0, P**2.0
    want_h = np.where(Hp + Pp > 0, Hp / np.where(Hp + Pp > 0, Hp + Pp, 1.0), 0.5)
    np.testing.assert_allclose(np.asarray(mask_h), want_h, atol=2e-6)
    np.testing.assert_allclose(np.asarray(mask_p), 1.0 - want_h, atol=2e-6)


def test_spectral_contrast_librosa_semantics():
    """librosa transcription oracle: magnitude dB (10·log10), band-edge
    extension (k>0 reaches one bin down, last band to Nyquist, drop top
    bin for k<n_bands), quantile count from the extended band."""
    from adx_tpu.ops.mel import fft_frequencies
    from adx_tpu.ops.stft import stft as _stft

    rng = np.random.default_rng(3)
    y = rng.standard_normal(SR).astype(np.float32)
    S = np.abs(np.asarray(_stft(jnp.asarray(y), n_fft=2048, hop_length=512)))
    got = np.asarray(sp.spectral_contrast(jnp.asarray(S), SR, 2048))

    def p2db(x):
        db = 10.0 * np.log10(np.maximum(x, 1e-10))
        return np.maximum(db, db.max() - 80.0)

    freq = fft_frequencies(SR, 2048)
    n_bands, fmin, quantile = 6, 200.0, 0.02
    octa = np.zeros(n_bands + 2)
    octa[1:] = fmin * (2.0 ** np.arange(0, n_bands + 1))
    valley = np.zeros((n_bands + 1, S.shape[-1]))
    peak = np.zeros_like(valley)
    for k, (f_low, f_high) in enumerate(zip(octa[:-1], octa[1:])):
        current = np.logical_and(freq >= f_low, freq <= f_high)
        idx = np.flatnonzero(current)
        if k > 0:
            current[idx[0] - 1] = True
        if k == n_bands:
            current[idx[-1] + 1:] = True
        sub = S[current]
        if k < n_bands:
            sub = sub[:-1]
        n_q = int(np.maximum(np.rint(quantile * np.sum(current)), 1))
        srt = np.sort(sub, axis=0)
        valley[k] = np.mean(srt[:n_q], axis=0)
        peak[k] = np.mean(srt[-n_q:], axis=0)
    want = p2db(peak) - p2db(valley)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_spectral_flatness_floor_on_power():
    # bins between amin=1e-10 and sqrt(amin)=1e-5 must floor at amin on the
    # POWER spectrum (librosa), not amin**2
    S = np.full((5, 4), 1e-7, np.float32)
    S[0] = 0.5
    got = np.asarray(sp.spectral_flatness(jnp.asarray(S)))
    Sp = np.maximum(S.astype(np.float64) ** 2, 1e-10)
    want = np.exp(np.mean(np.log(Sp), axis=0)) / np.mean(Sp, axis=0)
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_onset_strength_centering_pad():
    rng = np.random.default_rng(0)
    y = rng.standard_normal(SR).astype(np.float32)
    env = np.asarray(sp.onset_strength(jnp.asarray(y), SR))
    from adx_tpu.ops.mel import melspectrogram

    n_frames = np.asarray(melspectrogram(jnp.asarray(y), sr=SR)).shape[-1]
    # librosa: front pad = lag + n_fft // (2*hop) = 3, trimmed to n_frames
    assert env.shape[-1] == n_frames
    assert np.all(env[:3] == 0.0)
    assert env[3] > 0.0


def test_tempo_estimate_degenerate_envelope_falls_to_prior():
    from adx_tpu.features.rhythm import tempo_estimate

    flat = np.ones(400, np.float64)  # constant nonzero flux
    bpm = tempo_estimate(flat, sr=SR, hop_length=512)
    assert 60.0 <= bpm <= 240.0  # prior peak, NOT lag-1 (~2584 BPM)


def test_spectral_flatness_range():
    t = np.arange(SR) / SR
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    noise = np.random.default_rng(1).standard_normal(SR).astype(np.float32)
    S_tone = jnp.abs(stft(jnp.asarray(tone), n_fft=2048, hop_length=512))
    S_noise = jnp.abs(stft(jnp.asarray(noise), n_fft=2048, hop_length=512))
    f_tone = float(np.median(np.asarray(sp.spectral_flatness(S_tone))))
    f_noise = float(np.median(np.asarray(sp.spectral_flatness(S_noise))))
    assert f_tone < 0.01 < f_noise


def test_rms_spec_approximates_rms_wave():
    rng = np.random.default_rng(2)
    y = rng.standard_normal(4 * 2048).astype(np.float32)
    yj = jnp.asarray(y)
    rw = np.asarray(sp.rms_from_audio(yj))
    S = jnp.abs(stft(yj, n_fft=2048, hop_length=512))
    rs = np.asarray(sp.rms_from_spectrogram(S))
    # Parseval with hann windowing: spectrogram RMS ≈ sqrt(mean(win²)) × wave
    # RMS = sqrt(0.375) × (same caveat as librosa's docs)
    scale = np.sqrt(0.375)
    np.testing.assert_allclose(rs[4 : len(rw) - 4], scale * rw[4:-4], rtol=0.1)


def test_hnr_separates_tone_from_noise():
    t = np.arange(2 * SR) / SR
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    noise = 0.5 * np.random.default_rng(3).standard_normal(2 * SR).astype(np.float32)
    assert compute_hnr(tone, SR) > compute_hnr(noise, SR) + 5.0


def test_rhythm_tempo_of_click_track():
    sr = SR
    bpm_true = 120.0
    n = 8 * sr
    y = np.zeros(n, dtype=np.float32)
    period = int(sr * 60 / bpm_true)
    for i in range(0, n - 200, period):
        y[i : i + 200] += np.hanning(200).astype(np.float32)
    stats = compute_rhythm_stats(y, sr)
    assert abs(stats["tempo_bpm"] - bpm_true) < 6.0
    assert set(stats) == {"tempo_bpm", "avg_onset_strength", "max_onset_strength"}


def test_breaths_and_voice_breaks():
    sr = SR
    seg = np.sin(2 * np.pi * 300 * np.arange(sr // 2) / sr).astype(np.float32)
    silence = np.zeros(sr // 2, dtype=np.float32)
    y = np.concatenate([seg, silence, seg, silence, seg])
    assert detect_breaths(y, sr) >= 2
    assert detect_voice_breaks(y, sr) >= 2
    assert detect_breaths(np.ones(sr, np.float32), sr) == 0


def test_jitter_shimmer_on_modulated_tone():
    sr = SR
    t = np.arange(2 * sr) / sr
    # vibrato + tremolo → nonzero jitter/shimmer
    f_inst = 220.0 * (1 + 0.02 * np.sin(2 * np.pi * 5 * t))
    phase = 2 * np.pi * np.cumsum(f_inst) / sr
    y = ((1 + 0.2 * np.sin(2 * np.pi * 3 * t)) * np.sin(phase)).astype(np.float32)
    j = compute_jitter_extended(y, sr)
    s = compute_shimmer_extended(y, sr)
    assert set(j) == {
        "jitter_local", "jitter_rap", "jitter_ppq5",
        "jitter_mean_absolute_ms", "jitter_std", "jitter_range",
    }
    assert set(s) == {
        "shimmer_local", "shimmer_apq3", "shimmer_apq5",
        "shimmer_dB", "shimmer_std", "shimmer_range",
    }
    assert s["shimmer_local"] > 0.5  # tremolo is visible


def test_extract_all_features_schema():
    sr = SR
    t = np.arange(sr) / sr
    y = (np.sin(2 * np.pi * 220 * t) * (1 + 0.1 * np.sin(2 * np.pi * 2 * t))).astype(np.float32)
    feats = extract_all_features(y, sr)
    expected_keys = {
        "duration", "rms_wave", "rms_spec", "zero_crossing_rate",
        "spectral_centroid", "spectral_bandwidth",
        "spectral_rolloff_1", "spectral_rolloff_85", "spectral_rolloff_99",
        "spectral_contrast", "spectral_flatness", "f0", "jitter", "shimmer",
        "hnr", "breath_count", "intonation_pattern", "voice_breaks", "rhythm_stats",
    }
    assert set(feats) == expected_keys
    for k in ("rms_wave", "rms_spec", "spectral_centroid", "spectral_bandwidth",
              "spectral_contrast", "spectral_flatness", "f0"):
        assert set(feats[k]) == {"min", "mean", "std", "max"}, k
    assert feats["duration"] == pytest.approx(1.0)
    assert feats["f0"]["mean"] == pytest.approx(220.0, rel=0.05)
    assert feats["intonation_pattern"] == {
        "pitch_variability": feats["intonation_pattern"]["pitch_variability"]
    }


def test_pyin_tracks_vibrato():
    """Viterbi smoothing must FOLLOW a slowly-modulated f0, not snap to one
    pitch state: a 220 Hz tone with ±5% vibrato at 5 Hz should produce a
    contour whose extremes bracket the modulation."""
    t = np.arange(2 * SR) / SR
    f_inst = 220.0 * (1.0 + 0.05 * np.sin(2 * np.pi * 5.0 * t))
    phase = 2 * np.pi * np.cumsum(f_inst) / SR
    y = np.sin(phase).astype(np.float32)
    f0, voiced, _ = pyin(y, fmin=note_to_hz("C2"), fmax=note_to_hz("C7"), sr=SR)
    v = f0[voiced]
    assert len(v) > 20
    assert np.nanmedian(v) == pytest.approx(220.0, rel=0.03)
    # the contour must actually swing through the vibrato range
    assert np.nanpercentile(v, 95) > 220.0 * 1.02
    assert np.nanpercentile(v, 5) < 220.0 * 0.98


def test_pyin_octave_robustness():
    """A tone rich in odd harmonics (square-ish) must not be halved/doubled:
    CMNDF + the beta threshold prior should keep the fundamental."""
    t = np.arange(SR) / SR
    f0_true = 196.0  # G3
    y = np.zeros_like(t, dtype=np.float32)
    for k, a in [(1, 1.0), (3, 0.5), (5, 0.25)]:
        y += a * np.sin(2 * np.pi * k * f0_true * t).astype(np.float32)
    f0, voiced, _ = pyin(y, fmin=note_to_hz("C2"), fmax=note_to_hz("C7"), sr=SR)
    est = np.nanmedian(f0[voiced])
    assert abs(est - f0_true) / f0_true < 0.03, est


def _librosa_frame_probs(yin_frame, thresholds, beta_w, no_trough_prob,
                         lam=2.0):
    """Direct per-frame transcription of librosa's _pyin_helper steps 2-5
    (trough detection with boundary rules, Boltzmann(lam) rank prior over
    the below-threshold troughs, unconditional global-min bonus)."""
    is_trough = np.empty(len(yin_frame), bool)
    is_trough[0] = yin_frame[0] < yin_frame[1]
    is_trough[1:-1] = (yin_frame[1:-1] < yin_frame[:-2]) & (
        yin_frame[1:-1] <= yin_frame[2:])
    is_trough[-1] = yin_frame[-1] < yin_frame[-2]
    idx = np.nonzero(is_trough)[0]
    if len(idx) == 0:
        return idx, np.zeros(0)
    h = yin_frame[idx].astype(np.float64)
    tt = np.less.outer(h, thresholds)
    positions = np.cumsum(tt, axis=0) - 1
    n = np.count_nonzero(tt, axis=0)
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        prior = ((1 - np.exp(-lam)) * np.exp(-lam * positions)
                 / (1 - np.exp(-lam * n)))
    prior[~tt] = 0
    probs = prior.dot(beta_w)
    gm = int(np.argmin(h))
    n_below_min = int(np.count_nonzero(~tt[gm]))
    probs[gm] += no_trough_prob * beta_w[:n_below_min].sum()
    return idx, probs


def _pyin_setup():
    from scipy.special import betainc

    thresholds = np.linspace(0, 1, 101)[1:]
    beta_w = np.diff(betainc(2.0, 18.0, np.linspace(0, 1, 101)))
    return thresholds, beta_w


def test_pyin_trough_probabilities_match_librosa_transcription():
    """The vectorized trough-probability stage must equal a per-frame
    librosa transcription (Boltzmann rank prior, raw-height thresholds,
    boundary troughs, unconditional global-min bonus) on a tone with a
    silence gap — the scenario that leaked state across frames in r2."""
    from adx_tpu.features.pyin import (
        _cmndf, _difference_function, _frame, _trough_mask,
        _trough_probabilities,
    )

    sr = 22050
    rng = np.random.default_rng(1)
    t = np.arange(2 * sr) / sr
    y = np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
    gap = 1e-7 * rng.standard_normal(sr).astype(np.float32)
    gap[::4000] = 0.5
    y[sr // 2:3 * sr // 2] = gap

    fmin, fmax = note_to_hz("C2"), note_to_hz("C7")
    frame_length = 2048
    win_length, hop_length = frame_length // 2, frame_length // 4
    yp = np.pad(np.asarray(y, np.float32), frame_length // 2)
    frames = _frame(yp, frame_length, hop_length)
    tau_min = max(1, int(np.floor(sr / fmax)))
    tau_max = min(int(np.ceil(sr / fmin)), frame_length - win_length - 1)
    d = _difference_function(frames, win_length, tau_max + 1, yp, hop_length)
    dp_trim = _cmndf(d)[:, tau_min: tau_max + 1]

    thresholds, beta_w = _pyin_setup()
    mask = _trough_mask(dp_trim)
    fr, pos, probs = _trough_probabilities(dp_trim, mask, thresholds,
                                           beta_w, 0.01)
    for tfr in range(dp_trim.shape[0]):
        idx_ref, probs_ref = _librosa_frame_probs(dp_trim[tfr], thresholds,
                                                  beta_w, 0.01)
        sel = fr == tfr
        np.testing.assert_array_equal(pos[sel], idx_ref)
        np.testing.assert_allclose(probs[sel], probs_ref, atol=1e-12,
                                   err_msg=f"frame {tfr}")


def test_pyin_boltzmann_distributes_threshold_mass():
    """A threshold with several troughs below it must split its beta
    weight by Boltzmann(2) rank — the first trough gets ~86.5% for two
    below-troughs, not 100% (the pre-r3 all-to-first rule)."""
    from adx_tpu.features.pyin import _trough_mask, _trough_probabilities

    thresholds, beta_w = _pyin_setup()
    L = 64
    dp = np.full((1, L), 2.0)

    def put(tau, val):
        dp[0, tau - 1] = dp[0, tau + 1] = val + 1.0
        dp[0, tau] = val

    put(10, 0.02)   # below every threshold >= 0.03
    put(30, 0.05)   # below every threshold >= 0.06
    mask = _trough_mask(dp)
    fr, pos, probs = _trough_probabilities(dp, mask, thresholds, beta_w, 0.01)
    idx_ref, probs_ref = _librosa_frame_probs(dp[0], thresholds, beta_w, 0.01)
    np.testing.assert_array_equal(pos, idx_ref)
    np.testing.assert_allclose(probs, probs_ref, atol=1e-12)
    # both troughs carry mass, ranked: trough 1 > trough 2 > 0
    lam = 2.0
    share0 = (1 - np.exp(-lam)) / (1 - np.exp(-2 * lam))
    two_below = thresholds > 0.05
    w2 = beta_w[two_below].sum()
    assert probs[1] > 0  # the old rule gave the 2nd trough exactly 0
    np.testing.assert_allclose(probs[1], (1 - share0) * w2, atol=1e-12)


def test_chroma_base_c_row0_is_C():
    """librosa filters.chroma defaults to base_c=True: a C4 tone's energy
    lands in row 0 (unrolled, the A440/16 reference would put it in row 3)
    and an A4 tone in row 9."""
    t = np.arange(2 * SR) / SR
    for freq, row in [(261.6256, 0), (440.0, 9)]:
        y = np.sin(2 * np.pi * freq * t).astype(np.float32)
        ch = np.asarray(sp.chroma_stft(jnp.asarray(y), SR))
        mean_per_class = ch.mean(axis=-1)
        assert int(np.argmax(mean_per_class)) == row, (freq, mean_per_class)


def test_zero_crossing_rate_zeroes_frame_boundary_crossing():
    """librosa frames first, then zero_crossings(pad=False): element 0 of
    every frame is forced False, so a sign change across the frame boundary
    must NOT count. Oracle: per-frame numpy transcription."""
    rng = np.random.default_rng(11)
    y = rng.standard_normal(4096).astype(np.float32)
    frame_length, hop = 512, 128
    got = np.asarray(sp.zero_crossing_rate(jnp.asarray(y), frame_length, hop))

    yp = np.pad(y, (frame_length // 2, frame_length // 2), mode="edge")
    n_frames = 1 + (len(yp) - frame_length) // hop
    want = np.empty(n_frames)
    for k in range(n_frames):
        fr = yp[k * hop: k * hop + frame_length]
        fr = np.where(np.abs(fr) <= 1e-10, 0.0, fr)
        s = fr >= 0
        cross = np.concatenate(([False], s[1:] != s[:-1]))
        want[k] = cross.mean()
    assert got.shape[-1] >= n_frames
    np.testing.assert_allclose(got[..., :n_frames], want, atol=1e-7)
    # and the bias is real: at least one frame starts on a sign change
    yg = np.pad(y, (frame_length // 2, frame_length // 2), mode="edge")
    sg = np.where(np.abs(yg) <= 1e-10, 0.0, yg) >= 0
    starts = [k * hop for k in range(1, n_frames)]
    assert any(sg[s] != sg[s - 1] for s in starts)


def test_spectral_contrast_linear_is_difference_not_ratio():
    """librosa linear=True returns peaks - valleys: scaling S by c scales
    the output by c (a ratio would be scale-invariant)."""
    rng = np.random.default_rng(5)
    y = rng.standard_normal(SR).astype(np.float32)
    S = jnp.abs(stft(jnp.asarray(y), n_fft=2048, hop_length=512))
    a = np.asarray(sp.spectral_contrast(S, SR, 2048, linear=True))
    b = np.asarray(sp.spectral_contrast(2.0 * S, SR, 2048, linear=True))
    np.testing.assert_allclose(b, 2.0 * a, rtol=1e-5)
    assert np.all(a >= -1e-6)  # peak >= valley


def test_tempo_estimate_single_frame_envelope():
    """A sub-hop clip produces a length-1 onset envelope; the estimator
    must return the prior's center, not crash on an empty lag axis."""
    from adx_tpu.features.rhythm import beat_track, tempo_estimate

    assert tempo_estimate(np.array([0.3]), sr=SR, hop_length=512) == pytest.approx(120.0)
    bpm, beats = beat_track(np.array([0.3]), sr=SR, hop_length=512)
    assert np.isfinite(bpm) and beats.ndim == 1


def test_intonation_pattern_uses_caller_sr():
    """The f0=None fallback must run pyin at the CALLER's sr (the sibling
    jitter fallback already did): a 44.1 kHz vibrato interpreted at the
    22050 default halves the detected f0 and its variability."""
    from adx_tpu.features.extraction import compute_intonation_pattern
    from adx_tpu.features.pyin import note_to_hz, pyin

    sr = 44100
    t = np.arange(2 * sr) / sr
    f_inst = 440.0 + 40.0 * np.sin(2 * np.pi * 3.0 * t)
    phase = 2 * np.pi * np.cumsum(f_inst) / sr
    y = np.sin(phase).astype(np.float32)

    got = compute_intonation_pattern(y, sr)["pitch_variability"]
    f0, _, _ = pyin(y, fmin=note_to_hz("C2"), fmax=note_to_hz("C7"), sr=sr)
    want = float(np.std(np.nan_to_num(f0, nan=0.0)))
    assert got == pytest.approx(want, rel=1e-6)
    assert got > 15.0  # the half-rate misread gave ~half this
