"""Feature extraction — capability-equivalent to the reference's
``extract_all_features`` (src/feature_extraction.py:5-96): identical dict
schema (keys, nesting, stat suffixes), with the STFT-derived statistics
computed in one batched device program and pyin / HPSS / beat-tracking on
host.

Reference quirks preserved on purpose (feature values stay comparable):

* pyin runs with librosa's default ``sr=22050`` regardless of the true rate
  (the reference never passes sr — src/feature_extraction.py:11-13);
* spectral statistics use each feature's librosa default frame parameters.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from adx_tpu.features import rhythm as rhythm_mod
from adx_tpu.features import spectral as sp
from adx_tpu.features.pyin import note_to_hz, pyin
from adx_tpu.ops.stft import istft, stft


def _spectral_stats_core(y: jnp.ndarray, sr: int):
    """All STFT-derived statistics for one 1-D signal (shared by the
    per-signal jit and the vmapped batch program)."""
    S = jnp.abs(stft(y, n_fft=2048, hop_length=512))
    out = {
        "rms_wave": sp.rms_from_audio(y),
        "rms_spec": sp.rms_from_spectrogram(S),
        "zcr": sp.zero_crossing_rate(y),
        "centroid": sp.spectral_centroid(S, sr, 2048),
        "bandwidth": sp.spectral_bandwidth(S, sr, 2048),
        "rolloff_1": sp.spectral_rolloff(S, sr, 2048, 0.01),
        "rolloff_85": sp.spectral_rolloff(S, sr, 2048, 0.85),
        "rolloff_99": sp.spectral_rolloff(S, sr, 2048, 0.99),
        "contrast": sp.spectral_contrast(S, sr, 2048),
        "flatness": sp.spectral_flatness(S),
        "onset_env": sp.onset_strength(y, sr),
    }
    return out


@functools.partial(jax.jit, static_argnames=("sr",))
def _spectral_stats_device(y: jnp.ndarray, sr: int):
    """All STFT-derived statistics in one compiled program."""
    return _spectral_stats_core(y, sr)


@functools.partial(jax.jit, static_argnames=("sr",))
def _spectral_stats_device_batch(y: jnp.ndarray, sr: int):
    """[B, n] batch of _spectral_stats_core in one program."""
    return jax.vmap(lambda yy: _spectral_stats_core(yy, sr))(y)


@functools.partial(jax.jit, static_argnames=("n_out",))
def _hnr_device_batch(y: jnp.ndarray, n_out: int):
    """HNR for a [B, n] batch, reduced to [B] scalars ON DEVICE.

    Same HPSS-mask → masked ISTFT math as compute_hnr's device branch, but
    the 4·n-byte harmonic waveform never leaves the chip — the serial path's
    D2H of it (~21 MB per 120 s stem over the ~15 MB/s tunnel) was most of
    that feature's cost. The energy sums run in f32 on device instead of the
    serial path's f64 host sums: measured |ΔHNR| ≲ 1e-4 dB.

    ``lax.map`` (sequential, one traced body), NOT vmap: the HPSS rolling
    median sorts a [31, F, T] window tensor per signal (~2.6 GB transient
    for 120 s at 44.1 kHz) — vmapping 8 signals asked for ~21 GB and OOM'd
    the v5e. The serialized map keeps the known-good single-signal footprint
    (0.16 s/track on hardware) while the call still amortizes ONE dispatch
    and the shared H2D."""
    def one(yy):
        S = stft(yy, n_fft=2048, hop_length=512)
        mask_h, _ = sp.hpss(jnp.abs(S))
        h = istft(S * mask_h, hop_length=512, n_fft=2048, length=n_out)
        noise = yy[:n_out] - h
        return 10.0 * jnp.log10(
            jnp.sum(h * h) / (jnp.sum(noise * noise) + 1e-8)
        )

    from jax import lax

    return lax.map(one, y)


@jax.jit
def _dequant16_batch(q: jnp.ndarray) -> jnp.ndarray:
    return q.astype(jnp.float32) / 32768.0


def _to_device_batch(waves: np.ndarray) -> jnp.ndarray:
    """One H2D for a [B, n] float batch, as int16 when every sample is
    exactly 16-bit-PCM-representable (everything decoded from PCM16 WAVs
    is) — half the tunnel bytes, identical float32 values after the device
    dequant. Wire rule owned by ``io/audio_io.py::pcm16_wire``."""
    from adx_tpu.io.audio_io import pcm16_wire

    q = pcm16_wire(waves)
    if q is not None:
        return _dequant16_batch(jnp.asarray(q))
    return jnp.asarray(waves)


@functools.partial(jax.jit, static_argnames=("n_out",))
def _harmonic_device(y: jnp.ndarray, n_out: int):
    """librosa.effects.harmonic equivalent: HPSS mask → ISTFT."""
    S = stft(y, n_fft=2048, hop_length=512)
    mask_h, _ = sp.hpss(jnp.abs(S))
    return istft(S * mask_h, hop_length=512, n_fft=2048, length=n_out)


@jax.jit
def _stft_device(y: jnp.ndarray):
    return stft(y, n_fft=2048, hop_length=512)


@functools.partial(jax.jit, static_argnames=("n_out",))
def _masked_istft_from_S(S: jnp.ndarray, mask: jnp.ndarray, n_out: int):
    # takes the already-computed S: the CPU HNR branch used to STFT the
    # full track twice (once for the masks, again inside the inversion)
    return istft(S * mask, hop_length=512, n_fft=2048, length=n_out)


def _stat4(x: np.ndarray) -> Dict[str, float]:
    return {
        "min": float(np.min(x)),
        "mean": float(np.mean(x)),
        "std": float(np.std(x)),
        "max": float(np.max(x)),
    }


def _assemble_features(audio: np.ndarray, sr, f0: np.ndarray, dev: Dict[str, np.ndarray],
                       hnr: float) -> dict:
    """Build the reference-schema feature dict from the per-signal pieces
    (shared by the serial path and extract_all_features_batch; key order and
    value semantics are the serial path's)."""
    features: Dict[str, object] = {}
    features["duration"] = len(audio) / sr

    # _stat4 everywhere (it float()s the values — np.float32 leftovers made
    # a direct json.dumps of the public dict raise; the in-repo writers go
    # through convert_to_native, but the public API shouldn't require it)
    features["rms_wave"] = _stat4(dev["rms_wave"])
    features["rms_spec"] = _stat4(dev["rms_spec"])
    features["zero_crossing_rate"] = float(np.mean(dev["zcr"]))
    features["spectral_centroid"] = _stat4(dev["centroid"])
    features["spectral_bandwidth"] = _stat4(dev["bandwidth"])
    features["spectral_rolloff_1"] = _stat4(dev["rolloff_1"])
    features["spectral_rolloff_85"] = _stat4(dev["rolloff_85"])
    features["spectral_rolloff_99"] = _stat4(dev["rolloff_99"])
    features["spectral_contrast"] = _stat4(dev["contrast"])
    features["spectral_flatness"] = _stat4(dev["flatness"])

    with np.errstate(all="ignore"):
        features["f0"] = {
            "min": np.nanmin(f0) if np.any(~np.isnan(f0)) else np.nan,
            "mean": np.nanmean(f0) if np.any(~np.isnan(f0)) else np.nan,
            "std": np.nanstd(f0) if np.any(~np.isnan(f0)) else np.nan,
            "max": np.nanmax(f0) if np.any(~np.isnan(f0)) else np.nan,
        }

    features["jitter"] = compute_jitter_extended(audio, sr, f0=f0)
    features["shimmer"] = compute_shimmer_extended(audio, sr)
    features["hnr"] = hnr
    features["breath_count"] = detect_breaths(audio, sr)
    features["intonation_pattern"] = compute_intonation_pattern(audio, sr, f0=f0)
    features["voice_breaks"] = detect_voice_breaks(audio, sr)
    features["rhythm_stats"] = compute_rhythm_stats(audio, sr, onset_env=dev["onset_env"])
    return features


def extract_all_features(audio, sr, reference_audio=None) -> dict:
    """Per-waveform feature dict (reference schema)."""
    audio = np.asarray(audio, dtype=np.float32)

    # pyin with librosa's default sr (reference quirk, see module docstring)
    f0, voiced_flag, voiced_probs = pyin(
        audio, fmin=note_to_hz("C2"), fmax=note_to_hz("C7")
    )

    dev = _spectral_stats_device(jnp.asarray(audio), int(sr))
    dev = {k: np.asarray(v) for k, v in dev.items()}
    return _assemble_features(audio, sr, f0, dev, compute_hnr(audio, sr))


def extract_all_features_batch(waves, sr, use_device_pyin: bool = True) -> list:
    """Feature dicts for a batch of EQUAL-LENGTH waveforms (the stems of one
    track, the band WAVs of one file) with one H2D and three shared device
    programs instead of per-signal dispatches.

    vs. the serial loop (measured on the v5e via the axon tunnel, 120 s
    44.1 kHz stems): the waveform batch ships ONCE (int16 wire format when
    PCM16-exact — everything loaded from the experiment WAV trees is), HNR
    reduces to a scalar on device instead of pulling the 21 MB harmonic per
    stem, and pyin runs as the device-batched program
    (``features/pyin_device.py``, 0.44 s/stem device-resident vs
    3.4–12.5 s/stem host).

    Numerics vs ``extract_all_features``: spectral stats are the same
    program vmapped; HNR sums reduce in f32 on device (≲1e-4 dB); device
    pyin decodes ≥99.6% of frames to the bit-identical f0 (f32 threshold
    razor edges — see pyin_device docstring). ``use_device_pyin=False``
    keeps the host-exact pyin while retaining the transfer/HNR wins.

    On the CPU backend this still works (tests use it) but brings no
    speedup; long tracks pay the known slow CPU hpss sort.
    """
    waves = np.stack([np.asarray(w, np.float32) for w in waves])
    if waves.ndim != 2:
        raise ValueError(f"extract_all_features_batch expects [B, n], got {waves.shape}")
    B, n = waves.shape
    dev_batch = _to_device_batch(waves)
    # pad the batch axis to the next power of two ON DEVICE (no extra tunnel
    # bytes): every program here compiles per (B, n), and sweeps present
    # ragged group sizes (4 stems, 12 bands, a 3-file tail) — pow2 bucketing
    # caps the compile count at log2(max batch) per length. Zero rows are
    # row-independent through the vmapped programs and sliced off below.
    B_pad = 1 << (B - 1).bit_length()
    if B_pad != B:
        dev_batch = jnp.pad(dev_batch, ((0, B_pad - B), (0, 0)))

    devs = _spectral_stats_device_batch(dev_batch, int(sr))
    hnrs = np.asarray(_hnr_device_batch(dev_batch, n))
    if use_device_pyin:
        from adx_tpu.features.pyin_device import pyin_batch

        f0s, _, _ = pyin_batch(dev_batch, note_to_hz("C2"), note_to_hz("C7"))
    else:
        f0s = np.stack([
            pyin(w, fmin=note_to_hz("C2"), fmax=note_to_hz("C7"))[0]
            for w in waves
        ])
    devs = {k: np.asarray(v) for k, v in devs.items()}
    return [
        _assemble_features(
            waves[i], sr, f0s[i], {k: v[i] for k, v in devs.items()},
            float(hnrs[i]),
        )
        for i in range(B)
    ]


def extract_features_for_paths(
    paths,
    sr,
    batch_size: int = 16,
    use_device_pyin: bool = True,
    device_batch: bool = True,
) -> list:
    """Load + extract features for a list of WAV paths, folding equal-length
    signals into device batches (``extract_all_features_batch``). Returns
    feature dicts in input order; a path that fails to load yields ``None``
    with a warning (per-file error containment like the sweep drivers).

    ``device_batch=False`` restores the serial host-exact path per file."""
    from adx_tpu.io.audio_io import load_audio

    out = [None] * len(paths)
    waves = {}
    for i, p in enumerate(paths):
        try:
            y, _ = load_audio(p, sr=sr, mono=True)
            waves[i] = np.asarray(y, np.float32)
        except Exception as e:  # noqa: BLE001 — per-file containment
            print(f"[WARN] Failed to load {p}: {type(e).__name__}: {e}")
    if not device_batch:
        for i, w in waves.items():
            try:
                out[i] = extract_all_features(w, sr)
            except Exception as e:  # noqa: BLE001 — same per-file
                # containment as the batched path: one transient device
                # error must not abort a whole --serial-features stage
                print(f"[WARN] Failed to extract {paths[i]}: "
                      f"{type(e).__name__}: {e}")
        return out
    from adx_tpu.batching import equal_length_chunks

    for sel in equal_length_chunks(waves, batch_size):
        try:
            feats = extract_all_features_batch(
                [waves[i] for i in sel], sr, use_device_pyin=use_device_pyin
            )
        except Exception as e:  # noqa: BLE001 — one bad batch (transient
            # tunnel error, device OOM) must not abort the whole feature
            # stage: retry this batch's files serially, each in its own
            # containment like the sweep drivers
            print(f"[WARN] Batched extraction failed for a {len(sel)}-file "
                  f"batch ({type(e).__name__}: {e}); retrying serially")
            feats = []
            for i in sel:
                try:
                    feats.append(extract_all_features(waves[i], sr))
                except Exception as ee:  # noqa: BLE001
                    print(f"[WARN] Failed to extract {paths[i]}: "
                          f"{type(ee).__name__}: {ee}")
                    feats.append(None)
        for i, f in zip(sel, feats):
            out[i] = f
    return out


def compute_jitter(y, sr, f0=None):
    if f0 is None:
        f0 = pyin(y, fmin=80, fmax=1500, sr=sr)[0]
    f0 = f0[~np.isnan(f0)]
    if len(f0) < 2:
        return np.nan
    return float(np.mean(np.abs(np.diff(f0))) / np.mean(f0)) * 100


def compute_jitter_extended(y, sr, f0=None) -> dict:
    """Jitter family from pyin periods (reference: src/feature_extraction.py:108-165)."""
    if f0 is None:
        f0, _, _ = pyin(y, fmin=note_to_hz("C2"), fmax=note_to_hz("C7"), sr=sr)
    f0_valid = f0[~np.isnan(f0)]
    if len(f0_valid) < 2:
        return {
            "jitter_local": np.nan,
            "jitter_rap": np.nan,
            "jitter_ppq5": np.nan,
            "jitter_mean_absolute": np.nan,
            "jitter_std": np.nan,
            "jitter_range": np.nan,
        }
    periods = 1.0 / (f0_valid + 1e-8)
    dper = np.abs(np.diff(periods))
    mean_period = np.mean(periods)

    jitter_local_abs = np.mean(dper)
    jitter_local_pct = (jitter_local_abs / mean_period) * 100

    if len(periods) >= 3:
        neigh3 = (periods[:-2] + periods[1:-1] + periods[2:]) / 3.0
        jitter_rap_pct = (np.mean(np.abs(periods[1:-1] - neigh3)) / mean_period) * 100
    else:
        jitter_rap_pct = np.nan

    if len(periods) >= 5:
        neigh5 = (
            periods[:-4] + periods[1:-3] + periods[2:-2] + periods[3:-1] + periods[4:]
        ) / 5.0
        jitter_ppq5_pct = (np.mean(np.abs(periods[2:-2] - neigh5)) / mean_period) * 100
    else:
        jitter_ppq5_pct = np.nan

    return {
        "jitter_local": float(jitter_local_pct),
        "jitter_rap": float(jitter_rap_pct),
        "jitter_ppq5": float(jitter_ppq5_pct),
        "jitter_mean_absolute_ms": float(jitter_local_abs * 1000),
        "jitter_std": float(np.std(dper) / mean_period * 100),
        "jitter_range": float((np.max(dper) - np.min(dper)) / mean_period * 100),
    }


def _rms_envelope_np(y, frame_length, hop_length):
    n = len(y)
    # librosa.feature.rms semantics for ALL lengths: center-pad then frame
    # (1 + n//hop frames) — the old end-padded single frame for n <
    # frame_length collapsed sub-30 ms clips to one value and made shimmer
    # all-NaN where the reference returns real numbers
    yp = np.pad(y, frame_length // 2)
    if len(yp) < frame_length:
        yp = np.pad(yp, (0, frame_length - len(yp)))
    # windowed mean of squares as a cumsum difference — O(n) instead of a
    # [n_frames, frame_length] gather
    csum = np.concatenate([[0.0], np.cumsum(yp.astype(np.float64) ** 2)])
    n_frames = 1 + (len(yp) - frame_length) // hop_length
    starts = hop_length * np.arange(n_frames)
    sums = csum[starts + frame_length] - csum[starts]
    return np.sqrt(np.maximum(sums, 0.0) / frame_length)


def detect_breaths(y, sr, min_pause=0.2, energy_thresh=0.05) -> int:
    """RMS-threshold pause counting (reference: src/feature_extraction.py:168-182)."""
    frame_length, hop_length = 2048, 512
    rms = _rms_envelope_np(y, frame_length, hop_length)
    times = np.arange(len(rms)) * hop_length / sr
    breath_indices = np.where(rms < energy_thresh)[0]
    if len(breath_indices) == 0:
        return 0
    pauses = []
    curr_start = times[breath_indices[0]]
    for i in range(1, len(breath_indices)):
        if times[breath_indices[i]] - times[breath_indices[i - 1]] > min_pause:
            pauses.append((curr_start, times[breath_indices[i - 1]]))
            curr_start = times[breath_indices[i]]
    pauses.append((curr_start, times[breath_indices[-1]]))
    return len(pauses)


def compute_hnr(y, sr) -> float:
    """Harmonics-to-noise ratio via HPSS (reference: src/feature_extraction.py:184-188).

    The HPSS median runs on the accelerator (0.16 s for a 120 s track on
    v5e) — except on the CPU backend, where XLA's lane sort makes it
    pathological (measured 87 s); there the masks come from scipy's
    median_filter instead (same 31-wide median; reflect instead of wrap
    edges, which only touches the outer 15 of ~10k frames)."""
    y32 = jnp.asarray(y, jnp.float32)
    if jax.default_backend() == "cpu":
        from scipy.ndimage import median_filter

        S = _stft_device(y32)  # ONCE; stays a device array (cpu backend)
        mag = np.asarray(jnp.abs(S))
        H = median_filter(mag, size=(1, 31), mode="reflect").astype(np.float64)
        P = median_filter(mag, size=(31, 1), mode="reflect").astype(np.float64)
        total = H * H + P * P
        mask_h = np.where(total > 0, (H * H) / np.where(total > 0, total, 1.0), 0.5)
        harmonic = np.asarray(
            _masked_istft_from_S(S, jnp.asarray(mask_h, jnp.float32), len(y))
        )
    else:
        harmonic = np.asarray(_harmonic_device(y32, len(y)))
    noise = np.asarray(y) - harmonic
    return float(10 * np.log10(np.sum(harmonic**2) / (np.sum(noise**2) + 1e-8)))


def compute_shimmer(y, sr):
    frame_length = int(0.03 * sr)
    hop_length = int(0.015 * sr)
    env = _rms_envelope_np(y, frame_length, hop_length)
    if len(env) < 2:
        return np.nan
    return float(np.mean(np.abs(np.diff(env))) / np.mean(env)) * 100


def compute_shimmer_extended(y, sr) -> dict:
    """Shimmer family from the 30 ms RMS envelope
    (reference: src/feature_extraction.py:214-272)."""
    frame_length = int(0.03 * sr)
    hop_length = int(0.015 * sr)
    env = _rms_envelope_np(y, frame_length, hop_length)
    if len(env) < 2:
        return {
            "shimmer_local": np.nan,
            "shimmer_apq3": np.nan,
            "shimmer_apq5": np.nan,
            "shimmer_dB": np.nan,
            "shimmer_std": np.nan,
            "shimmer_range": np.nan,
        }
    denv = np.abs(np.diff(env))
    mean_env = np.mean(env)
    shimmer_local_pct = (np.mean(denv) / mean_env) * 100

    if len(env) >= 3:
        neigh3 = (env[:-2] + env[1:-1] + env[2:]) / 3.0
        shimmer_apq3_pct = (np.mean(np.abs(env[1:-1] - neigh3)) / mean_env) * 100
    else:
        shimmer_apq3_pct = np.nan
    if len(env) >= 5:
        neigh5 = (env[:-4] + env[1:-3] + env[2:-2] + env[3:-1] + env[4:]) / 5.0
        shimmer_apq5_pct = (np.mean(np.abs(env[2:-2] - neigh5)) / mean_env) * 100
    else:
        shimmer_apq5_pct = np.nan

    amplitude_db = 20 * np.log10(env + 1e-8)
    return {
        "shimmer_local": float(shimmer_local_pct),
        "shimmer_apq3": float(shimmer_apq3_pct),
        "shimmer_apq5": float(shimmer_apq5_pct),
        "shimmer_dB": float(np.mean(np.abs(np.diff(amplitude_db)))),
        "shimmer_std": float(np.std(denv) / mean_env * 100),
        "shimmer_range": float((np.max(denv) - np.min(denv)) / mean_env * 100),
    }


def compute_intonation_pattern(y, sr, f0=None) -> dict:
    if f0 is None:
        f0, _, _ = pyin(y, fmin=note_to_hz("C2"), fmax=note_to_hz("C7"), sr=sr)
    f0 = np.nan_to_num(f0, nan=0.0)
    return {"pitch_variability": float(np.std(f0))}


def detect_voice_breaks(y, sr, threshold=0.1, min_duration_ms=50) -> int:
    """Sub-threshold run counting (reference: src/feature_extraction.py:282-302)."""
    frame_length = int(0.02 * sr)
    hop_length = int(0.01 * sr)
    energy = _rms_envelope_np(y, frame_length, hop_length)
    breaks = energy < threshold
    counts = 0
    min_frames = int(min_duration_ms / (hop_length / sr * 1000))
    count = 0
    for b in breaks:
        if b:
            count += 1
        else:
            if count >= min_frames:
                counts += 1
            count = 0
    if count >= min_frames:
        counts += 1
    return counts


def compute_rms_envelope(audio, sr=44100, frame_length=2048, hop_length=512):
    rms = _rms_envelope_np(np.asarray(audio, np.float32), frame_length, hop_length)
    times = np.arange(len(rms)) * hop_length / sr
    return times, rms


def compute_rhythm_stats(
    audio, sr=44100, onset_env: Optional[np.ndarray] = None,
    include_beats_times: bool = False,
) -> dict:
    """Tempo/onset stats (feature-JSON schema). ``include_beats_times=True``
    appends the beat positions in seconds for plotting callers
    (viz/feature_plots.py) without changing the default schema."""
    if onset_env is None:
        onset_env = np.asarray(sp.onset_strength(jnp.asarray(audio, jnp.float32), sr))
    tempo, beats = rhythm_mod.beat_track(onset_env, sr=sr, hop_length=512)
    stats = {
        "tempo_bpm": float(tempo),
        "avg_onset_strength": float(np.mean(onset_env)),
        "max_onset_strength": float(np.max(onset_env)),
    }
    if include_beats_times:
        stats["beats_times"] = (np.asarray(beats) * 512 / sr).tolist()
    return stats
