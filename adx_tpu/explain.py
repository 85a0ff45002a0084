"""One-call full explanation — the north-star workload as a user-facing API.

``explain_track`` runs all three explainers (FBP + occlusion + AudioLIME)
on one audio file with a shared predictor/engine and returns one combined
record; optionally writes the saliency figures and a summary JSON. This is
the composition the reference only offers as three separate experiment
sweeps (BASELINE.json: "full occlusion + FBP + LIME explanation of a 120 s
track").
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import numpy as np

from adx_tpu.explainers.audiolime import LimeAudioExplainer, SpleeterFactorization
from adx_tpu.explainers.fbp import FREQUENCY_BAND_PRESETS
from adx_tpu.io.audio_io import load_audio
from adx_tpu.io.results import convert_to_native, safe_stem
from adx_tpu.ops.masks import band_gain_matrix, occlusion_patch_grid
from adx_tpu.ops.mel import fft_frequencies
from adx_tpu.runtime.engine import PerturbationEngine, cached_engine as _cached_engine
import functools


@functools.lru_cache(maxsize=16)
def _cached_gains(sr: int, n_fft: int, band_preset: str, attenuation: float):
    """FBP band gain matrix, cached — it only depends on the DSP config,
    and rebuilding it cost ~0.15 s of each one-call explain."""
    freqs = fft_frequencies(sr, n_fft)
    return np.asarray(
        band_gain_matrix(
            freqs, FREQUENCY_BAND_PRESETS[band_preset], attenuation=attenuation,
            transition_mode="rel", transition_rel=0.2,
            transition_min_hz=5.0, transition_max_hz=500.0,
        )
    )


def explain_track(
    audio_path,
    predictor=None,
    sr: int = 44100,
    duration: float = 120.0,
    n_fft: int = 2048,
    hop_length: int = 512,
    win_length: int = 2048,
    band_preset: str = "default",
    attenuation: float = 0.25,
    patch_time_frames: int = 1024,
    stride_time_frames: int = 1024,
    patch_freq_percent: float = 20.0,
    stride_freq_percent: float = 10.0,
    num_samples_lime: int = 500,
    separation_model: str = "spleeter:4stems",
    out_dir: Optional[Path] = None,
    engine: Optional[PerturbationEngine] = None,
    save_figures: bool = True,
) -> dict:
    """Full FBP + occlusion + LIME explanation of one track."""
    if predictor is None:
        from adx_tpu.predict import LocalSonics

        predictor = LocalSonics.from_pretrained("spectttra-alpha-120s")
    engine = engine or _cached_engine(
        predictor, sr=sr, duration=duration, n_fft=n_fft,
        hop_length=hop_length, win_length=win_length, spec_type="stft",
    )

    t_start = time.time()
    y_host, _ = load_audio(audio_path, sr=sr, duration=duration, mono=True)
    # one-time H2D: a 120 s track is 21 MB and the TPU tunnel moves
    # ~15 MB/s, so every stage that re-uploaded the waveform (or pulled
    # the 85 MB of stems back) was paying seconds of pure transfer.
    # PCM16-exact tracks ship as int16 (half the bytes). Everything below
    # works on the device-resident copy.
    import jax.numpy as jnp

    y = engine.to_device_wave(y_host)
    stage_s: dict = {}
    t_stage = time.time()
    S, S_db, baseline = engine.analyze_and_baseline(y)
    stage_s["analyze_baseline"] = round(time.time() - t_stage, 3)
    record: dict = {
        "file_path": str(audio_path),
        "track_stem": safe_stem(audio_path),
        "baseline_pred": baseline,
        "predicted_class": "Fake" if baseline > 0.5 else "Real",
    }

    # ---- FBP ----------------------------------------------------------
    bands = FREQUENCY_BAND_PRESETS[band_preset]
    gains = _cached_gains(sr, n_fft, band_preset, attenuation)
    t_stage = time.time()
    probs = engine.fbp_probs(S, y, gains, normalize_loudness=False)
    stage_s["fbp"] = round(time.time() - t_stage, 3)
    record["fbp"] = {
        "bands": [
            {"low": float(lo), "high": float(hi), "importance": float(baseline - p)}
            for (lo, hi), p in zip(bands, probs)
        ]
    }

    # ---- Occlusion ------------------------------------------------------
    n_freq, n_time = S_db.shape
    starts, patch_f, patch_t = occlusion_patch_grid(
        n_freq, n_time, patch_time_frames, stride_time_frames,
        patch_freq_percent, stride_freq_percent,
    )
    t_stage = time.time()
    occ_probs = engine.occlusion_probs(S, starts, patch_f, patch_t, 0.0, len(y))
    stage_s["occlusion"] = round(time.time() - t_stage, 3)
    importances = baseline - occ_probs
    # float32 maps: importances are ~1e-2 scalars accumulated ≤ a few
    # times per cell, and the f64 [F, T] slice-adds cost ~0.5 s of the
    # ~2 s one-call explain on a single-core host
    importance_map = np.zeros((n_freq, n_time), np.float32)
    count_map = np.zeros((n_freq, n_time), np.float32)
    patches = []
    for (t0, f0), imp in zip(starts, importances):
        importance_map[f0 : f0 + patch_f, t0 : t0 + patch_t] += imp
        count_map[f0 : f0 + patch_f, t0 : t0 + patch_t] += 1
        patches.append(
            {"t_start": int(t0), "f_start": int(f0), "importance": float(imp)}
        )
    importance_map /= count_map + 1e-8
    top = sorted(patches, key=lambda p: abs(p["importance"]), reverse=True)[:5]
    record["occlusion"] = {
        "n_patches": len(starts),
        "mean_importance": float(importance_map.mean()),
        "max_importance": float(importance_map.max()),
        "min_importance": float(importance_map.min()),
        "top_patches": top,
    }

    # ---- AudioLIME ------------------------------------------------------
    t_stage = time.time()
    factorization = SpleeterFactorization(
        y, target_sr=sr, temporal_segmentation_params=1, model_name=separation_model
    )
    # stems are device-resident and LAZY — force their computation with one
    # scalar D2H before stopping the timer, otherwise the separation cost
    # is misattributed to the LIME stage (block_until_ready alone does not
    # truly sync on tunneled TPU runtimes)
    float(jnp.stack([c.sum() for c in factorization.components]).sum())
    stage_s["separation"] = round(time.time() - t_stage, 3)
    t_stage = time.time()
    explanation = LimeAudioExplainer(kernel_width=0.25).explain_instance(
        factorization, num_samples=num_samples_lime, top_labels=1, engine=engine
    )
    stage_s["lime"] = round(time.time() - t_stage, 3)
    weights = explanation.local_exp[explanation.top_labels[0]]
    record["lime"] = {
        "component_influences": {
            comp: w for comp, (_i, w) in zip(factorization._components_names, weights)
        },
        "num_samples": num_samples_lime,
    }

    record["explain_seconds"] = time.time() - t_start
    record["stage_seconds"] = stage_s

    if out_dir is not None:
        import json

        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        stem = record["track_stem"]
        with open(out_dir / f"{stem}_explanation.json", "w", encoding="utf-8") as f:
            json.dump(convert_to_native(record), f, indent=4, ensure_ascii=False)
        if save_figures:
            from adx_tpu.viz.lime_viz import plot_bar_influences_per_sample
            from adx_tpu.viz.saliency import visualize_spectrogram_saliency

            visualize_spectrogram_saliency(
                importance_map, np.asarray(S_db),
                str(out_dir / f"{stem}_occlusion_saliency.png"),
                title=f"{stem} | Occlusion | Pred: {baseline:.3f}",
                sr=sr, hop_length=hop_length, spec_type="stft",
            )
            plot_bar_influences_per_sample(
                record["lime"]["component_influences"], out_dir, prefix=stem,
                predicted_class=record["predicted_class"], model_pred=baseline,
            )
    return record
