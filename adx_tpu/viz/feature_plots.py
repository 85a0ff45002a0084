"""Generic audio feature plots — output-compatible with the reference's
``src/feature_visualizations.py`` (waveform, RMS envelope, rhythm+beats,
chroma/MFCC/contrast panels, spectral summary, component grids, f0 overlays),
with the spectral inputs computed by the framework's own kernels."""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

import jax.numpy as jnp

from adx_tpu.features import spectral as sp
from adx_tpu.features.extraction import compute_rhythm_stats, compute_rms_envelope
from adx_tpu.ops.db import amplitude_to_db
from adx_tpu.ops.mel import hz_to_mel, melspectrogram
from adx_tpu.ops.stft import stft
from adx_tpu.viz.display import envelope_decimate, specshow


def plot_waveform(audio, sr=44100, title="Waveform", output_path=None):
    plt.figure(figsize=(10, 4))
    times = np.arange(len(audio)) / sr
    plt.plot(*envelope_decimate(times, audio), linewidth=0.5)
    plt.title(title)
    plt.xlabel("Time [s]")
    plt.ylabel("Amplitude")
    plt.tight_layout()
    if output_path:
        plt.savefig(output_path)
    plt.close()


def plot_rms_envelope(audio, sr=44100, output_path=None, title="RMS Envelope"):
    times, rms = compute_rms_envelope(audio, sr)
    plt.figure(figsize=(10, 4))
    plt.plot(times, rms, label="RMS Envelope")
    plt.xlabel("Time [s]")
    plt.ylabel("RMS")
    plt.title(title)
    plt.grid(True)
    plt.tight_layout()
    if output_path:
        plt.savefig(output_path)
    plt.close()


def plot_rhythm_statistics(audio, sr=44100, output_dir=None, prefix=""):
    """RMS envelope with beat markers; returns the rhythm stats dict."""
    if output_dir:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
    # one owner for rhythm stats: the feature pipeline's compute_rhythm_stats
    stats = compute_rhythm_stats(audio, sr, include_beats_times=True)
    beats_times = np.asarray(stats["beats_times"])

    times, rms = compute_rms_envelope(audio, sr)
    plt.figure(figsize=(10, 4))
    plt.plot(times, rms, label="RMS Envelope")
    if len(beats_times):
        plt.vlines(beats_times, ymin=0, ymax=np.max(rms), color="r", alpha=0.75, label="Beats")
    plt.xlabel("Time (s)")
    plt.ylabel("Amplitude / RMS")
    plt.title(f"Rhythm and Beats ({prefix})")
    plt.legend()
    plt.tight_layout()
    if output_dir:
        plt.savefig(output_dir / f"{prefix}_rhythm_beats.png")
    plt.close()
    return stats


def plot_enhanced_visualizations(audio, sr=44100, prefix="", output_dir=None):
    """Waveform + chroma + MFCC + spectral-contrast panel set."""
    if output_dir:
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
    yj = jnp.asarray(audio, jnp.float32)

    plot_waveform(audio, sr=sr, title=f"Waveform ({prefix})",
                  output_path=output_dir / f"{prefix}_waveform.png" if output_dir else None)

    chroma = np.asarray(sp.chroma_stft(yj, sr))
    plt.figure(figsize=(10, 4))
    img = plt.imshow(chroma, aspect="auto", origin="lower", cmap="magma",
                     extent=[0, chroma.shape[1] * 512 / sr, 0, 12])
    plt.yticks(np.arange(12) + 0.5, ["C", "C#", "D", "D#", "E", "F", "F#", "G", "G#", "A", "A#", "B"])
    plt.colorbar(img)
    plt.title(f"Chroma Features ({prefix})")
    plt.tight_layout()
    if output_dir:
        plt.savefig(output_dir / f"{prefix}_chroma.png")
    plt.close()

    mfccs = np.asarray(sp.mfcc(yj, sr, n_mfcc=13))
    plt.figure(figsize=(10, 4))
    img = plt.imshow(mfccs, aspect="auto", origin="lower",
                     extent=[0, mfccs.shape[1] * 512 / sr, 0, 13])
    plt.colorbar(img)
    plt.title(f"MFCC ({prefix})")
    plt.tight_layout()
    if output_dir:
        plt.savefig(output_dir / f"{prefix}_mfcc.png")
    plt.close()

    S = jnp.abs(stft(yj, n_fft=2048, hop_length=512))
    contrast = np.asarray(sp.spectral_contrast(S, sr, 2048))
    plt.figure(figsize=(10, 4))
    img = plt.imshow(contrast, aspect="auto", origin="lower",
                     extent=[0, contrast.shape[1] * 512 / sr, 0, contrast.shape[0]])
    plt.colorbar(img)
    plt.title(f"Spectral Contrast ({prefix})")
    plt.tight_layout()
    if output_dir:
        plt.savefig(output_dir / f"{prefix}_spectral_contrast.png")
    plt.close()


def plot_spectral_summary(audio, sr=44100, output_dir=None, prefix=""):
    """3-panel summary: RMS, log spectrogram + centroid/rolloff, contrast."""
    yj = jnp.asarray(audio, jnp.float32)
    rms = np.asarray(sp.rms_from_audio(yj))
    times_rms = np.arange(len(rms)) * 512 / sr
    mean_rms = np.mean(rms)

    S = jnp.abs(stft(yj, n_fft=2048, hop_length=512))
    S_db = np.asarray(amplitude_to_db(S, ref="max"))
    centroid = np.asarray(sp.spectral_centroid(S, sr, 2048))
    rolloff = np.asarray(sp.spectral_rolloff(S, sr, 2048, 0.85))
    times_spec = np.arange(len(centroid)) * 512 / sr
    contrast = np.asarray(sp.spectral_contrast(S, sr, 2048))

    plt.figure(figsize=(13, 12))
    plt.subplot(3, 1, 1)
    plt.semilogy(times_rms, rms, label="RMS Energy")
    plt.axhline(mean_rms, color="red", ls="--", label=f"mean(RMS): {mean_rms:.3f}")
    plt.legend()
    plt.title("RMS Energy")

    plt.subplot(3, 1, 2)
    img = specshow(S_db, sr=sr, hop_length=512, x_axis="time", y_axis="log", cmap="magma")
    plt.plot(times_spec, centroid, color="w", lw=1.3, label="Spectral centroid")
    plt.plot(times_spec, rolloff, color="c", lw=1.5, label="Spectral rolloff (0.85)")
    plt.legend(loc="upper right")
    plt.title("log Power spectrogram")
    plt.colorbar(img, format="%+2.0f dB")

    plt.subplot(3, 1, 3)
    img = plt.imshow(contrast, aspect="auto", origin="lower",
                     extent=[0, contrast.shape[1] * 512 / sr, 0, contrast.shape[0]])
    plt.title("Spectral contrast")
    plt.ylabel("Frequency bands")
    plt.colorbar(img)
    plt.xlabel("Time [s]")
    plt.tight_layout()
    if output_dir:
        outdir = Path(output_dir)
        outdir.mkdir(parents=True, exist_ok=True)
        plt.savefig(outdir / f"{prefix}_spectral_summary.png")
    plt.close()


def plot_all_waveforms(original_audio, components, component_names, sr, output_path, prefix=""):
    n_comps = len(components)
    fig, axs = plt.subplots(n_comps + 1, 1, figsize=(12, 2.5 * (n_comps + 1)))
    _idx0 = np.arange(len(original_audio))
    axs[0].plot(*envelope_decimate(_idx0, original_audio), color="grey")
    axs[0].set_title("Original Audio - Waveform")
    axs[0].set_xlim(0, len(original_audio))
    for i, (audio, name) in enumerate(zip(components, component_names)):
        axs[i + 1].plot(*envelope_decimate(np.arange(len(audio)), audio))
        axs[i + 1].set_title(f"{name.capitalize()} - Waveform")
        axs[i + 1].set_xlim(0, len(audio))
    plt.tight_layout(pad=2.0)
    plt.savefig(Path(output_path) / f"{prefix}_all_waveforms.png")
    plt.close()


def plot_all_spectrograms(original_audio, components, component_names, sr, output_path, prefix=""):
    n_comps = len(components)
    S_orig = melspectrogram(jnp.asarray(original_audio, jnp.float32), sr=sr)
    # reference applies amplitude_to_db to the POWER mel (20·log10 of power;
    # src/feature_visualizations.py:187,193) — match that scale exactly
    S_orig_db = np.asarray(amplitude_to_db(S_orig, ref="max"))
    fig, axs = plt.subplots(n_comps, 2, figsize=(13, 3 * n_comps), squeeze=False)
    for i, (audio, name) in enumerate(zip(components, component_names)):
        specshow(S_orig_db, sr=sr, hop_length=512, x_axis="time", y_axis="mel", ax=axs[i, 0], cmap="magma")
        axs[i, 0].set_title("Original Audio")
        S_c = melspectrogram(jnp.asarray(audio, jnp.float32), sr=sr)
        specshow(np.asarray(amplitude_to_db(S_c, ref="max")), sr=sr, hop_length=512,
                 x_axis="time", y_axis="mel", ax=axs[i, 1], cmap="magma")
        axs[i, 1].set_title(f"{name.capitalize()}")
    for row in range(n_comps):
        for col in range(2):
            axs[row, col].label_outer()
    plt.tight_layout(pad=2.0)
    plt.savefig(Path(output_path) / f"{prefix}_all_spectrograms.png")
    plt.close()


def plot_f0_contour(y, sr, f0, times, title="Fundamental Frequency (pYIN)",
                    output_dir: Optional[Path] = None, prefix=""):
    S = jnp.abs(stft(jnp.asarray(y, jnp.float32), n_fft=2048, hop_length=512))
    D = np.asarray(amplitude_to_db(S, ref="max"))
    fig, ax = plt.subplots(figsize=(10, 4))
    img = specshow(D, sr=sr, hop_length=512, x_axis="time", y_axis="log", ax=ax, cmap="magma")
    ax.set(title=title)
    fig.colorbar(img, ax=ax, format="%+2.f dB")
    ax.plot(times, f0, label="f0", color="cyan", linewidth=2)
    ax.legend(loc="upper right")
    plt.tight_layout()
    if output_dir is not None:
        plt.savefig(Path(output_dir) / f"{prefix}_f0_contour.png")
    plt.close()


def plot_mel_spectrogram_with_f0(y, sr, f0, times, title="Mel Spectrogram (Vocal) with f0",
                                 output_dir: Optional[Path] = None, prefix=""):
    S = melspectrogram(jnp.asarray(y, jnp.float32), sr=sr)
    # amplitude_to_db on the POWER mel = reference scale (feature_visualizations.py:228)
    S_dB = np.asarray(amplitude_to_db(S, ref="max"))
    fig, ax = plt.subplots(figsize=(10, 4))
    img = specshow(S_dB, sr=sr, hop_length=512, x_axis="time", y_axis="mel", ax=ax, cmap="magma")
    ax.set(title=title)
    fig.colorbar(img, ax=ax, format="%+2.f dB")
    # f0 drawn on the mel-bin axis; NaN (unvoiced) frames stay NaN so the
    # contour shows gaps like the reference, not a line pinned to bin 0
    n_mels = S_dB.shape[0]
    mel_of_f0 = hz_to_mel(np.asarray(f0, dtype=np.float64)) / hz_to_mel(sr / 2) * n_mels
    ax.plot(times, mel_of_f0, label="f0", color="cyan", linewidth=2)
    ax.legend(loc="upper right")
    plt.tight_layout()
    if output_dir is not None:
        plt.savefig(Path(output_dir) / f"{prefix}_mel_f0.png")
    plt.close()
