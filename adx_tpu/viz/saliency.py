"""Saliency-map figures — output-compatible with the reference's plots.

Same panel layout, colormaps, thresholds, filenames and stats boxes as
``visualize_spectrogram_saliency`` (reference:
src/spectrogram_explainability.py:137-251), ``visualize_fbp_saliency``
(src/dsp_band_ops.py:1135-1281), ``visualize_file_bands`` (:1283-1314) and
``visualize_aggregate_results`` (src/spectrogram_explainability.py:1051-1136).
"""

from __future__ import annotations

from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import seaborn as sns

from adx_tpu.ops.mel import fft_frequencies
from adx_tpu.viz.display import display_col_index, specshow


def _importance_mask(importance_map, highlight_percent, abs_threshold):
    if abs_threshold is not None:
        mask = np.abs(importance_map) >= abs_threshold
        maskinfo = f"|Δ pred| ≥ {abs_threshold:.2f}"
    else:
        pos_thr = np.percentile(importance_map, 100 - highlight_percent)
        neg_thr = np.percentile(importance_map, highlight_percent)
        mask = (importance_map >= pos_thr) | (importance_map <= neg_thr)
        maskinfo = f"Top ±{highlight_percent:.0f}%"
    return mask, maskinfo


def visualize_spectrogram_saliency(
    importance_map: np.ndarray,
    spectrogram_db: np.ndarray,
    output_path: str,
    title: str = "Spectrogram Saliency Map",
    sr: int = 44100,
    hop_length: int = 512,
    highlight_percent: float = 20.0,
    abs_threshold: float | None = None,
    spec_type: str = "mel",
    dpi: int = 300,
):
    """4-panel saliency figure: original spec, full Δ map, masked Δ map,
    gray spec + alpha overlay with stats box."""
    spec_type = spec_type.lower()
    y_axis = "hz" if spec_type == "stft" else "mel"
    orig_title = (
        "Original STFT Spectrogram" if spec_type == "stft" else "Original Mel Spectrogram"
    )
    bin_label = "Frequency (Hz)" if spec_type == "stft" else "Mel Bin"

    mask, maskinfo = _importance_mask(importance_map, highlight_percent, abs_threshold)
    filtered_map = np.full_like(importance_map, np.nan)
    filtered_map[mask] = importance_map[mask]

    fig, axes = plt.subplots(4, 1, figsize=(18, 16), sharex=True, sharey=True)

    img1 = specshow(
        spectrogram_db, sr=sr, hop_length=hop_length, x_axis="time",
        y_axis=y_axis, ax=axes[0], cmap="viridis",
    )
    axes[0].set_title(orig_title, fontsize=13, fontweight="bold")
    axes[0].set_ylabel(bin_label, fontsize=11)
    plt.colorbar(img1, ax=axes[0], format="%+2.0f dB")

    fullmap_absmax = np.max(np.abs(importance_map))
    img2 = specshow(
        importance_map, sr=sr, hop_length=hop_length, x_axis="time",
        y_axis=y_axis, ax=axes[1], cmap="seismic",
        vmin=-fullmap_absmax, vmax=fullmap_absmax,
    )
    axes[1].set_title("Full Importance (Δ Prediction)", fontsize=13, fontweight="bold")
    axes[1].set_ylabel(bin_label, fontsize=11)
    plt.colorbar(img2, ax=axes[1], label="Importance (Δ prediction)", orientation="vertical")

    img3 = specshow(
        filtered_map, sr=sr, hop_length=hop_length, x_axis="time",
        y_axis=y_axis, ax=axes[2], cmap="seismic",
        vmin=-fullmap_absmax, vmax=fullmap_absmax,
    )
    axes[2].set_title(f"Highlighted Importance ({maskinfo})", fontsize=13, fontweight="bold")
    axes[2].set_ylabel(bin_label, fontsize=11)
    plt.colorbar(img3, ax=axes[2], label="Importance", orientation="vertical")

    alpha_mask = np.zeros_like(importance_map, dtype=float) + 0.20
    alpha_mask[mask] = 0.65
    specshow(
        spectrogram_db, sr=sr, hop_length=hop_length, x_axis="time",
        y_axis=y_axis, ax=axes[3], cmap="gray", alpha=0.92,
    )
    specshow(
        importance_map, sr=sr, hop_length=hop_length, x_axis="time",
        y_axis=y_axis, ax=axes[3], cmap="seismic", alpha=alpha_mask,
        vmin=-fullmap_absmax, vmax=fullmap_absmax,
    )
    axes[3].set_title(
        f"Spectrogram + Saliency\nHighlighted: {maskinfo} (alpha=1 core, 0.25 background)",
        fontsize=13, fontweight="bold",
    )
    axes[3].set_ylabel(bin_label, fontsize=11)
    axes[3].set_xlabel("Time (s)", fontsize=11)

    stats_text = (
        f"Mean: {importance_map.mean():.4f} | Max: {importance_map.max():.4f} | "
        f"Min: {importance_map.min():.4f}\n"
        f"{maskinfo} | Highlighted: {np.sum(mask)} ({100*np.mean(mask):.1f}%)"
    )
    axes[3].text(
        0.02, 0.94, stats_text, transform=axes[3].transAxes, fontsize=9,
        verticalalignment="top",
        bbox=dict(boxstyle="round", facecolor="white", alpha=0.7),
    )
    plt.suptitle(title, fontsize=16, fontweight="bold")
    plt.tight_layout()
    plt.savefig(output_path, dpi=dpi, bbox_inches="tight")
    plt.close()
    print(f"✅ Saved: {output_path}")


def visualize_fbp_saliency(
    importance_map: np.ndarray,
    spectrogram_db: np.ndarray,
    output_path: str,
    title: str,
    sr: int,
    hop_length: int,
    highlight_percent: float = 20.0,
    abs_threshold: float | None = None,
    dpi: int = 300,
):
    """FBP 4-panel figure (band-uniform Δ over an STFT spectrogram).

    Takes the precomputed dB spectrogram (the reference recomputes it from
    the complex S, src/dsp_band_ops.py:1154 — here complex never reaches the
    host)."""
    n_freq = importance_map.shape[0]
    n_fft = 2 * (n_freq - 1)
    freqs = fft_frequencies(sr=sr, n_fft=n_fft)

    y_ticks_hz = [0, 2500, 5000, 7500, 10000, 12500, 15000, 17500, 20000]
    y_ticks_hz = [f for f in y_ticks_hz if f <= sr / 2]
    y_ticks_idx = [int(np.argmin(np.abs(freqs - hz))) for hz in y_ticks_hz]
    y_ticks_lbl = [f"{f}" for f in y_ticks_hz]

    mask, maskinfo = _importance_mask(importance_map, highlight_percent, abs_threshold)
    filtered_map = np.full_like(importance_map, np.nan)
    filtered_map[mask] = importance_map[mask]

    # display-only column decimation (stats/mask above are full-res); the
    # explicit extent keeps the frame-index x coordinates of the full map,
    # so ticks and data coords are unchanged
    n_t = importance_map.shape[1]
    dec = display_col_index(n_t)
    _d = (lambda a: a[:, dec]) if dec is not None else (lambda a: a)
    ext = (-0.5, n_t - 0.5, -0.5, n_freq - 0.5)

    fig, axes = plt.subplots(4, 1, figsize=(18, 16))

    img1 = specshow(
        spectrogram_db, sr=sr, hop_length=hop_length, x_axis="time",
        y_axis="hz", ax=axes[0], cmap="viridis",
    )
    axes[0].set_title("Original STFT Spectrogram", fontsize=13, fontweight="bold")
    axes[0].set_ylabel("Frequency (Hz)", fontsize=11)
    plt.colorbar(img1, ax=axes[0], format="%+2.0f dB")

    fullmap_absmax = np.max(np.abs(importance_map))
    im2 = axes[1].imshow(
        _d(importance_map), aspect="auto", origin="lower", cmap="seismic",
        interpolation="none", vmin=-fullmap_absmax, vmax=fullmap_absmax,
        extent=ext,
    )
    axes[1].set_title("Full Importance (Δ Prediction)", fontsize=13, fontweight="bold")
    axes[1].set_ylabel("Frequency (Hz)", fontsize=11)
    axes[1].set_yticks(y_ticks_idx)
    axes[1].set_yticklabels(y_ticks_lbl)
    plt.colorbar(im2, ax=axes[1], label="Importance (Δ prediction)", orientation="vertical")

    im3 = axes[2].imshow(
        _d(filtered_map), aspect="auto", origin="lower", cmap="seismic",
        interpolation="none", vmin=-fullmap_absmax, vmax=fullmap_absmax,
        extent=ext,
    )
    axes[2].set_title(f"Highlighted Importance ({maskinfo})", fontsize=13, fontweight="bold")
    axes[2].set_ylabel("Frequency (Hz)", fontsize=11)
    axes[2].set_yticks(y_ticks_idx)
    axes[2].set_yticklabels(y_ticks_lbl)
    plt.colorbar(im3, ax=axes[2], label="Importance", orientation="vertical")

    alpha_mask = np.zeros_like(importance_map, dtype=float) + 0.20
    alpha_mask[mask] = 0.65
    axes[3].imshow(_d(spectrogram_db), aspect="auto", origin="lower",
                   cmap="gray", alpha=0.92, extent=ext)
    axes[3].imshow(
        _d(importance_map), aspect="auto", origin="lower", cmap="seismic",
        alpha=_d(alpha_mask), vmin=-fullmap_absmax, vmax=fullmap_absmax,
        interpolation="none", extent=ext,
    )
    axes[3].set_title(
        f"Spectrogram + FBP saliency\nHighlighted: {maskinfo} (alpha=1 core, 0.25 background)",
        fontsize=13, fontweight="bold",
    )
    axes[3].set_ylabel("Frequency (Hz)", fontsize=11)
    axes[3].set_yticks(y_ticks_idx)
    axes[3].set_yticklabels(y_ticks_lbl)
    axes[3].set_xlabel("Time frame", fontsize=11)

    stats_text = (
        f"Mean: {importance_map.mean():.4f} | "
        f"Max: {importance_map.max():.4f} | "
        f"Min: {importance_map.min():.4f}\n"
        f"{maskinfo} | Highlighted: {np.sum(mask)} ({100 * np.mean(mask):.1f}%)"
    )
    axes[3].text(
        0.02, 0.94, stats_text, transform=axes[3].transAxes, fontsize=9,
        verticalalignment="top",
        bbox=dict(boxstyle="round", facecolor="white", alpha=0.7),
    )
    plt.suptitle(title, fontsize=16, fontweight="bold")
    plt.tight_layout()
    plt.savefig(output_path, dpi=dpi, bbox_inches="tight")
    plt.close()
    print(f"✅ Saved FBP saliency: {output_path}")


def visualize_file_bands(
    bands: list[dict], file_name: str, folder: str, output_dir: Path | str, dpi: int = 300
) -> None:
    """Per-file Δ-per-band barplot (``{file_name}__band_importance.png``)."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    if not bands:
        return
    df = pd.DataFrame(bands)
    df["band"] = df.apply(lambda r: f"{int(r['low'])}-{int(r['high'])}Hz", axis=1)
    df.sort_values("low", inplace=True)
    plt.figure(figsize=(10, 5))
    sns.barplot(data=df, x="band", y="importance", hue="component")
    plt.title(f"{file_name} | {folder} | Δ per band")
    plt.xlabel("Band (Hz)")
    plt.ylabel("Change in probability (Δ)")
    plt.xticks(rotation=45)
    plt.axhline(0, color="black", linewidth=0.8)
    plt.tight_layout()
    plt.savefig(output_dir / f"{file_name}__band_importance.png", dpi=dpi)
    plt.close()


def visualize_orig_vs_masked_spectrogram(
    Sdb_orig: np.ndarray,
    Sdb_masked: np.ndarray,
    filename: str,
    compdir: Path,
    component: str,
    low: float,
    high: float,
    delta: float,
    sr: int,
    hop_length: int,
    dpi: int = 300,
):
    """Side-by-side original vs band-masked spectrogram (``batches_vis/``)."""
    vis_dir = Path(compdir) / "batches_vis"
    vis_dir.mkdir(parents=True, exist_ok=True)
    fig, axes = plt.subplots(1, 2, figsize=(15, 6))
    img1 = specshow(Sdb_orig, sr=sr, hop_length=hop_length, x_axis="time", y_axis="hz", ax=axes[0], cmap="viridis")
    axes[0].set_title("Original spectrogram")
    plt.colorbar(img1, ax=axes[0])
    img2 = specshow(Sdb_masked, sr=sr, hop_length=hop_length, x_axis="time", y_axis="hz", ax=axes[1], cmap="viridis")
    axes[1].set_title("Masked spectrogram (band disabled)")
    plt.colorbar(img2, ax=axes[1])
    plt.suptitle(f"{filename} (low={low}, high={high}, component={component}, delta={delta:.3f})")
    plt.tight_layout()
    plt.savefig(vis_dir / f"{filename}__{component}__{low}_{high}_{delta:.3f}.png", dpi=dpi, bbox_inches="tight")
    plt.close()


def visualize_aggregate_results(results_df: pd.DataFrame, output_dir: str | Path, dpi: int = 300):
    """Cross-model aggregate PNGs + summary_statistics.csv (occlusion/RISE)."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    if results_df.empty:
        print("⚠️  Empty results, skipping visualizations")
        return
    print("\n📊 Generating aggregate visualizations...")

    plt.figure(figsize=(12, 6))
    sns.barplot(data=results_df, x="folder", y="mean_importance", errorbar="sd")
    plt.title("Mean Importance per Model Generator", fontsize=14, fontweight="bold")
    plt.xlabel("Model", fontsize=12)
    plt.ylabel("Mean Importance (Δ Prediction)", fontsize=12)
    plt.xticks(rotation=45, ha="right")
    plt.grid(axis="y", alpha=0.3)
    plt.tight_layout()
    plt.savefig(output_dir / "mean_importance_per_model.png", dpi=dpi)
    plt.close()
    print("   ✅ mean_importance_per_model.png")

    plt.figure(figsize=(12, 6))
    sns.barplot(data=results_df, x="folder", y="max_importance", errorbar="sd")
    plt.title("Max Importance per Model Generator", fontsize=14, fontweight="bold")
    plt.xlabel("Model", fontsize=12)
    plt.ylabel("Max Importance (Δ Prediction)", fontsize=12)
    plt.xticks(rotation=45, ha="right")
    plt.grid(axis="y", alpha=0.3)
    plt.tight_layout()
    plt.savefig(output_dir / "max_importance_per_model.png", dpi=dpi)
    plt.close()
    print("   ✅ max_importance_per_model.png")

    plt.figure(figsize=(14, 6))
    sns.boxplot(data=results_df, x="folder", y="mean_importance")
    plt.title("Distribution of Mean Importance", fontsize=14, fontweight="bold")
    plt.xlabel("Model", fontsize=12)
    plt.ylabel("Mean Importance", fontsize=12)
    plt.xticks(rotation=45, ha="right")
    plt.grid(axis="y", alpha=0.3)
    plt.tight_layout()
    plt.savefig(output_dir / "importance_distribution.png", dpi=dpi)
    plt.close()
    print("   ✅ importance_distribution.png")

    plt.figure(figsize=(10, 6))
    for folder in results_df["folder"].unique():
        folder_df = results_df[results_df["folder"] == folder]
        plt.scatter(
            folder_df["baseline_pred"], folder_df["mean_importance"],
            label=folder, alpha=0.6, s=50,
        )
    plt.xlabel("Baseline Prediction (Fake Probability)", fontsize=12)
    plt.ylabel("Mean Importance", fontsize=12)
    plt.title("Baseline Prediction vs Mean Importance", fontsize=14, fontweight="bold")
    plt.legend(bbox_to_anchor=(1.05, 1), loc="upper left")
    plt.grid(alpha=0.3)
    plt.tight_layout()
    plt.savefig(output_dir / "prediction_vs_importance.png", dpi=dpi)
    plt.close()
    print("   ✅ prediction_vs_importance.png")

    summary = results_df.groupby("folder").agg(
        {
            "mean_importance": ["mean", "std"],
            "max_importance": ["mean", "std"],
            "baseline_pred": ["mean", "std"],
        }
    ).round(4)
    summary.to_csv(output_dir / "summary_statistics.csv")
    print("   ✅ summary_statistics.csv")
    print(f"\n✅ Aggregate visualizations saved to: {output_dir}\n")
