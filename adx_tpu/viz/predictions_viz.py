"""Prediction visualizations — output-compatible with the reference's
``scripts/run_sonics_pred_vis.py`` (per-model P(fake) line plots, confusion
matrices, ACC/PREC/REC/F1 table PNG, fake-share-vs-threshold curves)."""

from __future__ import annotations

import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import seaborn as sns
from sklearn.metrics import accuracy_score, confusion_matrix, f1_score, precision_score, recall_score


def setup_professional_style():
    plt.rcParams["font.family"] = "sans-serif"
    plt.rcParams["font.size"] = 10
    plt.rcParams["axes.labelsize"] = 12
    plt.rcParams["axes.titlesize"] = 13
    plt.rcParams["xtick.labelsize"] = 11
    plt.rcParams["ytick.labelsize"] = 11
    plt.rcParams["legend.fontsize"] = 10
    plt.rcParams["figure.titlesize"] = 16
    plt.rcParams["axes.grid"] = True
    plt.rcParams["grid.alpha"] = 0.3
    plt.rcParams["grid.linestyle"] = "--"
    plt.rcParams["grid.linewidth"] = 0.5
    sns.set_palette("husl")


def load_predictions(json_path) -> pd.DataFrame:
    """predictions.json → flat DataFrame with binary label columns."""
    with open(json_path, "r", encoding="utf-8") as f:
        data = json.load(f)
    rows = []
    for model, tracks in data.items():
        for track_id, info in tracks.items():
            rows.append(
                {
                    "model": model,
                    "track_id": track_id,
                    "track_stem": info.get("track_stem", track_id),
                    "prediction": info.get("prediction", np.nan),
                    "predicted_class": info.get("predicted_class", "Unknown"),
                    "true_class": info.get("track_source", "Unknown"),
                }
            )
    df = pd.DataFrame(rows)
    df["prediction"] = pd.to_numeric(df["prediction"], errors="coerce")
    class_map = {"Real": 0, "Fake": 1, "REAL": 0, "GENERATED": 1}
    df["true_binary"] = df["true_class"].map(class_map).fillna(-1)
    df["pred_binary"] = df["predicted_class"].map(class_map).fillna(-1)
    return df


def plot_model_predictions_lines(df, models, colors, output_dir):
    setup_professional_style()
    out_dir = Path(output_dir) / "model_predictions_clean"
    out_dir.mkdir(parents=True, exist_ok=True)
    fig, axes = plt.subplots(2, 3, figsize=(20, 12))
    axes = axes.flatten()
    for i, model in enumerate(models[:5]):
        ax = axes[i]
        df_model = df[df["model"] == model].copy()
        unique_tracks = sorted(df_model["track_stem"].unique())
        track_to_idx = {track: j for j, track in enumerate(unique_tracks)}
        df_model["track_idx"] = df_model["track_stem"].map(track_to_idx)
        df_model = df_model.sort_values("track_idx")
        ax.plot(
            df_model["track_idx"].values, df_model["prediction"].values,
            linewidth=5, color=colors.get(model, "#7f7f7f"), alpha=0.95, zorder=3,
        )
        ax.axhline(0.5, color="red", linestyle="--", linewidth=3, alpha=0.9)
        ax.set_xticks(range(len(unique_tracks)))
        ax.set_xticklabels(range(len(unique_tracks)), fontsize=12)
        ax.set_ylim(-0.05, 1.05)
        ax.set_title(f"{model}", fontsize=16, fontweight="bold", pad=15)
        ax.set_xlabel("Audio Track Index")
        ax.set_ylabel("P(Fake)")
        ax.grid(True, alpha=0.25)
    if len(models) > 5:
        # reference silently drops model 6+ AND leaves an empty styled panel
        # (run_sonics_pred_vis.py:83,109) — deviate where broken: warn, and
        # delete every unplotted axis
        print(f"⚠️ plotting only the first 5 of {len(models)} models "
              f"(dropped: {', '.join(models[5:])})")
    for i in range(min(len(models), 5), 6):
        fig.delaxes(axes[i])
    plt.suptitle(
        "SONICS Model Predictions: P(Fake) Confidence per Audio Track\n(Decision threshold 0.5)",
        fontsize=20, fontweight="bold", y=0.98, color="#2c3e50",
    )
    plt.tight_layout()
    out_file = out_dir / "predictions_lines.png"
    plt.savefig(out_file, dpi=300, bbox_inches="tight", facecolor="white")
    plt.close()
    print(f"✅ Saved predictions lines: {out_file}")


def plot_confusion_matrices(df, models, colors, output_dir):
    setup_professional_style()
    if not models:
        print("⚠️ No models configured — skipping confusion matrices")
        return
    out_dir = Path(output_dir) / "confusion_matrices"
    out_dir.mkdir(parents=True, exist_ok=True)
    fig, axes = plt.subplots(1, len(models), figsize=(5 * len(models), 5))
    if len(models) == 1:
        axes = [axes]
    for i, model in enumerate(models):
        df_model = df[(df["model"] == model) & (df["true_binary"] != -1) & (df["pred_binary"] != -1)]
        if df_model.empty:
            # a configured model absent from the predictions tree (the
            # default config lists all five reference generators) —
            # sklearn's confusion_matrix raises on empty input, killing
            # the whole vis stage for a partial dataset
            print(f"⚠️ No predictions for model '{model}' — empty panel")
            axes[i].set_title(f"{model}\n(no data)")
            axes[i].axis("off")
            continue
        cm = confusion_matrix(df_model["true_binary"], df_model["pred_binary"], labels=[0, 1])
        sns.heatmap(
            cm, annot=True, fmt="d", cmap="Blues", ax=axes[i],
            xticklabels=["Real", "Fake"], yticklabels=["Real", "Fake"],
        )
        acc = accuracy_score(df_model["true_binary"], df_model["pred_binary"])
        axes[i].set_title(f"{model}\nACC: {acc:.3f}")
    plt.suptitle("Confusion Matrices per Model", fontsize=16, fontweight="bold")
    plt.tight_layout()
    out_file = out_dir / "confusion_matrices.png"
    plt.savefig(out_file, dpi=300, bbox_inches="tight")
    plt.close()
    print(f"✅ Confusion matrices saved: {out_file}")


def metrics_table_data(df, models):
    """The performance-table cell values (incl. the reference's ':.3f'
    string formatting) — split out so tests/test_reference_parity.py can
    exec the reference's own metrics loop
    (scripts/run_sonics_pred_vis.py:158-172) next to this one."""
    metrics_data = []
    for model in models:
        df_model = df[(df["model"] == model) & (df["true_binary"] != -1) & (df["pred_binary"] != -1)]
        if len(df_model) > 0:
            y_true, y_pred = df_model["true_binary"], df_model["pred_binary"]
            metrics_data.append(
                {
                    "Model": model,
                    "ACC": f"{accuracy_score(y_true, y_pred):.3f}",
                    "PREC": f"{precision_score(y_true, y_pred, zero_division=0):.3f}",
                    "REC": f"{recall_score(y_true, y_pred, zero_division=0):.3f}",
                    "F1": f"{f1_score(y_true, y_pred, zero_division=0):.3f}",
                    "N": f"{len(df_model)}",
                }
            )
    return metrics_data


def plot_metrics_table(df, models, output_dir):
    setup_professional_style()
    out_dir = Path(output_dir) / "metrics"
    out_dir.mkdir(parents=True, exist_ok=True)
    metrics_data = metrics_table_data(df, models)
    if not metrics_data:
        print("⚠️ No metrics data")
        return
    metrics_df = pd.DataFrame(metrics_data)
    fig, ax = plt.subplots(figsize=(10, len(metrics_data) * 0.35 + 1.5))
    ax.axis("off")
    table = ax.table(
        cellText=metrics_df.iloc[:, 1:].values,
        colLabels=metrics_df.columns[1:],
        rowLabels=metrics_df["Model"],
        cellLoc="center",
        loc="center",
        bbox=[0, 0, 1, 0.9],
    )
    table.auto_set_font_size(False)
    table.set_fontsize(12)
    table.scale(1.3, 2.2)
    n_cols = len(metrics_df.columns) - 1
    for j in range(n_cols):
        hdr = table[(0, j)]
        hdr.set_facecolor("#2E86C1")
        hdr.set_text_props(weight="bold", color="white")
        hdr.set_height(0.1)
    for i in range(1, len(metrics_data) + 1):
        for j in range(n_cols):
            cell = table[(i, j)]
            cell.set_facecolor("#F8F9FA" if i % 2 == 0 else "#FFFFFF")
            cell.set_edgecolor("#DEE2E6")
    for _key, cell in table.get_celld().items():
        cell.set_linewidth(1.5)
        cell.set_edgecolor("#495057")
    plt.title("SONICS Model Performance Summary", fontsize=18, fontweight="bold", pad=30, color="#2E86C1")
    fig.text(
        0.5, 0.02,
        "ACC=Accuracy, PREC=Precision, REC=Recall, F1=F1-Score, N=Number of samples",
        ha="center", fontsize=10, style="italic",
    )
    out_file = out_dir / "performance_metrics.png"
    plt.savefig(out_file, dpi=300, bbox_inches="tight", facecolor="white")
    plt.close()
    print(f"✅ Metrics saved: {out_file}")


def plot_threshold_curves(df, models, colors, output_dir):
    setup_professional_style()
    out_dir = Path(output_dir) / "threshold_curves"
    out_dir.mkdir(parents=True, exist_ok=True)
    thresholds = np.linspace(0.0, 1.0, 101)
    all_shares = []
    for model in models:
        df_model = df[df["model"] == model].copy()
        if len(df_model) == 0 or df_model["prediction"].isna().all():
            continue
        shares = [
            {"threshold": thr, "share_fake": (df_model["prediction"] >= thr).mean(), "model": model}
            for thr in thresholds
        ]
        all_shares.append(pd.DataFrame(shares))
    if not all_shares:
        print("⚠️ No threshold data")
        return
    curve_df = pd.concat(all_shares, ignore_index=True)
    fig, ax = plt.subplots(figsize=(11, 7))
    for model in models:
        df_model_curve = curve_df[curve_df["model"] == model]
        ax.plot(
            df_model_curve["threshold"], df_model_curve["share_fake"],
            color=colors.get(model, "gray"), linewidth=4.5, alpha=0.95, label=model,
        )
    ax.axvline(0.5, color="red", linestyle="--", linewidth=3, alpha=0.9, label="Threshold 0.5")
    ax.axhline(0.5, color="gray", linestyle=":", linewidth=2.5, alpha=0.8)
    ax.set_xlabel("Threshold P(Fake)", fontsize=14, fontweight="bold", labelpad=12)
    ax.set_ylabel("Share of 'Fake' Decisions", fontsize=14, fontweight="bold", labelpad=12)
    ax.set_title("Share of 'Fake' Decisions vs. Threshold per Source", fontsize=16, fontweight="bold", pad=20)
    ax.legend(loc="upper right", frameon=True, fancybox=True, shadow=True, fontsize=12)
    ax.grid(True, alpha=0.25, linestyle="-", linewidth=0.5)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    plt.tight_layout()
    out_file = out_dir / "fake_share_vs_threshold_professional.png"
    plt.savefig(out_file, dpi=300, bbox_inches="tight", facecolor="white")
    plt.close()
    print(f"✅ Threshold curves saved: {out_file}")
