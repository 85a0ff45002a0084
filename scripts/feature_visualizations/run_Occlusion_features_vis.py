#!/usr/bin/env python
"""Occlusion patch feature visualization (capability-equivalent to the
reference's scripts/feature_visualizations/run_Occlusion_features_vis.py):
loads occlusion_patches_features.json, derives patch groups and window
labels, and emits the four families the reference main() runs —
real-vs-generated pos/neg boxplots, best-vs-worst boxplots,
most-influential pos/neg boxplots, and feature-vs-importance scatters."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

ROOT = Path(__file__).resolve().parents[2]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from adx_tpu.io.config import load_yaml
from adx_tpu.viz.feature_vis_common import (
    PROFESSIONAL_COLORS,
    build_feature_groups,
    grouped_feature_boxplots,
    load_collection_features_json,
    setup_professional_style,
)

_META_COLS = {
    "model", "track", "patch_key", "data_type", "group", "rank", "importance",
    "abs_importance", "tstart", "tend", "fstart", "fend", "start_time_sec",
    "end_time_sec", "patch_type", "track_stem", "window_label",
    "t_start", "t_end", "f_start", "f_end", "patch_sign", "pair",
}


def load_and_prepare_data_full(json_file):
    """occlusion_patches_features.json → per-(track, patch) feature rows."""
    return load_collection_features_json(
        json_file, collection_key="patches", id_col="patch_key",
        meta_key="occlusion_meta",
    )


def add_group_from_patch_key(features_df):
    """Patch key → group (most_influential first, since 'best'/'worst' are
    substrings — reference: run_Occlusion_features_vis.py:280-294)."""
    df = features_df.copy()
    df["patch_key"] = df["patch_key"].astype(str)
    conditions = [
        df["patch_key"].str.contains("most_influential", case=False, na=False),
        df["patch_key"].str.contains("best", case=False, na=False),
        df["patch_key"].str.contains("worst", case=False, na=False),
    ]
    df["group"] = np.select(conditions, ["most_influential", "best", "worst"], default="other")
    return df


def add_window_label_from_patch_meta(features_df):
    """t/f bounds → '{t0}-{t1}s_{f0}-{f1}Mel' labels
    (reference: run_Occlusion_features_vis.py:296-323)."""
    df = features_df.copy()
    for col in ["tstart", "tend", "fstart", "fend"]:
        if col not in df.columns:
            print(f"Warning: Column '{col}' not found, skipping window labels.")
            return df
    df["t_start"] = df["tstart"].round(1)
    df["t_end"] = df["tend"].round(1)
    df["f_start"] = df["fstart"].round(0).astype(int)
    df["f_end"] = df["fend"].round(0).astype(int)
    df["window_label"] = (
        df["t_start"].astype(str) + "-" + df["t_end"].astype(str) + "s_"
        + df["f_start"].astype(str) + "-" + df["f_end"].astype(str) + "Mel"
    )
    print(f"Added window_label: {df['window_label'].nunique()} unique windows")
    return df


def viz2_real_vs_generated_boxplots_with_influence(features_df, base_output_folder):
    """Real-vs-generated feature boxplots, split by patch sign."""
    df = features_df.copy()
    df["patch_sign"] = np.where(df.get("importance", 0) >= 0, "POSITIVE", "NEGATIVE")
    for sign in ["POSITIVE", "NEGATIVE"]:
        sdf = df[df["patch_sign"] == sign]
        if sdf.empty:
            continue
        grouped_feature_boxplots(
            sdf, Path(base_output_folder) / f"real_vs_generated_{sign.lower()}",
            split_col="data_type", split_values=["REAL", "GENERATED"],
            folder_name="boxplots",
            colors={"REAL": "#1f77b4", "GENERATED": "#7f7f7f"},
            extra_exclude=_META_COLS,
        )


def viz_best_vs_worst_boxplots(features_df, base_output_folder):
    df = features_df[features_df["group"].isin(["best", "worst"])]
    if df.empty:
        return
    grouped_feature_boxplots(
        df, Path(base_output_folder) / "best_vs_worst",
        split_col="group", split_values=["best", "worst"],
        folder_name="boxplots",
        colors={"best": "#2ecc71", "worst": "#e74c3c"},
        extra_exclude=_META_COLS,
    )


def viz_most_influential_pos_neg_boxplots(features_df, base_output_folder):
    df = features_df[features_df["group"] == "most_influential"].copy()
    if df.empty:
        return
    df["patch_sign"] = np.where(df.get("importance", 0) >= 0, "POSITIVE", "NEGATIVE")
    grouped_feature_boxplots(
        df, Path(base_output_folder) / "most_influential_pos_neg",
        split_col="patch_sign", split_values=["POSITIVE", "NEGATIVE"],
        folder_name="boxplots",
        colors={"POSITIVE": "#2ecc71", "NEGATIVE": "#e74c3c"},
        extra_exclude=_META_COLS,
    )


def _feature_vs_importance_per_model(window_df, col, feature_folder, feature_label):
    """One feature column → a per-model panel row of scatters vs importance,
    positive influences as filled circles and negative as X markers, with an
    n/Pearson-r stats box per panel (reference:
    viz_single_feature_vs_importance_in_group, run_Occlusion_features_vis.py:
    1680-1845)."""
    from matplotlib.lines import Line2D

    sub = window_df[[col, "importance", "influence_sign", "model"]].dropna(subset=[col])
    models = sorted(sub["model"].unique())
    if not models:
        return
    fig, axes = plt.subplots(1, len(models), figsize=(4 * len(models), 6),
                             sharey=True, squeeze=False)
    for ax, model in zip(axes[0], models):
        mdf = sub[sub["model"] == model]
        color = PROFESSIONAL_COLORS.get(model, "#333333")
        pos = mdf[mdf["influence_sign"] == "positive"]
        neg = mdf[mdf["influence_sign"] == "negative"]
        if not pos.empty:
            ax.scatter(pos[col], pos["importance"], color=color, alpha=0.8,
                       edgecolors="black", linewidth=0.5, s=50, marker="o")
        if not neg.empty:
            ax.scatter(neg[col], neg["importance"], color=color, alpha=0.4,
                       edgecolors="black", linewidth=1.8, s=70, marker="X")
        ax.axhline(0.0, color="gray", ls="--", lw=1.0, alpha=0.7)
        ax.set_title(model, fontsize=12, fontweight="bold", pad=10)
        ax.grid(alpha=0.3, linestyle="--")
        ax.set_axisbelow(True)
        ax.tick_params(axis="x", labelrotation=45, labelsize=10)
        stats = f"n = {len(mdf)}"
        if len(mdf) >= 2:
            r = mdf[col].corr(mdf["importance"])
            if not np.isnan(r):
                stats += f"\nPearson r = {r:.3f}"
        ax.text(0.98, 0.02, stats, transform=ax.transAxes, ha="right", va="bottom",
                fontsize=8, bbox=dict(boxstyle="round,pad=0.3", facecolor="white",
                                      alpha=0.9, edgecolor="black"))
    fig.supxlabel(feature_label, fontsize=13, fontweight="bold")
    fig.supylabel("Patch importance", fontsize=13, fontweight="bold")
    fig.legend(
        handles=[
            Line2D([0], [0], marker="o", color="w", markerfacecolor="blue",
                   markeredgecolor="black", label="positive", markersize=8),
            Line2D([0], [0], marker="X", color="w", markeredgecolor="black",
                   label="negative", markersize=8),
        ],
        title="Signs of influence", loc="upper right",
        bbox_to_anchor=(0.98, 0.98), fontsize=9, title_fontsize=10,
    )
    fig.suptitle(f"{feature_label} vs importance – per model",
                 fontsize=15, fontweight="bold", y=0.98)
    fig.tight_layout(rect=(0.03, 0.05, 0.97, 0.93))
    safe = feature_label.replace(" ", "_").replace("/", "_")
    fig.savefig(feature_folder / f"{safe}_vs_importance_per_model.png",
                dpi=200, bbox_inches="tight", facecolor="white")
    plt.close(fig)


def viz_feature_values_vs_importance_by_group(features_df, base_output_folder):
    """Per-WINDOW feature-vs-importance scatters: for every window_label, every
    numeric feature column gets a per-model panel figure (reference:
    viz_feature_values_vs_importance_by_group, run_Occlusion_features_vis.py:
    1848-1967 — the grouping unit is the time-frequency window, not the
    best/worst patch group)."""
    setup_professional_style()
    if "importance" not in features_df.columns:
        return
    if "window_label" not in features_df.columns:
        print("⚠️ No window_label column — skipping feature-vs-importance family")
        return
    df = features_df.copy()
    df["influence_sign"] = np.where(df["importance"] >= 0, "positive", "negative")
    windows = sorted(df["window_label"].dropna().unique().tolist())
    print(f"Processing {len(windows)} windows for feature vs importance...")
    for window_name in windows:
        wdf = df[df["window_label"] == window_name]
        if wdf.empty:
            continue
        window_dir = (
            Path(base_output_folder) / "by_group_feature_vs_importance"
            / str(window_name).replace(" ", "_")
        )
        feature_groups = build_feature_groups(wdf, _META_COLS | {"influence_sign"})
        stat_order = ["min", "mean", "std", "max"]
        for feature_base, columns_list in sorted(feature_groups.items()):
            feature_folder = window_dir / feature_base
            feature_folder.mkdir(parents=True, exist_ok=True)
            for col, stat in sorted(
                columns_list,
                key=lambda x: next((i for i, s in enumerate(stat_order) if s == x[1]), 999),
            ):
                label = feature_base if stat == "single" else f"{feature_base} ({stat.upper()})"
                _feature_vs_importance_per_model(wdf, col, feature_folder, label)
        print(f"{window_dir} done")
    print(f"Feature-vs-importance scatters → {Path(base_output_folder) / 'by_group_feature_vs_importance'}")


def main():
    ap = argparse.ArgumentParser(description="Visualize occlusion patch features")
    ap.add_argument(
        "--config", default=str(ROOT / "configs/Spec_occlusion_configs" / "occlusion_features_vis.yaml")
    )
    args = ap.parse_args()
    config = load_yaml(Path(args.config))

    data_cfg = config.get("data", {})
    output_cfg = config.get("output", {})
    data_root = Path(data_cfg.get("features_path"))
    result_root = Path(output_cfg.get("result_path"))

    features_path = data_root / "occlusion_patches_features.json"
    output_root = result_root / "features_visualization"
    output_root.mkdir(parents=True, exist_ok=True)

    print("=" * 70)
    print(f"Output root: {output_root}")
    print("Visualizing occlusion feature importance results")
    print("=" * 70)

    features_df, feats = load_and_prepare_data_full(features_path)
    if features_df.empty:
        return
    print(f"✓ Data loaded: {len(features_df)} samples, {len(feats)} features")

    features_df = add_group_from_patch_key(features_df)
    features_df = add_window_label_from_patch_meta(features_df)

    viz2_real_vs_generated_boxplots_with_influence(features_df, output_root)
    viz_best_vs_worst_boxplots(features_df, output_root)
    viz_most_influential_pos_neg_boxplots(features_df, output_root)
    viz_feature_values_vs_importance_by_group(features_df, output_root)


if __name__ == "__main__":
    main()
