#!/usr/bin/env python
"""Occlusion patch feature visualization (capability-equivalent to the
reference's scripts/feature_visualizations/run_Occlusion_features_vis.py):
loads occlusion_patches_features.json, derives patch groups and window
labels, and emits the four families the reference main() runs —
real-vs-generated pos/neg boxplots, best-vs-worst boxplots,
most-influential pos/neg boxplots, and feature-vs-importance scatters."""

from __future__ import annotations

import argparse
import json
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
    BOX_FILL_COLORS,
    TYPE_MAPPING,
    flatten_feature,
    grouped_feature_boxplots,
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
    with open(json_file, "r", encoding="utf-8") as f:
        data = json.load(f)
    all_rows = []
    for model_name, tracks_dict in data.items():
        for track_key, track_data in tracks_dict.items():
            if not isinstance(track_data, dict) or "patches" not in track_data:
                continue
            for patch_key, patch_data in track_data.get("patches", {}).items():
                if not isinstance(patch_data, dict) or "features" not in patch_data:
                    continue
                row = {
                    "model": model_name,
                    "track": track_key,
                    "patch_key": patch_key,
                    "data_type": TYPE_MAPPING.get(model_name, model_name),
                }
                row.update(flatten_feature(patch_data.get("occlusion_meta", {})))
                row.update(flatten_feature(patch_data.get("features", {})))
                all_rows.append(row)
    features_df = pd.DataFrame(all_rows)
    if features_df.empty:
        print("⚠️ Warning: No data loaded from JSON file!")
        return features_df, []
    exclude = {"model", "track", "patch_key", "data_type"}
    feature_cols = [c for c in features_df.columns if c not in exclude]
    print(f"✅ Loaded {len(features_df)} patch rows, {len(feature_cols)} features")
    return features_df, feature_cols


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


def viz_feature_values_vs_importance_by_group(
    features_df, base_output_folder,
    features=("rms_wave_mean", "spectral_centroid_mean", "spectral_flatness_mean", "hnr"),
):
    """Feature-vs-importance scatters per patch group."""
    setup_professional_style()
    out = Path(base_output_folder) / "feature_vs_importance_by_group"
    out.mkdir(parents=True, exist_ok=True)
    if "importance" not in features_df.columns:
        return
    for group in sorted(features_df["group"].unique()):
        gdf = features_df[features_df["group"] == group]
        for feat in features:
            if feat not in gdf.columns or gdf[feat].notna().sum() < 3:
                continue
            plt.figure(figsize=(8, 6))
            for model in sorted(gdf["model"].unique()):
                s = gdf[gdf["model"] == model]
                plt.scatter(s[feat], s["importance"], label=model, alpha=0.7,
                            color=BOX_FILL_COLORS.get(model))
            plt.axhline(0, color="black", lw=0.8)
            plt.xlabel(feat)
            plt.ylabel("Occlusion importance (Δ)")
            r = gdf[[feat, "importance"]].dropna()
            rv = r[feat].corr(r["importance"]) if len(r) >= 3 else np.nan
            plt.title(f"{group}: {feat} vs importance (r={rv:.2f})", fontweight="bold")
            plt.legend(fontsize=8)
            plt.grid(alpha=0.3)
            plt.tight_layout()
            plt.savefig(out / f"{group}_{feat}.png", dpi=200, bbox_inches="tight")
            plt.close()
    print(f"Feature-vs-importance scatters → {out}")


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
