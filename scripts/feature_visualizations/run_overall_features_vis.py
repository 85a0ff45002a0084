#!/usr/bin/env python
"""Overall features visualization (capability-equivalent to the reference's
scripts/feature_visualizations/run_overall_features_vis.py): loads
features.json + predictions.json, merges, and emits comparison tables,
Pearson-r heatmaps, per-model boxplots, correct-vs-incorrect and
TP/FP/TN/FN splits, and feature-vs-prediction scatters. The reference's
main() enables only the comparison table; here the families are flag-gated
via the config's ``visualizations`` section (table on by default)."""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np
import pandas as pd

ROOT = Path(__file__).resolve().parents[2]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from adx_tpu.io.config import load_yaml
from adx_tpu.viz.feature_vis_common import (
    MODEL_ORDER,
    TYPE_MAPPING,
    comparison_table_suite,
    correlation_heatmap_suite,
    feature_vs_target_scatters,
    flatten_feature,
    grouped_feature_boxplots,
)


def load_fulltrack_features(json_path):
    """features.json → per-track flattened feature rows."""
    with open(json_path, "r", encoding="utf-8") as f:
        data = json.load(f)
    rows = []
    for model_name, tracks_dict in data.items():
        for track_key, track_data in tracks_dict.items():
            if not isinstance(track_data, dict) or "segments" not in track_data:
                continue
            segments = track_data.get("segments", {})
            features = segments.get("features", {})
            mix = features.get("mix", {})
            segment_meta = segments.get("segment_meta", {})
            row = {
                "model": model_name,
                "track_id": track_key,
                "track_stem": segment_meta.get("track_stem", track_key),
                "data_type": TYPE_MAPPING.get(model_name, model_name),
            }
            row.update(flatten_feature(mix))
            rows.append(row)
    df = pd.DataFrame(rows)
    if df.empty:
        print("⚠️ Warning: no features loaded from full-track JSON!")
        return df, []
    exclude = {"model", "track_id", "track_stem", "data_type"}
    feature_cols = [
        c for c in df.columns if c not in exclude and pd.api.types.is_numeric_dtype(df[c])
    ]
    print(f"✅ Full-track features loaded: {len(df)} tracks, {len(feature_cols)} numeric features")
    return df, feature_cols


def load_predictions(json_path):
    """predictions.json → rows with TP/FP/TN/FN outcomes."""
    with open(json_path, "r", encoding="utf-8") as f:
        data = json.load(f)
    rows = []
    for model_name, tracks_dict in data.items():
        for track_key, info in tracks_dict.items():
            if not isinstance(info, dict):
                continue
            true_label = info.get("track_source", None)
            pred_label = info.get("predicted_class", None)
            if true_label is None or pred_label is None:
                outcome, is_correct = "unknown", False
            else:
                is_correct = true_label == pred_label
                outcome = {
                    ("Fake", "Fake"): "TP",
                    ("Fake", "Real"): "FN",
                    ("Real", "Fake"): "FP",
                    ("Real", "Real"): "TN",
                }.get((true_label, pred_label), "unknown")
            rows.append(
                {
                    "model": model_name,
                    "track_id": track_key,
                    "track_stem": info.get("track_stem", track_key),
                    "prediction_score": float(info.get("prediction", np.nan)),
                    "pred_label": pred_label,
                    "true_label": true_label,
                    "is_correct": bool(is_correct),
                    "outcome": outcome,
                }
            )
    df = pd.DataFrame(rows)
    print(f"✅ Predictions loaded: {len(df)} rows")
    return df


def merge_features_and_predictions(features_df, preds_df):
    merged = pd.merge(
        features_df, preds_df, on=["model", "track_stem"], how="inner", suffixes=("", "_pred")
    )
    print(f"✅ Merged features + predictions: {len(merged)} rows")
    return merged


def plot_features_by_model_line_all(
    merged_df, output_root,
    features=("rms_wave_mean", "spectral_centroid_mean", "spectral_flatness_mean", "hnr"),
):
    """Per-feature line plots vs track index per model, with the prediction
    trace on a twin panel (reference: line-plot family,
    run_overall_features_vis.py:415-574)."""
    import matplotlib.pyplot as plt

    from adx_tpu.viz.feature_vis_common import PROFESSIONAL_COLORS, setup_professional_style

    setup_professional_style()
    out_dir = Path(output_root) / "feature_lines_by_model"
    out_dir.mkdir(parents=True, exist_ok=True)
    for feat in features:
        if feat not in merged_df.columns:
            continue
        fig, axes = plt.subplots(2, 1, figsize=(14, 8), sharex=True)
        for model in sorted(merged_df["model"].unique()):
            mdf = merged_df[merged_df["model"] == model].sort_values("track_stem")
            x = np.arange(len(mdf))
            color = PROFESSIONAL_COLORS.get(model)
            axes[0].plot(x, mdf["prediction_score"].values, marker="o", label=model, color=color)
            axes[1].plot(x, mdf[feat].values, marker="s", label=model, color=color)
        axes[0].set_ylabel("P(fake)")
        axes[0].axhline(0.5, color="red", ls="--", alpha=0.6)
        axes[1].set_ylabel(feat)
        axes[1].set_xlabel("track index")
        for ax in axes:
            ax.grid(alpha=0.3)
        axes[0].legend(bbox_to_anchor=(1.02, 1), loc="upper left", fontsize=9)
        fig.suptitle(f"Prediction and {feat} per model", fontweight="bold")
        plt.tight_layout()
        plt.savefig(out_dir / f"{feat}_lines.png", dpi=200, bbox_inches="tight")
        plt.close()
    print(f"Line plots → {out_dir}")


def main():
    ap = argparse.ArgumentParser(description="Visualize full-track audio features vs model predictions.")
    ap.add_argument("--config", default=str(ROOT / "configs" / "Features_extraction" / "features_vis.yaml"))
    args = ap.parse_args()
    config = load_yaml(Path(args.config))

    data_cfg = config.get("data", {})
    output_cfg = config.get("output", {})
    viz_cfg = config.get("visualizations", {})

    features_path = data_cfg.get("features_path")
    preds_path = data_cfg.get("predictions_path")
    output_root = Path(output_cfg.get("result_path"))
    output_root.mkdir(parents=True, exist_ok=True)

    print("=" * 70)
    print(f"Features JSON:   {features_path}")
    print(f"Predictions JSON:{preds_path}")
    print(f"Output root:     {output_root}")
    print("=" * 70)

    features_df, _ = load_fulltrack_features(features_path)
    preds_df = load_predictions(preds_path)
    merged_df = merge_features_and_predictions(features_df, preds_df)
    if merged_df.empty:
        print("❌ Nothing to visualize")
        return

    models = [m for m in MODEL_ORDER if m in merged_df["model"].unique()]

    if viz_cfg.get("comparison_table", True):
        comparison_table_suite(merged_df, output_root / "overall_comparison_tables")
    if viz_cfg.get("correlation_heatmaps", False):
        correlation_heatmap_suite(
            merged_df, output_root / "overall_correlation_r_heatmaps",
            target_col="prediction_score",
            exclude={"model", "track_id", "track_stem", "data_type", "track_id_pred"},
            suffix="Prediction P(fake)",
        )
    if viz_cfg.get("boxplots_by_model", False):
        grouped_feature_boxplots(
            merged_df, output_root, split_col="model", split_values=models,
            panel2_col="data_type", panel2_values=["REAL", "GENERATED"],
            folder_name="boxplots_by_model_global",
        )
    if viz_cfg.get("correct_vs_incorrect", False):
        cvi = merged_df.copy()
        cvi["correctness"] = np.where(cvi["is_correct"], "correct", "incorrect")
        grouped_feature_boxplots(
            cvi, output_root, split_col="correctness", split_values=["correct", "incorrect"],
            folder_name="boxplots_correct_vs_incorrect",
            colors={"correct": "#2ecc71", "incorrect": "#e74c3c"},
            extra_exclude={"correctness"},
        )
    if viz_cfg.get("confusion_outcome", False):
        grouped_feature_boxplots(
            merged_df, output_root, split_col="outcome",
            split_values=["TP", "FP", "TN", "FN"],
            folder_name="boxplots_by_confusion_outcome",
            colors={"TP": "#2ecc71", "TN": "#1f77b4", "FP": "#e74c3c", "FN": "#ff7f0e"},
        )
    if viz_cfg.get("feature_vs_prediction_scatter", False):
        feature_vs_target_scatters(
            merged_df, output_root, target_col="prediction_score",
            confidence_threshold=viz_cfg.get("confidence_threshold", 0.3),
        )
    if viz_cfg.get("feature_lines", False):
        plot_features_by_model_line_all(merged_df, output_root)

    print(f"\n✅ All visualizations under {output_root}")


if __name__ == "__main__":
    main()
