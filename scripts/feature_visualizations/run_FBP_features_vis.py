#!/usr/bin/env python
"""FBP band feature visualization (capability-equivalent to the reference's
scripts/feature_visualizations/run_FBP_features_vis.py): loads
fbp_band_features.json + the FBP results tree, maps band keys to the 27
labeled bands across the three presets, and emits the 3-row
prediction/importance/feature line plots (single and multicolumn — the
families the reference main() enables) plus flag-gated boxplots and
feature-vs-importance scatters."""

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
    PROFESSIONAL_COLORS,
    grouped_feature_boxplots,
    load_collection_features_json,
    setup_professional_style,
)

_META_COLS = {
    "model", "track", "band_key", "data_type", "component", "importance",
    "abs_importance", "low_freq", "high_freq", "band_type", "track_stem",
    "prediction_score", "freq_band", "low", "high", "type",
}

# the 27 labeled bands across the three presets
# (reference: add_freq_band_from_band_key, run_FBP_features_vis.py:352-423)
_BAND_LABELS = [
    (20, 100), (100, 250), (250, 2000), (2000, 4000), (4000, 8000), (8000, 16000),
    (20, 60), (60, 250), (250, 500), (500, 2000), (4000, 6000), (6000, 12000),
    (12000, 21000), (60, 100), (500, 1000), (1000, 2000), (6000, 8000),
    (8000, 10000), (10000, 12000), (12000, 16000), (16000, 21000),
]


def load_and_prepare_data_full(json_file):
    """fbp_band_features.json → per-(track, band) flattened feature rows."""
    features_df, feature_cols = load_collection_features_json(
        json_file, collection_key="bands", id_col="band_key", meta_key="band_meta",
    )
    if features_df.empty:
        return features_df, feature_cols
    # normalize band keys to the explanations-side form:
    # 'mixture_20.0_100.0Hz' → '20-100Hz' (same three-step transform as the
    # reference, run_FBP_features_vis.py:179 — this is what makes the primary
    # (model, track, band_key) join with load_fbp_bands_explanations exact,
    # including for non-preset custom bands)
    features_df["band_key"] = (
        features_df["band_key"].astype(str)
        .str.replace("mixture_", "", regex=False)
        .str.replace("_", "-", regex=False)
        .str.replace(".0", "", regex=False)
    )
    return features_df, feature_cols


def add_freq_band_from_band_key(features_df):
    """Map band keys to labeled frequency bands across all three presets."""
    df = features_df.copy()
    df["band_key"] = df["band_key"].astype(str)
    conditions, choices = [], []
    for low, high in _BAND_LABELS:
        conditions.append(
            df["band_key"].str.contains(f"{low}.0_{high}.0Hz", case=False, na=False, regex=False)
            | df["band_key"].str.contains(f"{low}-{high}Hz", case=False, na=False, regex=False)
        )
        choices.append(f"{low}-{high} Hz")
    df["freq_band"] = np.select(conditions, choices, default="other")
    return df


def load_fbp_bands_explanations(root_folder: Path) -> pd.DataFrame:
    """FBP results tree → per-(track, band) importance rows with predictions
    (reference: load_fbp_bands_explanations, run_FBP_features_vis.py:198-267)."""
    all_rows = []
    predictions_dict = {}
    fbp_results_path = Path(root_folder) / "fbp_results.json"
    if fbp_results_path.exists():
        with open(fbp_results_path, "r", encoding="utf-8") as f:
            data = json.load(f)
        for model_name, tracks_dict in data.items():
            for track_name, track_data in tracks_dict.items():
                for comp_name, comp_data in track_data.get("components", {}).items():
                    predictions_dict[f"{model_name}_{track_name}_{comp_name}"] = float(
                        comp_data.get("baseline_pred_mean", np.nan)
                    )
        print(f"Loaded {len(predictions_dict)} predictions")
    else:
        print(f"No fbp_results.json in {root_folder}")

    bands_folder = Path(root_folder) / "bands"
    if not bands_folder.exists():
        return pd.DataFrame()
    for model_folder in bands_folder.iterdir():
        if not model_folder.is_dir():
            continue
        for track_folder in model_folder.iterdir():
            if not track_folder.is_dir():
                continue
            for comp_folder in track_folder.iterdir():
                if not comp_folder.is_dir():
                    continue
                json_file = comp_folder / f"{track_folder.name}_bands_metadata.json"
                if not json_file.exists():
                    continue
                pred_score = predictions_dict.get(
                    f"{model_folder.name}_{track_folder.name}_{comp_folder.name}", np.nan
                )
                try:
                    with open(json_file, "r", encoding="utf-8") as f:
                        meta = json.load(f)
                    for band in meta.get("bands", []):
                        all_rows.append(
                            {
                                "model": model_folder.name,
                                "track": track_folder.name,
                                "component": band.get("component", comp_folder.name),
                                "band_key": f"{int(band.get('low', 0))}-{int(band.get('high', 0))}Hz",
                                "low": float(band.get("low", 0)),
                                "high": float(band.get("high", 0)),
                                "importance": float(band.get("importance", 0)),
                                "abs_importance": float(band.get("abs_importance", 0)),
                                "type": band.get("type", "UNKNOWN"),
                                "prediction_score": pred_score,
                            }
                        )
                except Exception as e:  # noqa: BLE001
                    print(f"Error {json_file}: {e}")
    return pd.DataFrame(all_rows)


def _three_row_plot(cdf, feat, band_label, out_file):
    fig, axes = plt.subplots(3, 1, figsize=(14, 10), sharex=True)
    x = np.arange(len(cdf))
    axes[0].plot(x, cdf["prediction_score"].values, marker="o")
    axes[0].set_ylabel("P(fake)")
    axes[0].axhline(0.5, color="red", ls="--", alpha=0.6)
    axes[1].plot(x, cdf["importance"].values, marker="s", color="#d62728")
    axes[1].set_ylabel("FBP importance (Δ)")
    axes[1].axhline(0.0, color="black", lw=0.8)
    axes[2].plot(x, cdf[feat].values, marker="^", color="#2ca02c")
    axes[2].set_ylabel(feat)
    axes[2].set_xlabel("track index")
    for ax in axes:
        ax.grid(alpha=0.3)
    fig.suptitle(f"{band_label}: prediction / FBP importance / {feat}", fontweight="bold")
    plt.tight_layout()
    plt.savefig(out_file, dpi=200, bbox_inches="tight")
    plt.close()


def plot_fbp_predictions_influence_features(
    features_df, fbp_df, output_dir,
    features=("rms_wave_mean", "spectral_centroid_mean", "spectral_flatness_mean"),
):
    """Per band × feature: 3-row prediction/importance/feature line plot."""
    setup_professional_style()
    if fbp_df.empty or features_df.empty:
        print("⚠️  No data for 3-row plots")
        return
    merged = pd.merge(
        features_df, fbp_df[["model", "track", "band_key", "importance", "prediction_score"]],
        on=["model", "track", "band_key"], how="inner", suffixes=("", "_expl"),
    )
    if merged.empty:
        # band_key formats may differ; retry against the freq_band label
        fbp_df2 = add_freq_band_from_band_key(fbp_df)
        merged = pd.merge(
            features_df, fbp_df2[["model", "track", "freq_band", "importance", "prediction_score"]],
            on=["model", "track", "freq_band"], how="inner", suffixes=("", "_expl"),
        )
    if merged.empty:
        print("⚠️  Could not join features with FBP explanations")
        return
    if "importance" not in merged.columns and "importance_expl" in merged.columns:
        merged["importance"] = merged["importance_expl"]
    if "prediction_score" not in merged.columns and "prediction_score_expl" in merged.columns:
        merged["prediction_score"] = merged["prediction_score_expl"]

    out = Path(output_dir) / "pred_importance_feature_lines"
    out.mkdir(parents=True, exist_ok=True)
    for band_label in sorted(merged["freq_band"].unique()):
        bdf = merged[merged["freq_band"] == band_label].sort_values(["model", "track"])
        for feat in features:
            if feat in bdf.columns and bdf[feat].notna().sum() >= 2:
                safe = band_label.replace(" ", "")
                _three_row_plot(bdf, feat, band_label, out / f"{safe}_{feat}_3rows.png")
    print(f"3-row line plots → {out}")


def plot_fbp_3rows_multicolumn(
    features_df, fbp_df, output_dir, features=("rms_wave_mean",)
):
    """Multicolumn variant: one column per band, 3 rows each."""
    setup_professional_style()
    if fbp_df.empty or features_df.empty:
        return
    fbp_df = add_freq_band_from_band_key(fbp_df)
    merged = pd.merge(
        features_df, fbp_df[["model", "track", "freq_band", "importance", "prediction_score"]],
        on=["model", "track", "freq_band"], how="inner", suffixes=("", "_expl"),
    )
    if merged.empty:
        return
    out = Path(output_dir) / "pred_importance_feature_multicolumn"
    out.mkdir(parents=True, exist_ok=True)
    bands = sorted(merged["freq_band"].unique())
    for feat in features:
        if feat not in merged.columns:
            continue
        n = len(bands)
        fig, axes = plt.subplots(3, n, figsize=(4 * n, 10), sharex=False, squeeze=False)
        for ci, band_label in enumerate(bands):
            bdf = merged[merged["freq_band"] == band_label].sort_values(["model", "track"])
            x = np.arange(len(bdf))
            axes[0][ci].plot(x, bdf["prediction_score"].values, marker="o", ms=3)
            axes[0][ci].set_title(band_label, fontsize=10)
            axes[1][ci].plot(x, bdf["importance"].values, marker="s", ms=3, color="#d62728")
            axes[1][ci].axhline(0, color="black", lw=0.6)
            axes[2][ci].plot(x, bdf[feat].values, marker="^", ms=3, color="#2ca02c")
            for r in range(3):
                axes[r][ci].grid(alpha=0.3)
        axes[0][0].set_ylabel("P(fake)")
        axes[1][0].set_ylabel("FBP Δ")
        axes[2][0].set_ylabel(feat)
        fig.suptitle(f"Prediction / FBP importance / {feat} per band", fontweight="bold")
        plt.tight_layout()
        plt.savefig(out / f"{feat}_multicolumn.png", dpi=200, bbox_inches="tight")
        plt.close()
    print(f"Multicolumn plots → {out}")


def viz_component_pos_neg_boxplots(features_df, base_output_folder):
    df = features_df.copy()
    df["band_sign"] = np.where(df.get("importance", 0) >= 0, "POSITIVE", "NEGATIVE")
    grouped_feature_boxplots(
        df, Path(base_output_folder), split_col="band_sign",
        split_values=["POSITIVE", "NEGATIVE"], folder_name="pos_neg_boxplots",
        colors={"POSITIVE": "#2ecc71", "NEGATIVE": "#e74c3c"},
        extra_exclude=_META_COLS | {"band_sign"},
    )


def viz_feature_groups_by_freq_band(features_df, base_output_folder):
    """Feature boxplots split by labeled band (reference's
    viz_feature_groups_by_freq_band family)."""
    bands = sorted(b for b in features_df["freq_band"].unique() if b != "other")
    if not bands:
        return
    grouped_feature_boxplots(
        features_df, Path(base_output_folder), split_col="freq_band",
        split_values=bands, folder_name="feature_groups_by_band",
        extra_exclude=_META_COLS,
    )


def viz_feature_values_vs_importance_by_freq_band(features_df, base_output_folder,
                                                  features=("rms_wave_mean", "spectral_flatness_mean")):
    """Feature-vs-importance scatters per labeled band."""
    setup_professional_style()
    out = Path(base_output_folder) / "feature_vs_importance_by_band"
    out.mkdir(parents=True, exist_ok=True)
    if "importance" not in features_df.columns:
        return
    for band_label in sorted(features_df["freq_band"].unique()):
        bdf = features_df[features_df["freq_band"] == band_label]
        for feat in features:
            if feat not in bdf.columns or bdf[feat].notna().sum() < 3:
                continue
            plt.figure(figsize=(8, 6))
            for model in sorted(bdf["model"].unique()):
                s = bdf[bdf["model"] == model]
                plt.scatter(s[feat], s["importance"], label=model, alpha=0.7,
                            color=PROFESSIONAL_COLORS.get(model))
            plt.axhline(0, color="black", lw=0.8)
            plt.xlabel(feat)
            plt.ylabel("FBP importance (Δ)")
            plt.title(f"{band_label}: {feat} vs importance", fontweight="bold")
            plt.legend(fontsize=8)
            plt.grid(alpha=0.3)
            plt.tight_layout()
            plt.savefig(out / f"{band_label.replace(' ', '')}_{feat}.png", dpi=200, bbox_inches="tight")
            plt.close()
    print(f"Feature-vs-importance scatters → {out}")


def main():
    ap = argparse.ArgumentParser(description="Visualize FBP band features")
    ap.add_argument("--config", default=str(ROOT / "configs/FBP_configs" / "fbp_features_vis.yaml"))
    args = ap.parse_args()
    config = load_yaml(Path(args.config))

    data_cfg = config.get("data", {})
    explanations_cfg = config.get("explanations_data", {})
    output_cfg = config.get("output", {})
    fbp_band_features_cfg = config.get("fbp_band_features", {})
    viz_cfg = config.get("visualizations", {})
    band_version = fbp_band_features_cfg.get("version", "separated")

    data_root = Path(data_cfg.get("features_path"))
    explanations_path = explanations_cfg.get("explanations_path")
    result_root = Path(output_cfg.get("result_path"))

    sub = "separated_bands" if band_version == "separated" else "reversed_separated_bands"
    features_path = data_root / sub / "fbp_bands" / "fbp_band_features.json"
    output_root = result_root / sub / "features_visualization"
    output_root.mkdir(parents=True, exist_ok=True)

    print("=" * 70)
    print(f"Output root: {output_root}")
    print("Visualizing FBP feature importance results")
    print("=" * 70)

    features_df, feats = load_and_prepare_data_full(features_path)
    if features_df.empty:
        return
    print(f"✓ Data loaded: {len(features_df)} samples, {len(feats)} features")
    features_df = add_freq_band_from_band_key(features_df)

    if viz_cfg.get("pos_neg_boxplots", False):
        viz_component_pos_neg_boxplots(features_df, output_root)
    if viz_cfg.get("feature_groups_by_band", False):
        viz_feature_groups_by_freq_band(features_df, output_root)
    if viz_cfg.get("feature_vs_importance", False):
        viz_feature_values_vs_importance_by_freq_band(features_df, output_root)

    if explanations_path:  # same guard as the LIME vis runner
        # walk the results tree ONCE; both 3-row families share the frame
        fbp_df = load_fbp_bands_explanations(Path(explanations_path))
        plot_fbp_predictions_influence_features(
            features_df=features_df, fbp_df=fbp_df, output_dir=output_root
        )
        plot_fbp_3rows_multicolumn(
            features_df=features_df, fbp_df=fbp_df, output_dir=output_root
        )
    else:
        print("⚠️ No explanations_data.explanations_path in config — "
              "skipping prediction-vs-influence families")


if __name__ == "__main__":
    main()
