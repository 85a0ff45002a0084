#!/usr/bin/env python
"""AudioLIME component feature visualization (capability-equivalent to the
reference's scripts/feature_visualizations/run_LIME_features_vis.py): loads
audiolime_component_features.json + explanations.json, and per stem emits
Pearson-r heatmaps vs prediction AND vs LIME influence, per-component
comparison tables vs REAL (the families the reference main() enables), plus
flag-gated pos/neg boxplots and 3-row line plots."""

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
    MODEL_ORDER,
    TYPE_MAPPING,
    build_corr_matrix,
    comparison_table_suite,
    grouped_feature_boxplots,
    load_collection_features_json,
    numeric_feature_cols,
    save_corr_heatmap,
    setup_professional_style,
)

COMPONENTS = ["vocals0", "drums0", "bass0", "other0"]

_META_COLS = {
    "model", "track", "track_id", "component_key", "component_name", "component_type",
    "data_type", "data_type_str", "prediction_score", "predicted_class",
    "vocals0_influence", "drums0_influence", "bass0_influence", "other0_influence",
    "importance", "abs_importance",
}


def load_and_prepare_data_full(json_file):
    """audiolime_component_features.json → per-(track, stem) feature rows."""
    features_df, feature_cols = load_collection_features_json(
        json_file, collection_key="components", id_col="component_key",
        meta_key="component_meta",
    )
    if features_df.empty:
        return features_df, feature_cols
    imp = (
        features_df["importance"].fillna(0.0)
        if "importance" in features_df.columns
        else pd.Series(0.0, index=features_df.index)
    )
    features_df["component_type"] = np.where(imp >= 0, "POSITIVE", "NEGATIVE")
    return features_df, [c for c in feature_cols if c != "component_type"]


def load_audiolime_explanations(json_path: Path) -> pd.DataFrame:
    """explanations.json → long rows per (track, stem) with influences."""
    with open(json_path, "r", encoding="utf-8") as f:
        data = json.load(f)
    rows = []
    for model_name, tracks_dict in data.items():
        for track_key, track_data in tracks_dict.items():
            if not isinstance(track_data, dict):
                continue
            expl = track_data.get("explanations", {})
            comp_inf = expl.get("component_influences", {})
            pred = expl.get("model_prediction", float("nan"))
            for comp_name in COMPONENTS:
                rows.append(
                    {
                        "model": model_name,
                        "track": track_key,
                        "track_id": track_data.get("track_id"),
                        "component_name": comp_name,
                        "prediction_score": float(pred) if pred is not None else float("nan"),
                        "predicted_class": expl.get("predicted_class"),
                        f"{comp_name}_influence": float(comp_inf.get(comp_name, float("nan"))),
                    }
                )
    lime_df = pd.DataFrame(rows)
    print(f"AudioLIME explanations: {len(lime_df)} rows")
    return lime_df


def merge_features_with_explanations(features_df, lime_json_path):
    """Features ⋈ explanations on (model, track, stem) — done ONCE in main()
    and the merged frame passed to every plot family (the reference re-reads
    and re-merges per family; on the 1-core host that is 4× the same work)."""
    lime_df = load_audiolime_explanations(lime_json_path)
    full_df = pd.merge(features_df, lime_df, on=["model", "track", "component_name"], how="inner")
    if not full_df.empty:
        full_df["data_type_str"] = full_df["model"].map(TYPE_MAPPING).fillna("GENERATED")
    return full_df


def plot_feature_correlation_r_heatmaps(full_df, comp_version, outputdir, model_order=None):
    """Per stem × feature group: r vs P(fake) and r vs LIME influence."""
    from adx_tpu.viz.feature_vis_common import assign_feature_group

    setup_professional_style()
    model_order = model_order or MODEL_ORDER
    if full_df.empty:
        print("⚠️  Merged DataFrame is empty.")
        return

    feature_cols = numeric_feature_cols(full_df, _META_COLS)
    feat_to_group = {c: assign_feature_group(c) for c in feature_cols}
    root_out = Path(outputdir) / "correlation_r_heatmaps"
    root_out.mkdir(parents=True, exist_ok=True)

    for comp in COMPONENTS:
        comp_name = comp.replace("0", "")
        cdf = full_df[full_df["component_name"] == comp].reset_index(drop=True)
        if cdf.empty:
            continue
        group_defs = {
            "all": pd.Series(True, index=cdf.index),
            "generated": cdf["data_type_str"] == "GENERATED",
            "real": cdf["data_type_str"] == "REAL",
            **{m: cdf["model"] == m for m in model_order if m in cdf["model"].unique()},
        }
        for feat_group in sorted(set(feat_to_group.values())):
            grp_feats = [
                c for c, g in feat_to_group.items() if g == feat_group and cdf[c].notna().sum() >= 3
            ]
            if not grp_feats:
                continue
            grp_dir = root_out / comp_name / feat_group
            grp_dir.mkdir(parents=True, exist_ok=True)
            rdf = build_corr_matrix(cdf, grp_feats, "prediction_score", group_defs)
            save_corr_heatmap(
                rdf, f"{comp_name} / {feat_group} – r vs Prediction P(fake)",
                grp_dir / f"{comp_name}_{feat_group}_r_vs_prediction.png",
            )
            infl_col = f"{comp}_influence"
            if infl_col in cdf.columns:
                rdf2 = build_corr_matrix(cdf, grp_feats, infl_col, group_defs)
                save_corr_heatmap(
                    rdf2, f"{comp_name} / {feat_group} – r vs LIME influence",
                    grp_dir / f"{comp_name}_{feat_group}_r_vs_lime_influence.png",
                )
    print(f"Correlation heatmaps → {root_out}")


def plot_feature_comparison_table(full_df, comp_version, outputdir):
    """Per-stem dark comparison tables vs the REAL baseline."""
    if full_df.empty:
        print("⚠️  Merged DataFrame is empty.")
        return
    full_df = full_df.rename(columns={"predicted_class_x": "pred_label"})
    if "pred_label" not in full_df.columns and "predicted_class" in full_df.columns:
        full_df["pred_label"] = full_df["predicted_class"]
    root_out = Path(outputdir) / "comparison_tables"
    for comp in COMPONENTS:
        comp_name = comp.replace("0", "")
        cdf = full_df[full_df["component_name"] == comp].reset_index(drop=True)
        if cdf.empty:
            continue
        comparison_table_suite(
            cdf, root_out / comp_name, title_prefix=f"LIME {comp_name.upper()}",
            # the LIME reference uses the FIXED column spacing
            # (run_LIME_features_vis.py:1847: w * (0.99 / tot_w * tot_w)),
            # unlike the overall family's double-division quirk
            spacing_quirk=False,
            # keep numeric LIME metadata (importance/influences/track_id) out
            # of the feature rows, like the reference's exclusion list
            extra_exclude=_META_COLS,
        )


def viz_component_pos_neg_boxplots(features_df, base_output_folder):
    """Feature boxplots split by POSITIVE/NEGATIVE LIME influence per stem."""
    if "component_name" not in features_df.columns:
        return
    for comp in COMPONENTS:
        cdf = features_df[features_df["component_name"] == comp]
        if cdf.empty:
            continue
        grouped_feature_boxplots(
            cdf, Path(base_output_folder) / comp.replace("0", ""),
            split_col="component_type", split_values=["POSITIVE", "NEGATIVE"],
            folder_name="pos_neg_boxplots",
            colors={"POSITIVE": "#2ecc71", "NEGATIVE": "#e74c3c"},
            extra_exclude=_META_COLS,
        )


def viz_feature_groups_by_component(features_df, base_output_folder):
    """Feature boxplots split by stem (reference's
    viz_feature_groups_by_component family)."""
    if "component_name" not in features_df.columns:
        return
    present = set(features_df["component_name"].unique())
    comps = [c for c in COMPONENTS if c in present]
    if not comps:
        return
    grouped_feature_boxplots(
        features_df, Path(base_output_folder), split_col="component_name",
        split_values=comps, folder_name="feature_groups_by_component",
        extra_exclude=_META_COLS,
    )


def plot_audiolime_predictions_influence_features(full_df, outputdir,
                                                  features=("rms_wave_mean", "spectral_centroid_mean")):
    """3-row line plots per stem: prediction / influence / feature value vs
    track index (reference's plot_audiolime_predictions_influence_features)."""
    if full_df.empty:
        return
    out = Path(outputdir) / "pred_influence_feature_lines"
    out.mkdir(parents=True, exist_ok=True)
    for comp in COMPONENTS:
        cdf = full_df[full_df["component_name"] == comp].sort_values(["model", "track"])
        if cdf.empty:
            continue
        infl_col = f"{comp}_influence"
        for feat in features:
            if feat not in cdf.columns:
                continue
            fig, axes = plt.subplots(3, 1, figsize=(14, 10), sharex=True)
            x = np.arange(len(cdf))
            axes[0].plot(x, cdf["prediction_score"].values, marker="o")
            axes[0].set_ylabel("P(fake)")
            axes[0].axhline(0.5, color="red", ls="--", alpha=0.6)
            axes[1].plot(x, cdf[infl_col].values, marker="s", color="#d62728")
            axes[1].set_ylabel("LIME influence")
            axes[1].axhline(0.0, color="black", lw=0.8)
            axes[2].plot(x, cdf[feat].values, marker="^", color="#2ca02c")
            axes[2].set_ylabel(feat)
            axes[2].set_xlabel("track index")
            for ax in axes:
                ax.grid(alpha=0.3)
            fig.suptitle(f"{comp}: prediction / influence / {feat}", fontweight="bold")
            plt.tight_layout()
            plt.savefig(out / f"{comp}_{feat}_3rows.png", dpi=200, bbox_inches="tight")
            plt.close()
    print(f"3-row line plots → {out}")


def plot_audiolime_3rows_multicolumn(full_df, outputdir,
                                     features=("rms_wave_mean", "spectral_centroid_mean")):
    """Multicolumn variant of the 3-row plots: one figure per feature with a
    column per stem (reference's multicolumn family,
    run_LIME_features_vis.py:454-545)."""
    if full_df.empty:
        return
    out = Path(outputdir) / "pred_influence_feature_lines_multicolumn"
    out.mkdir(parents=True, exist_ok=True)
    comps = [c for c in COMPONENTS if c in full_df["component_name"].unique()]
    if not comps:
        return
    for feat in features:
        if feat not in full_df.columns:
            continue
        fig, axes = plt.subplots(3, len(comps), figsize=(5 * len(comps), 10),
                                 sharex="col", squeeze=False)
        for j, comp in enumerate(comps):
            cdf = full_df[full_df["component_name"] == comp].sort_values(["model", "track"])
            x = np.arange(len(cdf))
            axes[0][j].plot(x, cdf["prediction_score"].values, marker="o")
            axes[0][j].axhline(0.5, color="red", ls="--", alpha=0.6)
            axes[0][j].set_title(comp.replace("0", ""), fontweight="bold")
            axes[1][j].plot(x, cdf[f"{comp}_influence"].values, marker="s", color="#d62728")
            axes[1][j].axhline(0.0, color="black", lw=0.8)
            axes[2][j].plot(x, cdf[feat].values, marker="^", color="#2ca02c")
            axes[2][j].set_xlabel("track index")
            for i in range(3):
                axes[i][j].grid(alpha=0.3)
        axes[0][0].set_ylabel("P(fake)")
        axes[1][0].set_ylabel("LIME influence")
        axes[2][0].set_ylabel(feat)
        fig.suptitle(f"Prediction / influence / {feat} per stem", fontweight="bold")
        plt.tight_layout()
        plt.savefig(out / f"{feat}_3rows_multicolumn.png", dpi=200, bbox_inches="tight")
        plt.close()
    print(f"Multicolumn 3-row plots → {out}")


def main():
    ap = argparse.ArgumentParser(description="Visualize AudioLIME component features")
    ap.add_argument("--config", default=str(ROOT / "configs/AudioLIME_configs" / "lime_features_vis.yaml"))
    args = ap.parse_args()
    config = load_yaml(Path(args.config))

    data_cfg = config.get("data", {})
    explanations_cfg = config.get("explanations_data", {})
    output_cfg = config.get("output", {})
    lime_comp_features_cfg = config.get("lime_comp_features", {})
    viz_cfg = config.get("visualizations", {})
    comp_version = lime_comp_features_cfg.get("version", "separated")

    data_root = Path(data_cfg.get("features_path"))
    explanations_path = explanations_cfg.get("explanations_path")
    result_root = Path(output_cfg.get("result_path"))

    sub = "separated_components" if comp_version == "separated" else "reversed_separated_components"
    # Deliberate deviation: with the reference's committed configs the
    # extractor writes <lime_features>/<sub>/audiolime_component_features.json
    # (run_lime_features.py:57) while this visualizer reads
    # <features_path>/<sub>/lime_components/... (run_LIME_features_vis.py:
    # 2166-2167) — the chain is broken as committed. Accept both layouts,
    # preferring the reference-vis path when it exists.
    candidates = [
        data_root / sub / "lime_components" / "audiolime_component_features.json",
        data_root / sub / "audiolime_component_features.json",
    ]
    features_path = next((p for p in candidates if p.exists()), candidates[0])
    output_root = result_root / sub / "features_visualization"
    output_root.mkdir(parents=True, exist_ok=True)

    print("=" * 70)
    print(f"Output root: {output_root}")
    print("Visualizing AudioLIME component feature importance results")
    print("=" * 70)

    features_df, _ = load_and_prepare_data_full(features_path)
    if features_df.empty:
        return

    if viz_cfg.get("pos_neg_boxplots", False):
        viz_component_pos_neg_boxplots(features_df, output_root)
    if viz_cfg.get("feature_groups_by_component", False):
        viz_feature_groups_by_component(features_df, output_root)

    if explanations_path:
        explanations_path = Path(explanations_path) / "explanations.json"
        full_df = merge_features_with_explanations(features_df, explanations_path)
        if viz_cfg.get("pred_influence_feature_lines", False):
            plot_audiolime_predictions_influence_features(full_df, output_root)
        if viz_cfg.get("pred_influence_multicolumn", False):
            plot_audiolime_3rows_multicolumn(full_df, output_root)
        plot_feature_correlation_r_heatmaps(
            full_df, comp_version=comp_version, outputdir=output_root,
        )
        plot_feature_comparison_table(
            full_df, comp_version=comp_version, outputdir=output_root,
        )


if __name__ == "__main__":
    main()
