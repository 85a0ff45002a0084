"""Shared machinery for the four feature-visualization report families
(reference: scripts/feature_visualizations/* — ~8k LoC with 4×-duplicated
helpers, consolidated here): feature-dict flattening, stat-suffix grouping,
semantic feature groups, Pearson-r heatmaps, and the dark comparison tables
with %-deviation coloring against the REAL baseline."""

from __future__ import annotations

import re
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import seaborn as sns

from adx_tpu.viz.predictions_viz import setup_professional_style

MODEL_ORDER = ["ElevenLabs", "REAL", "SUNO", "SUNO_PRO", "UDIO"]

TYPE_MAPPING = {
    "ElevenLabs": "GENERATED",
    "REAL": "REAL",
    "SUNO": "GENERATED",
    "SUNO_PRO": "GENERATED",
    "UDIO": "GENERATED",
}

# full-saturation per-model palette for scatters/lines/markers
# (reference: run_overall_features_vis.py:23-29 PROFESSIONAL_COLORS; the
# per-model scatter families use it, e.g. run_FBP_features_vis.py:1530)
PROFESSIONAL_COLORS = {
    "ElevenLabs": "#ff7f0e",
    "REAL": "#1f77b4",
    "SUNO": "#2ca02c",
    "SUNO_PRO": "#d62728",
    "UDIO": "#9467bd",
}

# pastel palette for boxplot FACES only
# (reference: run_overall_features_vis.py:31-38, applied at :638)
BOX_FILL_COLORS = {
    "ElevenLabs": "#ffbb78",
    "REAL": "#aec7e8",
    "SUNO": "#98df8a",
    "SUNO_PRO": "#ff9896",
    "UDIO": "#c5b0d5",
}

FEATURE_GROUPS_DEF = {
    "Signal_energy": ["rms_"],
    "Frequency_spectrum": ["spectral_"],
    "Fundamental_Frequency_Pitch": ["f0_", "intonation_"],
    "Jitter_Shimmer": ["jitter_", "shimmer_"],
    "Vocal_quality": ["hnr", "voice_breaks", "breath_count"],
    "Rhythm_and_temporal_features": ["zero_crossing_rate", "rhythm_"],
}

# dark comparison-table palette (reference: run_overall_features_vis.py:1336-1346)
TBL_BG = "#0e1117"
TBL_HEADER_BG = "#1a1d27"
TBL_ROW_ALT_BG = "#13161f"
TBL_TEXT = "#d0d0d0"
TBL_HEADER_TXT = "#7a8099"
TBL_POS_STRONG = "#ff6b35"
TBL_POS_MEDIUM = "#e8943a"
TBL_NEG_STRONG = "#2ecc71"
TBL_NEG_MEDIUM = "#27ae60"
TBL_NEAR_ZERO = "#8899aa"

_STAT_SUFFIX = re.compile(r"_(mean|std|min|max)$")


def flatten_feature(feat_dict: dict, prefix: str = "") -> dict:
    """Nested feature dict → flat ``{name}_{stat}`` columns
    (reference: run_overall_features_vis.py:80-113)."""
    result = {}
    for key, val in feat_dict.items():
        col_name = f"{prefix}_{key}" if prefix else key
        if isinstance(val, dict):
            stats_keys = {"min", "mean", "std", "max"}
            if stats_keys.intersection(val.keys()):
                for stat_name, stat_val in val.items():
                    result[f"{col_name}_{stat_name}"] = (
                        float(stat_val) if isinstance(stat_val, (int, float)) else np.nan
                    )
            else:
                result.update(flatten_feature(val, prefix=col_name))
        elif isinstance(val, list):
            if len(val) > 0 and all(isinstance(x, (int, float)) for x in val):
                result[f"{col_name}_mean"] = float(np.mean(val))
                result[f"{col_name}_min"] = float(np.min(val))
                result[f"{col_name}_max"] = float(np.max(val))
                result[f"{col_name}_std"] = float(np.std(val)) if len(val) > 1 else 0.0
        elif isinstance(val, bool):
            result[col_name] = val
        elif isinstance(val, (int, float)):
            result[col_name] = float(val)
        elif isinstance(val, str):
            result[col_name] = val
    return result


def load_collection_features_json(
    json_file,
    collection_key: str,
    id_col: str,
    meta_key: str,
):
    """Shared loader for the three per-item feature JSONs
    (``occlusion_patches_features.json`` patches / ``fbp_band_features.json``
    bands / ``audiolime_component_features.json`` components): model → track →
    ``collection_key`` items, each flattened from its ``meta_key`` dict plus
    its ``features`` dict into one row. Returns ``(DataFrame, feature_cols)``.
    """
    import json

    with open(json_file, "r", encoding="utf-8") as f:
        data = json.load(f)
    all_rows = []
    for model_name, tracks_dict in data.items():
        for track_key, track_data in tracks_dict.items():
            if not isinstance(track_data, dict) or collection_key not in track_data:
                continue
            for item_key, item_data in track_data.get(collection_key, {}).items():
                if not isinstance(item_data, dict) or "features" not in item_data:
                    continue
                row = {
                    "model": model_name,
                    "track": track_key,
                    id_col: item_key,
                    "data_type": TYPE_MAPPING.get(model_name, model_name),
                }
                row.update(flatten_feature(item_data.get(meta_key, {})))
                row.update(flatten_feature(item_data.get("features", {})))
                all_rows.append(row)
    features_df = pd.DataFrame(all_rows)
    if features_df.empty:
        print("⚠️ Warning: No data loaded from JSON file!")
        return features_df, []
    exclude = {"model", "track", id_col, "data_type"}
    feature_cols = [c for c in features_df.columns if c not in exclude]
    print(f"✅ Loaded {len(features_df)} {collection_key} rows, {len(feature_cols)} features")
    return features_df, feature_cols


def assign_feature_group(col: str, groups: Optional[dict] = None) -> str:
    for group, prefixes in (groups or FEATURE_GROUPS_DEF).items():
        for prefix in prefixes:
            if col.startswith(prefix):
                return group
    return "other"


def numeric_feature_cols(df: pd.DataFrame, exclude: set) -> List[str]:
    return [
        c
        for c in df.columns
        if c not in exclude and pd.api.types.is_numeric_dtype(df[c]) and df[c].notna().sum() > 0
    ]


def build_feature_groups(df: pd.DataFrame, extra_exclude=None) -> Dict[str, list]:
    """Group columns by base name with stat suffixes
    (reference: run_overall_features_vis.py:296-333)."""
    base_exclude = {
        "model", "track_id", "track_stem", "data_type", "prediction_score",
        "pred_label", "true_label", "is_correct", "outcome",
    }
    exclude_cols = base_exclude.union(extra_exclude or set())
    all_cols = numeric_feature_cols(df, exclude_cols)
    feature_groups = defaultdict(list)
    for col in all_cols:
        parts = col.split("_")
        if len(parts) > 1 and parts[-1] in ["min", "mean", "std", "max"]:
            feature_groups["_".join(parts[:-1])].append((col, parts[-1]))
        else:
            feature_groups[col].append((col, "single"))
    return feature_groups


# ---------------------------------------------------------------------------
# Pearson-r heatmaps
# ---------------------------------------------------------------------------


def build_corr_matrix(df, feature_cols, target_col, groups_bool) -> pd.DataFrame:
    """Per-group Pearson r of each feature vs the target, sorted by family
    importance (reference: _build_corr_matrix_overall)."""
    stat_order = {"mean": 0, "std": 1, "min": 2, "max": 3}
    rdict = {}
    for label, mask in groups_bool.items():
        gdf = df[mask]
        rvals = {}
        for feat in feature_cols:
            sub = gdf[[feat, target_col]].dropna()
            rvals[feat] = sub[feat].corr(sub[target_col]) if len(sub) >= 3 else np.nan
        rdict[label] = rvals
    rdf = pd.DataFrame(rdict).dropna(how="all")
    if rdf.empty:
        return rdf

    def _base(c):
        return _STAT_SUFFIX.sub("", c)

    def _rank(c):
        m = _STAT_SUFFIX.search(c)
        return stat_order.get(m.group(1), 99) if m else -1

    rdf["_base"] = [_base(c) for c in rdf.index]
    rdf["_bimp"] = (
        rdf.drop(columns=["_base"]).abs().max(axis=1).groupby(rdf["_base"]).transform("max")
    )
    rdf["_rank"] = [_rank(c) for c in rdf.index]
    rdf = rdf.sort_values(["_bimp", "_base", "_rank"], ascending=[False, True, True]).drop(
        columns=["_base", "_bimp", "_rank"]
    )
    return rdf


def save_corr_heatmap(rdf: pd.DataFrame, title: str, out_file: Path):
    if rdf.empty:
        print(f"  [SKIP] Empty matrix → {Path(out_file).name}")
        return
    n_feats, n_cols = len(rdf), len(rdf.columns)
    fig, ax = plt.subplots(figsize=(max(10, n_cols * 1.6), max(4, n_feats * 0.42 + 2.5)))
    sns.heatmap(
        rdf, ax=ax, cmap="coolwarm", vmin=-1, vmax=1, annot=True, fmt=".2f",
        linewidths=0.4, linecolor="#dddddd", mask=rdf.isnull(),
        cbar_kws={"label": "Pearson r", "shrink": 0.6},
        annot_kws={"size": 8, "weight": "bold"},
    )
    ax.patch.set_facecolor("#f0f0f0")
    ax.set_title(title, fontsize=13, fontweight="bold", pad=14)
    ax.set_xlabel("Group", fontsize=11, fontweight="bold")
    ax.set_ylabel("Feature", fontsize=11, fontweight="bold")
    ax.tick_params(axis="x", rotation=30, labelsize=10)
    ax.tick_params(axis="y", labelsize=8)
    plt.tight_layout()
    plt.savefig(out_file, dpi=300, bbox_inches="tight", facecolor="white")
    plt.close()
    print(f"  Saved: {Path(out_file).name}")


def correlation_heatmap_suite(
    df: pd.DataFrame,
    output_dir: Path,
    target_col: str,
    exclude: set,
    suffix: str,
    model_order: Optional[list] = None,
    group_defs_extra: Optional[dict] = None,
):
    """Per-semantic-group + all-features r heatmaps against ``target_col``."""
    setup_professional_style()
    sns.set_theme(style="whitegrid")
    model_order = model_order or MODEL_ORDER
    root_out = Path(output_dir)
    root_out.mkdir(parents=True, exist_ok=True)
    if target_col not in df.columns:
        print(f'[WARN] Column "{target_col}" not found → skipping heatmaps')
        return

    feat_cols = numeric_feature_cols(df, exclude | {target_col})
    feat_to_grp = {c: assign_feature_group(c) for c in feat_cols}

    group_defs = {"all": pd.Series(True, index=df.index)}
    if "data_type" in df.columns:
        group_defs["generated"] = df["data_type"] == "GENERATED"
        group_defs["real"] = df["data_type"] == "REAL"
    if "model" in df.columns:
        group_defs.update(
            {m: df["model"] == m for m in model_order if m in df["model"].unique()}
        )
    if group_defs_extra:
        group_defs.update(group_defs_extra)

    for feat_group in sorted(set(feat_to_grp.values())):
        grp_feats = [
            c for c, g in feat_to_grp.items() if g == feat_group and df[c].notna().sum() >= 3
        ]
        if not grp_feats:
            continue
        grp_dir = root_out / feat_group
        grp_dir.mkdir(parents=True, exist_ok=True)
        rdf = build_corr_matrix(df, grp_feats, target_col, group_defs)
        save_corr_heatmap(
            rdf, f"{feat_group}  –  Pearson r vs {suffix}",
            grp_dir / f"{feat_group}_r_vs_{suffix.replace(' ', '_')}.png",
        )

    all_feats = [c for c in feat_cols if df[c].notna().sum() >= 3]
    rdf_all = build_corr_matrix(df, all_feats, target_col, group_defs)
    if not rdf_all.empty and "all" in rdf_all.columns:
        rdf_all = rdf_all.reindex(rdf_all["all"].abs().sort_values(ascending=False).index)
    save_corr_heatmap(
        rdf_all, f"All features  –  Pearson r vs {suffix}",
        root_out / f"all_features_r_vs_{suffix.replace(' ', '_')}.png",
    )
    print(f"Correlation heatmaps → {root_out}")


# ---------------------------------------------------------------------------
# Dark comparison tables vs REAL baseline
# ---------------------------------------------------------------------------


def _tbl_fmt_value(v):
    if pd.isna(v):
        return ""
    a = abs(v)
    if a == 0:
        return "0"
    if a >= 1000:
        return f"{v:,.0f}"
    if a >= 10:
        return f"{v:.2f}"
    if a >= 1:
        return f"{v:.3f}"
    if a >= 0.001:
        return f"{v:.4f}"
    return f"{v:.2e}"


def _tbl_fmt_pct(pct):
    if pd.isna(pct) or abs(pct) < 5:
        return ""
    return f"{'+' if pct > 0 else ''}{pct:.0f}%"


def _tbl_pct_color(pct):
    if pd.isna(pct) or abs(pct) < 5:
        return TBL_NEAR_ZERO
    if pct > 0:
        return TBL_POS_STRONG if abs(pct) >= 30 else TBL_POS_MEDIUM
    return TBL_NEG_STRONG if abs(pct) >= 30 else TBL_NEG_MEDIUM


def draw_comparison_table(
    feat_list, real_vals, means_v, pct_df, sources, title_str, out_file,
    figsize_w: float = 14.0, row_height: float = 0.40, dpi: int = 180,
    col_header_colors: Optional[dict] = None, strip_stat_suffix: bool = True,
    baseline_label: str = "REAL", spacing_quirk: bool = True,
):
    """Dark-themed PNG table: rows = features, columns = baseline + sources,
    cells colored by % deviation from the baseline.

    ``spacing_quirk=True`` reproduces the overall-family reference's
    column spacing, which divides the already-normalized width by
    ``tot_w`` AGAIN (run_overall_features_vis.py:1545) — compressing wide
    tables so cells overlap. The LIME family's reference uses the fixed
    form ``w * 0.99`` (run_LIME_features_vis.py:1847), so LIME callers
    pass False.
    """
    import matplotlib.patches as mpatches

    n_rows = len(feat_list)
    n_cols = 2 + len(sources)
    fig_h = max(4.0, n_rows * row_height + 1.8)
    fig = plt.figure(figsize=(figsize_w, fig_h), facecolor=TBL_BG)
    ax = fig.add_axes([0, 0, 1, 1])
    ax.set_facecolor(TBL_BG)
    ax.axis("off")

    col_labels = ["FEATURE", baseline_label] + list(sources)
    raw_widths = [0.30] + [0.12] * (n_cols - 1)
    tot_w = sum(raw_widths)
    col_widths = [w / tot_w for w in raw_widths]
    col_lefts = []
    x = 0.01
    for w in col_widths:
        col_lefts.append(x)
        x += w * 0.99 / tot_w if spacing_quirk else w * 0.99

    def cell(r_idx, c_idx, text, color=TBL_TEXT, bg=TBL_BG, fs=8.5, bold=False, align="right"):
        x0, cw = col_lefts[c_idx], col_widths[c_idx]
        y0 = 1.0 - (r_idx + 1) * (1.0 / (n_rows + 2))
        ch = 1.0 / (n_rows + 2)
        ax.add_patch(
            mpatches.FancyBboxPatch(
                (x0, y0), cw, ch, boxstyle="square,pad=0", linewidth=0,
                facecolor=bg, transform=ax.transAxes, clip_on=False,
            )
        )
        tx = x0 + cw * 0.95 if align == "right" else x0 + cw * 0.05
        ax.text(
            tx, y0 + ch * 0.5, text, color=color, fontsize=fs, ha=align, va="center",
            fontweight="bold" if bold else "normal", transform=ax.transAxes,
            clip_on=False, fontfamily="monospace",
        )

    for ci, lbl in enumerate(col_labels):
        hdr_color = (col_header_colors or {}).get(lbl, TBL_HEADER_TXT)
        cell(0, ci, str(lbl).upper().replace("_", " "), color=hdr_color, bg=TBL_HEADER_BG,
             fs=8, bold=True, align="left" if ci == 0 else "right")

    for ri, feat in enumerate(feat_list, start=1):
        row_bg = TBL_ROW_ALT_BG if ri % 2 == 0 else TBL_BG
        disp = _STAT_SUFFIX.sub("", feat) if strip_stat_suffix else feat
        disp = disp.replace("_", " ").title()
        cell(ri, 0, disp, color=TBL_TEXT, bg=row_bg, align="left")
        real_v = real_vals[feat] if feat in real_vals.index else np.nan
        cell(ri, 1, _tbl_fmt_value(real_v), color=TBL_TEXT, bg=row_bg)
        for si, src in enumerate(sources):
            sv = means_v.loc[src, feat] if src in means_v.index else np.nan
            pct = pct_df.loc[feat, src] if src in pct_df.columns else np.nan
            cell(ri, 2 + si, f"{_tbl_fmt_value(sv)} {_tbl_fmt_pct(pct)}",
                 color=_tbl_pct_color(pct), bg=row_bg)

    ax.text(0.01, 0.995, title_str, color="#aabbcc", fontsize=9.5, fontweight="bold",
            ha="left", va="top", transform=ax.transAxes, fontfamily="monospace")

    legend = [
        (TBL_POS_STRONG, "≥+30%"), (TBL_POS_MEDIUM, "+15-30%"), (TBL_NEAR_ZERO, "≈0%"),
        (TBL_NEG_MEDIUM, "−15-30%"), (TBL_NEG_STRONG, "≥−30%"),
    ]
    ax.text(0.01, 0.008, f"Deviation from {baseline_label}: ", color=TBL_HEADER_TXT,
            fontsize=7, ha="left", va="bottom", transform=ax.transAxes)
    lx = 0.17
    for col, lbl in legend:
        ax.text(lx, 0.008, f" {lbl}", color=col, fontsize=7, ha="left", va="bottom",
                transform=ax.transAxes, fontfamily="monospace")
        lx += 0.10

    plt.savefig(out_file, dpi=dpi, bbox_inches="tight", facecolor=TBL_BG, edgecolor="none")
    plt.close()
    print(f"  Saved: {Path(out_file).name}")


def pct_vs_baseline(means: pd.DataFrame, real_vals: pd.Series, sources, feat_cols):
    """% deviation of each source's mean from the baseline means."""
    with np.errstate(divide="ignore", invalid="ignore"):
        return pd.DataFrame(
            {
                src: np.where(
                    real_vals[feat_cols] != 0,
                    (means.loc[src, feat_cols] - real_vals[feat_cols])
                    / real_vals[feat_cols].abs() * 100,
                    np.nan,
                )
                if src in means.index
                else np.full(len(feat_cols), np.nan)
                for src in sources
            },
            index=feat_cols,
        )


def comparison_table_suite(
    df: pd.DataFrame,
    output_dir: Path,
    model_order: Optional[list] = None,
    feature_groups: Optional[dict] = None,
    multi_stat_groups: Optional[list] = None,
    sort_by_deviation: bool = True,
    title_prefix: str = "OVERALL",
    spacing_quirk: bool = True,
    extra_exclude=None,
):
    """Per-semantic-group dark comparison tables vs REAL, with by-prediction
    and by-sample-type decompositions (reference: plot_overall_comparison_table).

    ``extra_exclude``: additional metadata columns to keep out of the feature
    rows — the LIME family passes its numeric LIME metadata (importance,
    influences, track_id) here, matching the reference's exclusion list
    (run_LIME_features_vis.py:1986-1992)."""
    setup_professional_style()
    model_order = model_order or MODEL_ORDER
    feature_groups = feature_groups or FEATURE_GROUPS_DEF
    multi_stat_groups = multi_stat_groups if multi_stat_groups is not None else ["Frequency_spectrum"]

    root_out = Path(output_dir)
    root_out.mkdir(parents=True, exist_ok=True)

    meta_cols = {
        "model", "track_id", "track_id_pred", "track_stem", "data_type",
        "prediction_score", "pred_label", "true_label", "is_correct", "outcome",
    } | set(extra_exclude or ())
    all_feat_cols = [
        c for c in df.columns if c not in meta_cols and pd.api.types.is_numeric_dtype(df[c])
    ]
    means = df.groupby("model")[all_feat_cols].mean()
    if "REAL" not in means.index:
        print('[WARN] Baseline "REAL" not found → skipping comparison tables')
        return
    real_vals = means.loc["REAL"]
    sources = [m for m in model_order if m in means.index and m != "REAL"]
    pct_df_full = pct_vs_baseline(means, real_vals, sources, all_feat_cols)

    valid = real_vals.dropna().index
    real_vals = real_vals.loc[valid]
    means_v = means[valid]
    pct_df_full = pct_df_full.loc[valid]

    def _pred_split(feat_cols):
        if "pred_label" not in df.columns:
            return pd.DataFrame(), [], {}
        compound, col_colors, rows = [], {}, {}
        for src in sources:
            src_df = df[df["model"] == src]
            for pred_lbl, color in [("Real", TBL_NEG_MEDIUM), ("Fake", TBL_POS_STRONG)]:
                key = f"{src} {pred_lbl}"
                compound.append(key)
                col_colors[key] = color
                subset = src_df[src_df["pred_label"] == pred_lbl]
                rows[key] = (
                    subset[feat_cols].mean() if not subset.empty else pd.Series(np.nan, index=feat_cols)
                )
        return pd.DataFrame(rows).T, compound, col_colors

    def _type_split(feat_cols):
        masks = {"GENERATED": df["data_type"] == "GENERATED"}
        colors = {"GENERATED": TBL_HEADER_TXT}
        if "pred_label" in df.columns:
            masks["GEN → pred Real"] = (df["data_type"] == "GENERATED") & (df["pred_label"] == "Real")
            masks["GEN → pred Fake"] = (df["data_type"] == "GENERATED") & (df["pred_label"] == "Fake")
            colors["GEN → pred Real"] = TBL_NEG_MEDIUM
            colors["GEN → pred Fake"] = TBL_POS_STRONG
        rows = {
            label: (df[mask][feat_cols].mean() if mask.any() else pd.Series(np.nan, index=feat_cols))
            for label, mask in masks.items()
        }
        mv = pd.DataFrame(rows).T
        return mv, pct_vs_baseline(mv, real_vals, list(masks), feat_cols), list(masks), colors

    def _emit(feat_list, grp_dir, name, title, strip=True):
        if sort_by_deviation:
            feat_list = list(
                pct_df_full.loc[feat_list].abs().max(axis=1).sort_values(ascending=False).index
            )
        draw_comparison_table(
            feat_list, real_vals, means_v, pct_df_full, sources, title,
            grp_dir / f"{name}.png", strip_stat_suffix=strip,
            spacing_quirk=spacing_quirk,
        )
        ms, cs, chc = _pred_split(feat_list)
        if not ms.empty:
            draw_comparison_table(
                feat_list, real_vals, ms, pct_vs_baseline(ms, real_vals, cs, feat_list), cs,
                f"{title} – decomposition by prediction", grp_dir / f"{name}_by_pred.png",
                figsize_w=14.0 * 1.6, col_header_colors=chc, strip_stat_suffix=strip,
                spacing_quirk=spacing_quirk,
            )
        if "data_type" in df.columns:
            tv_means, tv_pct, tv_sources, tv_colors = _type_split(feat_list)
            draw_comparison_table(
                feat_list, real_vals, tv_means, tv_pct, tv_sources,
                f"{title} – sample type vs REAL", grp_dir / f"{name}_by_type.png",
                col_header_colors=tv_colors, strip_stat_suffix=strip,
                spacing_quirk=spacing_quirk,
            )

    for grp in list(feature_groups.keys()) + ["other"]:
        grp_feats = [c for c in valid if assign_feature_group(c, feature_groups) == grp]
        if not grp_feats:
            continue
        grp_dir = root_out / grp.replace(" ", "")
        grp_dir.mkdir(parents=True, exist_ok=True)
        if grp in multi_stat_groups:
            for stat in ["mean", "std", "min", "max"]:
                stat_feats = [c for c in grp_feats if c.endswith(f"_{stat}")]
                if stat_feats:
                    _emit(
                        stat_feats, grp_dir, f"{grp}_{stat}",
                        f"{title_prefix}  {grp} [{stat.upper()}]  –  mean vs baseline REAL",
                    )
        else:
            _emit(grp_feats, grp_dir, grp, f"{title_prefix}  {grp}  –  mean vs baseline REAL",
                  strip=False)

    _emit(list(valid), root_out, "all_features",
          f"{title_prefix}  All features  –  mean vs baseline REAL", strip=False)
    print(f"Comparison tables → {root_out}")


# ---------------------------------------------------------------------------
# Boxplot families
# ---------------------------------------------------------------------------


def grouped_feature_boxplots(
    df: pd.DataFrame,
    output_root: Path,
    split_col: str,
    split_values: List[str],
    panel2_col: Optional[str] = None,
    panel2_values: Optional[List[str]] = None,
    folder_name: str = "boxplots",
    colors: Optional[dict] = None,
    extra_exclude=None,
):
    """Per-feature two-panel boxplots: values split by ``split_col`` (e.g.
    model) and optionally by ``panel2_col`` (e.g. data_type) — the shared
    shape behind viz_features_by_model_and_global / correct_vs_incorrect /
    confusion-outcome families."""
    setup_professional_style()
    out_dir = Path(output_root) / folder_name
    out_dir.mkdir(parents=True, exist_ok=True)
    colors = colors or BOX_FILL_COLORS
    feature_groups = build_feature_groups(df, extra_exclude)
    stat_order = ["min", "mean", "std", "max"]
    print(f"Creating {folder_name}: {len(feature_groups)} feature groups")

    for feature_base, columns_list in sorted(feature_groups.items()):
        feature_folder = out_dir / feature_base
        feature_folder.mkdir(parents=True, exist_ok=True)
        columns_sorted = sorted(
            columns_list,
            key=lambda x: next((i for i, s in enumerate(stat_order) if s == x[1]), 999),
        )
        for col, stat in columns_sorted:
            stat_label = stat.upper() if stat != "single" else col
            n_panels = 2 if panel2_col else 1
            fig, axes = plt.subplots(1, n_panels, figsize=(10 * n_panels, 8), squeeze=False)
            panels = [(axes[0, 0], split_col, split_values)]
            if panel2_col:
                panels.append((axes[0, 1], panel2_col, panel2_values or []))

            drew_any = False
            for ax, cat_col, cat_values in panels:
                plot_data, x_labels = [], []
                for v in cat_values:
                    data = df.loc[df[cat_col] == v, col].dropna()
                    if len(data) > 0:
                        plot_data.append(data.values)
                        x_labels.append(v)
                if not plot_data:
                    continue
                drew_any = True
                bp = ax.boxplot(
                    plot_data, tick_labels=x_labels, patch_artist=True, widths=0.6,
                    showmeans=True, whis=1.5,
                    meanprops=dict(marker="D", markerfacecolor="red", markersize=7),
                    medianprops=dict(color="darkblue", linewidth=2),
                )
                for i, patch in enumerate(bp["boxes"]):
                    patch.set_facecolor(colors.get(x_labels[i], "#cccccc"))
                    patch.set_alpha(0.7)
                    patch.set_edgecolor("black")
                    patch.set_linewidth(2)
                for i, data in enumerate(plot_data):
                    jitter_x = np.random.normal(i + 1, 0.05, size=len(data))
                    ax.scatter(jitter_x, data, alpha=0.35, s=25, c="black", ec="gray", linewidth=0.5)
                ax.set_ylabel("Value", fontsize=13, fontweight="bold")
                ax.set_title(f"{feature_base} – {stat_label}\nper {cat_col}",
                             fontsize=13, fontweight="bold", pad=15)
                ax.grid(axis="y", alpha=0.3, linestyle="--", linewidth=0.8)
                for tick in ax.get_xticklabels():
                    tick.set_rotation(45)
                    tick.set_ha("right")
            if drew_any:
                plt.tight_layout()
                plt.savefig(feature_folder / f"{col}.png", dpi=200, bbox_inches="tight")
            plt.close(fig)
    print(f"{folder_name} → {out_dir}")


def feature_vs_target_scatters(
    df: pd.DataFrame,
    output_root: Path,
    target_col: str,
    folder_name: str = "feature_vs_prediction_scatter",
    hue_col: str = "model",
    confidence_threshold: Optional[float] = None,
    extra_exclude=None,
    max_features: Optional[int] = None,
):
    """Per-feature scatter vs a target column with optional confidence zones
    (reference: viz_features_vs_prediction_scatter family)."""
    setup_professional_style()
    out_dir = Path(output_root) / folder_name
    out_dir.mkdir(parents=True, exist_ok=True)
    feat_cols = numeric_feature_cols(
        df,
        {"model", "track_id", "track_stem", "data_type", target_col,
         "pred_label", "true_label", "is_correct", "outcome"} | set(extra_exclude or ()),
    )
    if max_features:
        feat_cols = feat_cols[:max_features]
    for col in feat_cols:
        sub = df[[col, target_col, hue_col]].dropna()
        if len(sub) < 3:
            continue
        plt.figure(figsize=(9, 6))
        for val in sorted(sub[hue_col].unique()):
            s = sub[sub[hue_col] == val]
            plt.scatter(s[col], s[target_col], label=str(val), alpha=0.65, s=45,
                        color=PROFESSIONAL_COLORS.get(val))
        if confidence_threshold is not None:
            plt.axhspan(0.5 - confidence_threshold / 2, 0.5 + confidence_threshold / 2,
                        alpha=0.1, color="gray", label="low confidence")
        r = sub[col].corr(sub[target_col])
        plt.xlabel(col)
        plt.ylabel(target_col)
        plt.title(f"{col} vs {target_col} (r={r:.2f})", fontsize=13, fontweight="bold")
        plt.legend(bbox_to_anchor=(1.02, 1), loc="upper left", fontsize=9)
        plt.grid(alpha=0.3)
        plt.tight_layout()
        plt.savefig(out_dir / f"{col}.png", dpi=200, bbox_inches="tight")
        plt.close()
    print(f"{folder_name} → {out_dir}")
