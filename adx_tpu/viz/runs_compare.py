"""Cross-run robustness comparison — the reference's four
``scripts/runs_comparision/*`` scripts with the 4×-duplicated helpers
(style, palette, ``try_num``, ``extract_run_label``) deduplicated here
(SURVEY.md §7.2.9). Loaders take lists of run roots/files, intersect the
keys common to all runs, and emit FacetGrid importance-vs-file-index plots
with file-mapping legend boxes — same outputs as the reference."""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import List, Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import seaborn as sns

from adx_tpu.viz.predictions_viz import setup_professional_style

PALETTE = [
    "#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd", "#8c564b",
    "#e377c2", "#7f7f7f", "#bcbd22", "#17becf", "#ff9896", "#98df8a",
    "#c5b0d5", "#c49c94", "#f7b6d2",
]


def try_num(s) -> int:
    """Leading-integer sort key (999999 for non-numeric stems)."""
    if isinstance(s, bytes):
        s = s.decode("utf-8", errors="ignore")
    match = re.match(r"^(\d+)", str(s))
    return int(match.group(1)) if match else 999999


def extract_run_label(file_path: str) -> str:
    """Run label inferred from path substrings: minus14/minus23 ×
    base/mp3_192/noise_snr30/resample22k/reverb_room (the data-prep
    pipeline's output taxonomy — SURVEY.md §2.5)."""
    path = Path(file_path)
    name = str(path).lower()
    if "minus14" not in name and "minus23" not in name:
        return "Original"
    for lufs_tag, lufs in (("minus14", "m14"), ("minus23", "m23")):
        if lufs_tag in name:
            if "base" in name:
                return f"{lufs}_base"
            if "mp3_192" in name:
                return f"{lufs}_mp3_192"
            if "noise_snr30" in name:
                return f"{lufs}_noise_snr30"
            if "resample22k" in name:
                # the reference labels these asymmetrically (m14_resample_22k
                # vs m23_resample22k); keep its exact strings
                return "m14_resample_22k" if lufs == "m14" else "m23_resample22k"
            if "reverb_room" in name:
                return f"{lufs}_reverb_room"
    return path.parent.name if path.parent.name != "." else path.stem[:20]


def get_freq_unit(label: str) -> str:
    """'Mel' if the run name mentions mel, 'Hz' for stft, 'Mel' otherwise
    (reference: compare_occlusion_results_across_runs.py:100-108)."""
    name_lower = label.lower()
    if "mel" in name_lower:
        return "Mel"
    if "stft" in name_lower:
        return "Hz"
    return "Mel"


def _common_keys(df_all: pd.DataFrame, key_cols: List[str]) -> pd.DataFrame:
    """Restrict to (key_cols) combinations present in EVERY run."""
    keys_per_run = [df.groupby(key_cols).size() > 0 for _, df in df_all.groupby("run")]
    common_mask = keys_per_run[0].reindex(keys_per_run[0].index).fillna(False)
    for mask in keys_per_run[1:]:
        common_mask &= mask.reindex(common_mask.index).fillna(False)
    idx = df_all.set_index(key_cols).index
    return df_all[idx.isin(common_mask[common_mask].index)].copy()


def _file_mapping_box(fig, tracks, x=0.82, y=0.45, width=18):
    short_labels = [t[:width] + "..." if len(t) > width else t for t in tracks]
    index_text = "\n".join(f"{i:2d}: {lab}" for i, lab in enumerate(short_labels))
    fig.text(
        x, y, f"File Mapping:\n{index_text}", fontsize=8.8, va="top", ha="left",
        bbox=dict(facecolor="white", edgecolor="#d1d5db", boxstyle="round,pad=0.4", alpha=0.95),
    )


def _facet_importance_plot(
    dprov, col_field, col_order, title, outfile, tracks, col_wrap=3, height=3.2,
    aspect=1.4, scatter_s=90, bottom=0.05,
):
    # scatter_s/bottom differ per family in the reference (FBP s=90/0.05 at
    # compare_fbp_results_across_runs.py:268,313; occlusion s=80/0.06 at
    # compare_occlusion_results_across_runs.py:305,351)
    g = sns.FacetGrid(
        dprov, col=col_field, col_order=col_order, hue="run", height=height,
        aspect=aspect, col_wrap=col_wrap, sharey=False, palette="husl",
        legend_out=False,
    )
    g.map_dataframe(sns.lineplot, x="file_index", y="importance", legend=False, linewidth=1.5, alpha=0.8)
    g.map_dataframe(
        sns.scatterplot, x="file_index", y="importance", legend=False, s=scatter_s,
        alpha=0.9, edgecolor="white", linewidth=0.8,
    )
    g.set_axis_labels("file index", "importance")
    g.set_titles(col_template="{col_name}")
    g.fig.suptitle(title, y=1.02, fontsize=12)
    handles, labels = g.axes.flat[0].get_legend_handles_labels()
    g.fig.legend(
        handles, labels, title="Run", loc="upper left", bbox_to_anchor=(0.82, 0.85),
        frameon=True, fancybox=True, fontsize=10,
    )
    _file_mapping_box(g.fig, tracks)
    g.fig.subplots_adjust(right=0.78)
    plt.subplots_adjust(bottom=bottom)
    if outfile:
        plt.savefig(outfile, dpi=300, bbox_inches="tight", facecolor="white")
        print(f"💾 Saved: {outfile}")
    plt.close()


# ---------------------------------------------------------------------------
# Predictions
# ---------------------------------------------------------------------------


def load_predictions_runs(file_paths: Sequence[str], threshold: float = 0.5):
    rows = []
    runs_labels = ""
    for p in file_paths:
        run_label = extract_run_label(p)
        runs_labels += f"{run_label}_"
        with open(p, "r", encoding="utf-8") as f:
            data = json.load(f)
        for model_name, audio_items in data.items():
            for audio_stem, rec in audio_items.items():
                pred = rec.get("prediction", np.nan)
                if pred is None or (isinstance(pred, float) and np.isnan(pred)):
                    continue
                rows.append(
                    {
                        "run_path": str(p),
                        "run": run_label,
                        "source": model_name,
                        "idx": audio_stem,
                        "score_fake_prob": pred,
                    }
                )
    df = pd.DataFrame(rows)
    if df.empty:
        raise ValueError("No valid data loaded!")
    df["pred_by_threshold"] = (df["score_fake_prob"] >= threshold).map({True: "Fake", False: "Real"})
    df["idx_sort"] = df["idx"].map(try_num)
    print(f"✅ Loaded {len(df)} predictions from {len(file_paths)} files")
    print(f"   Runs: {sorted(df['run'].unique())}")
    return df, runs_labels.strip("_")


def plot_predictions_comparison(
    df, source, idxs, idx_pos, runs, short_labels,
    annotate_decision: bool = False, figsize=(14, 6), output_dir: Optional[Path] = None,
):
    setup_professional_style()
    fig, ax = plt.subplots(figsize=figsize)
    markers = ["o", "s", "D", "^", "v", "P", "X", "*", "h", "8"]
    for r_i, run in enumerate(runs):
        g = df[(df["run"] == run) & (df["source"] == source)].sort_values("idx_sort")
        if len(g) == 0:
            continue
        x = [idx_pos[v] + (r_i - (len(runs) - 1) / 2) * 0.25 for v in g["idx"]]
        ax.plot(
            x, g["score_fake_prob"], marker=markers[r_i % len(markers)],
            linewidth=3.5, markersize=9, alpha=0.95, label=run,
            color=PALETTE[r_i % len(PALETTE)], zorder=3,
        )
        if annotate_decision:
            for xi, y in zip(x, g["score_fake_prob"]):
                lab = "F" if y >= 0.5 else "R"
                ax.text(
                    xi, y + 0.035, lab, ha="center", va="bottom", fontsize=11,
                    fontweight="bold", color="red" if y >= 0.5 else "#1f77b4",
                    bbox=dict(boxstyle="round,pad=0.2", facecolor="white", alpha=0.9),
                )
    ax.axhline(0.5, color="red", linestyle="--", linewidth=3, label="Threshold 0.5")
    ax.set_xticks([idx_pos[i] for i in idxs])
    ax.set_xticklabels(range(len(idxs)), fontsize=11)
    ax.set_title(f"{source}: P(Fake) vs Audio Index", fontsize=16, fontweight="bold")
    ax.set_xlabel("Audio Index (0,1,2,...)")
    ax.set_ylabel("P(Fake)")
    ax.set_ylim(-0.08, 1.08)
    ax.legend(title="Modification", bbox_to_anchor=(1.02, 1), loc="upper left", fontsize=11)
    ax.grid(True, alpha=0.3)
    fig.tight_layout(rect=[0, 0, 0.82, 1])
    legend_text = "\n".join(f"{i}: {str(label)[:28]}" for i, label in enumerate(short_labels))
    fig.text(
        0.83, 0.5, f"Audio Mapping:\n{legend_text}", fontsize=10.5, va="center",
        ha="left", bbox=dict(facecolor="#f8f9fa", edgecolor="#dee2e6", boxstyle="round,pad=0.7"),
    )
    if output_dir:
        out_file = Path(output_dir) / f"{source.replace(' ', '_')}_predictions.png"
        plt.savefig(out_file, dpi=300, bbox_inches="tight", facecolor="white")
        print(f"💾 Saved: {out_file}")
    plt.close()


# ---------------------------------------------------------------------------
# FBP bands
# ---------------------------------------------------------------------------


def load_fbp_bands_for_runs(fbp_roots: Sequence[str]):
    dfs = []
    runs_labels = ""
    for p in fbp_roots:
        fbp_root = Path(p)
        run_label = extract_run_label(p)
        runs_labels += f"{run_label}_"
        print(f"📂 Loading FBP bands from: {fbp_root} (run: {run_label})")
        rows = []
        bands_root = fbp_root / "bands"
        if not bands_root.exists():
            print(f"[ERROR] Bands directory not found: {bands_root}")
            continue
        for model_dir in sorted(bands_root.iterdir()):
            if not model_dir.is_dir():
                continue
            for track_dir in (d for d in model_dir.iterdir() if d.is_dir()):
                track_stem = track_dir.name
                for component_dir in (d for d in track_dir.iterdir() if d.is_dir()):
                    meta_path = component_dir / f"{track_stem}_bands_metadata.json"
                    if not meta_path.exists():
                        continue
                    with open(meta_path, "r", encoding="utf-8") as f:
                        meta = json.load(f)
                    for band_idx, band in enumerate(meta.get("bands", [])):
                        low, high = float(band["low"]), float(band["high"])
                        rows.append(
                            {
                                "data_source": model_dir.name,
                                "track_stem": track_stem,
                                "track_index": try_num(track_stem),
                                "component": band.get("component", component_dir.name),
                                "band_index": band_idx,
                                "low_freq": low,
                                "high_freq": high,
                                "band_center": 0.5 * (low + high),
                                "importance": float(band["importance"]),
                                "abs_importance": float(band["abs_importance"]),
                                "band_type": band.get("type", "unknown"),
                                "run": run_label,
                            }
                        )
        df_run = pd.DataFrame(rows)
        if df_run.empty:
            print(f"[WARN] No data loaded from {fbp_root}")
            continue
        dfs.append(df_run)
        print(f"✅ Loaded {len(df_run)} band rows from {fbp_root}")
    if not dfs:
        raise ValueError("No FBP data loaded from any run!")
    df_all = pd.concat(dfs, ignore_index=True)
    df_common = _common_keys(
        df_all, ["data_source", "track_stem", "component", "low_freq", "high_freq"]
    )
    df_common = df_common.sort_values(
        ["data_source", "component", "band_center", "run"]
    ).reset_index(drop=True)
    print(
        f"✅ Common FBP data: {len(df_common)} rows across "
        f"{df_common['data_source'].nunique()} sources"
    )
    return df_common, runs_labels.strip("_")


def plot_fbp_band_importances(df_common: pd.DataFrame, output_dir: Optional[Path] = None):
    setup_professional_style()
    sns.set_theme(style="whitegrid")
    legend_runs = " vs ".join(sorted(df_common["run"].unique()))
    for prov in sorted(df_common["data_source"].unique()):
        dprov = df_common[df_common["data_source"] == prov].copy()
        if dprov.empty:
            continue
        tracks = sorted(dprov["track_stem"].unique(), key=try_num)
        idx_pos = {t: i for i, t in enumerate(tracks)}
        dprov["file_index"] = dprov["track_stem"].map(idx_pos)
        dprov["band_label"] = (
            dprov["low_freq"].astype(int).astype(str)
            + "-"
            + dprov["high_freq"].astype(int).astype(str)
            + " Hz"
        )
        bands_order = (
            dprov[["band_label", "low_freq"]].drop_duplicates().sort_values("low_freq")["band_label"].tolist()
        )
        if not bands_order:
            continue
        outfile = (
            Path(output_dir) / f"{prov}_fbp_band_importances_by_track.png" if output_dir else None
        )
        _facet_importance_plot(
            dprov, "band_label", bands_order,
            f"{prov}: FBP band importance vs file index ({legend_runs})",
            outfile, tracks,
        )


# ---------------------------------------------------------------------------
# Occlusion windows
# ---------------------------------------------------------------------------


def load_occlusion_windows_for_runs(
    occ_roots: Sequence[str], max_rank: Optional[int] = None
):
    dfs = []
    runs_labels = ""
    for p in occ_roots:
        occ_root = Path(p)
        run_label = extract_run_label(p)
        runs_labels += f"{run_label}_"
        print(f"📂 Loading Occlusion windows from: {occ_root} (run: {run_label})")
        unit = get_freq_unit(run_label)
        rows = []
        sal_root = occ_root / "saliency_maps"
        if not sal_root.exists():
            print(f"[ERROR] saliency_maps directory not found: {sal_root}")
            continue
        for model_dir in sorted(sal_root.iterdir()):
            if not model_dir.is_dir():
                continue
            for track_dir in (d for d in model_dir.iterdir() if d.is_dir()):
                track_stem = track_dir.name
                all_dir = track_dir / "top_windows" / "all"
                if not all_dir.exists():
                    continue
                for jf in sorted(all_dir.glob("*.json")):
                    try:
                        with open(jf, "r", encoding="utf-8") as f:
                            meta = json.load(f)
                    except Exception as e:
                        print(f"[WARN] Failed to load {jf}: {e}")
                        continue
                    for w in meta.get("windows", []):
                        start_sec = float(w.get("start_time_sec", 0.0))
                        end_sec = float(w.get("end_time_sec", 0.0))
                        f_start = float(w.get("f_start", 0.0))
                        f_end = float(w.get("f_end", 0.0))
                        rows.append(
                            {
                                "data_source": model_dir.name,
                                "track_stem": track_stem,
                                "track_index": try_num(track_stem),
                                "file_name": meta.get("file_name", track_stem),
                                "rank": int(w.get("rank", 0)),
                                "t_start": int(w.get("t_start", 0)),
                                "t_end": int(w.get("t_end", 0)),
                                "f_start": f_start,
                                "f_end": f_end,
                                "start_sec": start_sec,
                                "end_sec": end_sec,
                                "window_label": f"{start_sec:.1f}-{end_sec:.1f}s, "
                                f"{int(f_start)}-{int(f_end)}{unit}",
                                "importance": float(w.get("importance", np.nan)),
                                "abs_importance": float(w.get("abs_importance", np.nan)),
                                "window_type": w.get("type", "unknown"),
                                "run": run_label,
                            }
                        )
        df_run = pd.DataFrame(rows)
        if df_run.empty:
            print(f"[WARN] No data loaded from {occ_root}")
            continue
        if max_rank is not None:
            df_run = df_run[df_run["rank"] <= max_rank].copy()
        dfs.append(df_run)
        print(f"✅ Loaded {len(df_run)} window rows from {occ_root}")
    if not dfs:
        raise ValueError("No Occlusion data loaded from any run!")
    df_all = pd.concat(dfs, ignore_index=True)
    df_common = _common_keys(
        df_all, ["data_source", "track_stem", "t_start", "t_end", "f_start", "f_end"]
    )
    df_common = df_common.sort_values(
        ["data_source", "start_sec", "f_start", "run", "track_index"]
    ).reset_index(drop=True)
    print(
        f"✅ Common Occlusion data: {len(df_common)} rows across "
        f"{df_common['data_source'].nunique()} sources"
    )
    return df_common, runs_labels.strip("_")


def plot_occlusion_windows_importances(df_common: pd.DataFrame, output_dir: Optional[Path] = None):
    setup_professional_style()
    sns.set_theme(style="whitegrid")
    legend_runs = " vs ".join(sorted(df_common["run"].unique()))
    unit = get_freq_unit(df_common["run"].iloc[0])
    for prov in sorted(df_common["data_source"].unique()):
        dprov = df_common[df_common["data_source"] == prov].copy()
        if dprov.empty:
            continue
        tracks = sorted(dprov["track_stem"].unique(), key=try_num)
        idx_pos = {t: i for i, t in enumerate(tracks)}
        dprov["file_index"] = dprov["track_stem"].map(idx_pos)
        windows_order = (
            dprov[["window_label", "start_sec", "f_start"]]
            .drop_duplicates()
            .sort_values(["start_sec", "f_start"])["window_label"]
            .tolist()
        )
        if not windows_order:
            continue
        outfile = (
            Path(output_dir) / f"{prov}_occlusion_windows_by_track.png"
            if output_dir
            else None
        )
        _facet_importance_plot(
            dprov, "window_label", windows_order,
            f"{prov}: Occlusion window importance vs file index ({unit}) ({legend_runs})",
            outfile, tracks, col_wrap=5, height=3.0, aspect=1.3,
            scatter_s=80, bottom=0.06,
        )


# ---------------------------------------------------------------------------
# AudioLIME influences
# ---------------------------------------------------------------------------


def load_audio_lime_explanations(file_paths: Sequence[str]):
    DEFAULT_COMPONENTS = ["vocals0", "piano0", "drums0", "bass0", "other0"]
    dfs = []
    runs_labels = ""
    for p in file_paths:
        run_label = extract_run_label(p)
        runs_labels += f"{run_label}_"
        with open(p, "r", encoding="utf-8") as f:
            data = json.load(f)
        rows = []
        for model_name, items in data.items():
            if not isinstance(items, dict):
                continue
            for file_name, results in items.items():
                explanations = results.get("explanations", {})
                comp_influences = explanations.get("component_influences", {})
                comp_items = (
                    comp_influences.items()
                    if comp_influences
                    else [(c, np.nan) for c in DEFAULT_COMPONENTS]
                )
                for comp, value in comp_items:
                    rows.append(
                        {
                            "data_source": model_name,
                            "file_path": explanations.get("file_path", file_name),
                            "file_name": file_name,
                            "file_index": int(results.get("track_id", 0) or 0),
                            "component": comp,
                            "value": float(value) if not pd.isna(value) else np.nan,
                            "run": run_label,
                        }
                    )
        df_run = pd.DataFrame(rows)
        if df_run.empty:
            print(f"⚠️ Warning: no LIME rows loaded from {p} (run: {run_label})")
        dfs.append(df_run)
        print(f"✅ Loaded {len(df_run)} rows from {p} (run: {run_label})")
    df_all = pd.concat(dfs, ignore_index=True)
    if df_all.empty or "run" not in df_all.columns:
        # match the FBP/occlusion loaders' clear failure instead of a
        # KeyError('run') out of the groupby below
        raise ValueError("No LIME data loaded from any run!")
    df_common = _common_keys(df_all, ["data_source", "file_name", "component"])
    df_common = df_common.sort_values(
        ["data_source", "component", "file_index", "run"]
    ).reset_index(drop=True)
    print(
        f"✅ Common data: {len(df_common)} rows across "
        f"{df_common['data_source'].nunique()} sources"
    )
    return df_common, runs_labels.strip("_")


def plot_audio_lime_influences(
    df_common: pd.DataFrame, output_dir: Optional[Path] = None, save_combined: bool = True
):
    sns.set_theme(style="whitegrid")
    components_order = ["vocals0", "piano0", "drums0", "bass0", "other0"]
    legend_runs = " vs ".join(sorted(df_common["run"].unique()))
    providers = sorted(df_common["data_source"].unique())
    for prov in providers:
        dprov = df_common[df_common["data_source"] == prov].copy()
        if dprov.empty:
            continue
        tracks = sorted(dprov["file_name"].unique(), key=try_num)
        idx_pos = {t: i for i, t in enumerate(tracks)}
        dprov["file_index"] = dprov["file_name"].map(idx_pos)
        comps = [c for c in components_order if c in dprov["component"].unique()]
        if not comps:
            continue
        g = sns.FacetGrid(
            dprov[dprov["component"].isin(comps)], col="component", col_order=comps,
            hue="run", height=3.2, aspect=1.2, sharey=False, palette="husl",
        )
        g.map_dataframe(sns.lineplot, x="file_index", y="value")
        g.set_axis_labels("file index", "influence")
        g.set_titles(col_template="{col_name}")
        g.fig.suptitle(
            f"{prov}: AudioLIME influence vs file index ({legend_runs})", y=1.05, fontsize=12
        )
        g.add_legend(title="Run")
        _file_mapping_box(g.fig, tracks, x=1.0, y=0.45)
        if output_dir:
            outfile = Path(output_dir) / f"{prov}_audiolime_influences.png"
            plt.savefig(outfile, dpi=300, bbox_inches="tight", facecolor="white")
            print(f"💾 Saved: {outfile}")
        plt.close()

    if not save_combined:
        return
    # combined providers × components grid (reference:
    # compare_audiolime_results_across_runs.py:245-315, save_combined default)
    prov_comps = {}
    max_comps = 0
    for prov in providers:
        dprov = df_common[df_common["data_source"] == prov]
        comps = [c for c in components_order if c in dprov["component"].unique()]
        if comps:
            prov_comps[prov] = comps
            max_comps = max(max_comps, len(comps))
    if max_comps == 0:
        return
    fig, axes = plt.subplots(
        nrows=len(prov_comps), ncols=max_comps,
        figsize=(4 * max_comps, 3 * len(prov_comps)), sharey=False, squeeze=False,
    )
    for row_idx, (prov, comps) in enumerate(prov_comps.items()):
        dprov = df_common[df_common["data_source"] == prov].copy()
        tracks = sorted(dprov["file_name"].unique(), key=try_num)
        dprov["file_index"] = dprov["file_name"].map({t: i for i, t in enumerate(tracks)})
        for col_idx in range(max_comps):
            ax = axes[row_idx, col_idx]
            if col_idx >= len(comps):
                ax.axis("off")
                continue
            comp = comps[col_idx]
            sns.lineplot(data=dprov[dprov["component"] == comp], x="file_index",
                         y="value", hue="run", palette="husl", ax=ax)
            ax.set_title(f"{prov} - {comp}")
            ax.set_xlabel("file index")
            ax.set_ylabel("influence")
    handles, labels = axes[0, 0].get_legend_handles_labels()
    fig.legend(handles, labels, loc="center left", bbox_to_anchor=(0.93, 0.475),
               title="Run", fontsize=18, title_fontsize=20, frameon=True, ncol=1)
    for row in axes:
        for ax in row:
            if ax.get_legend():
                ax.get_legend().remove()
    fig.suptitle(f"AudioLIME influence vs file index ({legend_runs})", fontsize=12, y=0.95)
    fig.tight_layout(rect=(0, 0, 0.94, 0.95))
    if output_dir:
        combined_path = Path(output_dir) / "ALL_models_audiolime_influences.png"
        fig.savefig(combined_path, dpi=300, bbox_inches="tight")
        print(f"💾 Saved combined figure: {combined_path}")
    plt.close(fig)
