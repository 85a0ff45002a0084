"""Feature-visualization suite tests: loaders, grouping, comparison tables,
r-heatmaps, and the four family scripts' plot functions on synthetic data."""

import importlib.util
import json
import sys
from pathlib import Path

import pandas as pd
import pytest

from adx_tpu.viz.feature_vis_common import (
    assign_feature_group,
    comparison_table_suite,
    correlation_heatmap_suite,
    flatten_feature,
    grouped_feature_boxplots,
)

ROOT = Path(__file__).resolve().parents[1]


def _load_script(name):
    path = ROOT / "scripts" / "feature_visualizations" / f"{name}.py"
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_flatten_feature():
    feats = {
        "duration": 1.0,
        "rms_wave": {"min": 0.1, "mean": 0.2, "std": 0.01, "max": 0.3},
        "jitter": {"jitter_local": 1.5, "jitter_rap": 0.7},
        "contour": [1.0, 2.0, 3.0],
        "label": "x",
    }
    flat = flatten_feature(feats)
    assert flat["duration"] == 1.0
    assert flat["rms_wave_mean"] == 0.2
    assert flat["jitter_jitter_local"] == 1.5
    assert flat["contour_mean"] == 2.0
    assert flat["label"] == "x"


def test_assign_feature_group():
    assert assign_feature_group("rms_wave_mean") == "Signal_energy"
    assert assign_feature_group("spectral_centroid_std") == "Frequency_spectrum"
    assert assign_feature_group("jitter_jitter_rap") == "Jitter_Shimmer"
    assert assign_feature_group("hnr") == "Vocal_quality"
    assert assign_feature_group("zero_crossing_rate") == "Rhythm_and_temporal_features"
    assert assign_feature_group("mystery_feature") == "other"


@pytest.fixture()
def merged_df(rng):
    rows = []
    for model in ["REAL", "SUNO", "UDIO"]:
        for i in range(6):
            rows.append(
                {
                    "model": model,
                    "track_id": f"t{i}",
                    "track_stem": f"t{i}",
                    "data_type": "REAL" if model == "REAL" else "GENERATED",
                    "rms_wave_mean": rng.uniform(0.1, 0.3),
                    "rms_wave_std": rng.uniform(0.0, 0.05),
                    "spectral_centroid_mean": rng.uniform(1000, 3000),
                    "hnr": rng.uniform(5, 25),
                    "prediction_score": rng.uniform(0, 1),
                    "pred_label": rng.choice(["Real", "Fake"]),
                    "true_label": "Real" if model == "REAL" else "Fake",
                    "is_correct": True,
                    "outcome": "TN" if model == "REAL" else "TP",
                }
            )
    return pd.DataFrame(rows)


def test_comparison_table_suite(merged_df, tmp_path):
    comparison_table_suite(merged_df, tmp_path / "tables")
    assert (tmp_path / "tables" / "all_features.png").exists()
    assert (tmp_path / "tables" / "all_features_by_pred.png").exists()
    assert (tmp_path / "tables" / "all_features_by_type.png").exists()
    assert (tmp_path / "tables" / "Signal_energy" / "Signal_energy.png").exists()
    assert (tmp_path / "tables" / "Vocal_quality" / "Vocal_quality.png").exists()


def test_correlation_heatmap_suite(merged_df, tmp_path):
    correlation_heatmap_suite(
        merged_df, tmp_path / "heat", target_col="prediction_score",
        exclude={"model", "track_id", "track_stem", "data_type"},
        suffix="Prediction P(fake)",
    )
    assert (tmp_path / "heat" / "all_features_r_vs_Prediction_P(fake).png").exists()
    assert (tmp_path / "heat" / "Signal_energy").exists()


def test_grouped_feature_boxplots(merged_df, tmp_path):
    grouped_feature_boxplots(
        merged_df, tmp_path, split_col="model", split_values=["REAL", "SUNO", "UDIO"],
        panel2_col="data_type", panel2_values=["REAL", "GENERATED"],
        folder_name="boxes",
    )
    assert (tmp_path / "boxes" / "rms_wave" / "rms_wave_mean.png").exists()
    assert (tmp_path / "boxes" / "hnr" / "hnr.png").exists()


def test_occlusion_vis_script_functions(tmp_path, rng):
    mod = _load_script("run_Occlusion_features_vis")
    data = {
        "REAL": {
            "t0": {
                "type": "patch",
                "patches": {
                    f"{grp}_rank{r}": {
                        "features": {"rms_wave": {"mean": rng.uniform(0.1, 0.3)},
                                     "hnr": rng.uniform(5, 20)},
                        "occlusion_meta": {
                            "group": grp, "rank": r,
                            "importance": rng.uniform(-0.2, 0.2),
                            "abs_importance": 0.1,
                            "tstart": 0, "tend": 8, "fstart": 0, "fend": 64,
                            "start_time_sec": 0.0, "end_time_sec": 0.5,
                            "patch_type": "POSITIVE", "model": "REAL", "track_stem": "t0",
                        },
                    }
                    for grp in ["best", "worst", "most_influential"]
                    for r in (1, 2)
                },
            }
        },
        "SUNO": {
            "t1": {
                "type": "patch",
                "patches": {
                    f"best_rank{r}": {
                        "features": {"rms_wave": {"mean": rng.uniform(0.1, 0.3)},
                                     "hnr": rng.uniform(5, 20)},
                        "occlusion_meta": {
                            "group": "best", "rank": r, "importance": 0.1,
                            "abs_importance": 0.1, "tstart": 0, "tend": 8,
                            "fstart": 0, "fend": 64, "start_time_sec": 0.0,
                            "end_time_sec": 0.5, "patch_type": "POSITIVE",
                            "model": "SUNO", "track_stem": "t1",
                        },
                    }
                    for r in (1, 2)
                },
            }
        },
    }
    jf = tmp_path / "occlusion_patches_features.json"
    jf.write_text(json.dumps(data))
    df, feats = mod.load_and_prepare_data_full(jf)
    assert len(df) == 8
    df = mod.add_group_from_patch_key(df)
    assert set(df["group"].unique()) <= {"best", "worst", "most_influential"}
    df = mod.add_window_label_from_patch_meta(df)
    assert df["window_label"].iloc[0] == "0.0-8.0s_0-64Mel"
    out = tmp_path / "out"
    mod.viz_best_vs_worst_boxplots(df, out)
    assert list((out / "best_vs_worst" / "boxplots").rglob("*.png"))
    mod.viz_feature_values_vs_importance_by_group(df, out)
    # reference semantics: one per-model panel figure per (window, feature)
    pngs = list((out / "by_group_feature_vs_importance").rglob("*.png"))
    assert pngs
    assert any("vs_importance_per_model" in p.name for p in pngs)
    # every window with data gets its own folder
    windows = {p.parts[len((out / "by_group_feature_vs_importance").parts)] for p in pngs}
    assert windows == set(df["window_label"].unique())


def test_fbp_vis_script_functions(tmp_path, rng):
    mod = _load_script("run_FBP_features_vis")
    # band features JSON
    feats_data = {
        "REAL": {
            "t0": {
                "type": "band",
                "bands": {
                    "mixture_100.0_250.0Hz": {
                        "features": {"rms_wave": {"mean": 0.2}},
                        "band_meta": {"component": "mixture", "importance": 0.05,
                                      "abs_importance": 0.05, "low_freq": 100.0,
                                      "high_freq": 250.0, "band_type": "POSITIVE",
                                      "model": "REAL", "track_stem": "t0"},
                    }
                },
            }
        }
    }
    jf = tmp_path / "fbp_band_features.json"
    jf.write_text(json.dumps(feats_data))
    df, _ = mod.load_and_prepare_data_full(jf)
    df = mod.add_freq_band_from_band_key(df)
    assert df["freq_band"].iloc[0] == "100-250 Hz"

    # results tree for explanations
    root = tmp_path / "exp"
    comp = root / "bands" / "REAL" / "t0" / "mixture"
    comp.mkdir(parents=True)
    (comp / "t0_bands_metadata.json").write_text(
        json.dumps({"file_name": "t0", "bands": [
            {"component": "mixture", "low": 100.0, "high": 250.0,
             "importance": 0.05, "abs_importance": 0.05, "type": "POSITIVE"}
        ]})
    )
    (root / "fbp_results.json").write_text(
        json.dumps({"REAL": {"t0": {"components": {"mixture": {"baseline_pred_mean": 0.4}}}}})
    )
    fbp_df = mod.load_fbp_bands_explanations(root)
    assert len(fbp_df) == 1
    assert fbp_df["prediction_score"].iloc[0] == pytest.approx(0.4)

    # the features-side band_key is normalized to the explanations-side form
    # (reference run_FBP_features_vis.py:179) so the PRIMARY join is exact
    assert df["band_key"].iloc[0] == "100-250Hz"
    primary = df.merge(
        fbp_df[["model", "track", "band_key", "importance"]],
        on=["model", "track", "band_key"], how="inner",
    )
    assert len(primary) == 1

    out = tmp_path / "out"
    mod.viz_feature_groups_by_freq_band(df, out)
    assert list((out / "feature_groups_by_band").rglob("*.png"))


def test_lime_vis_script_functions(tmp_path, rng):
    mod = _load_script("run_LIME_features_vis")
    feats_data = {
        m: {
            f"t{i}": {
                "type": "full_track",
                "components": {
                    c: {
                        "features": {"rms_wave": {"mean": rng.uniform(0.1, 0.3)},
                                     "hnr": rng.uniform(5, 20)},
                        "component_meta": {"importance": rng.uniform(-0.3, 0.3),
                                           "abs_importance": 0.1,
                                           "component_type": "POSITIVE",
                                           "model": m, "track_stem": f"t{i}",
                                           "component_name": c},
                    }
                    for c in ["vocals0", "drums0", "bass0", "other0"]
                },
            }
            for i in range(4)
        }
        for m in ["REAL", "SUNO"]
    }
    jf = tmp_path / "audiolime_component_features.json"
    jf.write_text(json.dumps(feats_data))
    df, _ = mod.load_and_prepare_data_full(jf)
    assert len(df) == 32
    assert "component_name" in df.columns

    expl = {
        m: {
            f"t{i}": {
                "track_id": i,
                "type": "full_track",
                "explanations": {
                    "model_prediction": float(rng.uniform(0, 1)),
                    "predicted_class": "Fake",
                    "component_influences": {c: float(rng.uniform(-0.3, 0.3))
                                             for c in ["vocals0", "drums0", "bass0", "other0"]},
                },
            }
            for i in range(4)
        }
        for m in ["REAL", "SUNO"]
    }
    ef = tmp_path / "explanations.json"
    ef.write_text(json.dumps(expl))
    out = tmp_path / "out"
    full_df = mod.merge_features_with_explanations(df, ef)  # merged ONCE in main()
    assert not full_df.empty
    mod.plot_feature_correlation_r_heatmaps(full_df, "reversed", out)
    assert list((out / "correlation_r_heatmaps").rglob("*_r_vs_prediction.png"))
    assert list((out / "correlation_r_heatmaps").rglob("*_r_vs_lime_influence.png"))
    mod.plot_feature_comparison_table(full_df, "reversed", out)
    assert list((out / "comparison_tables").rglob("all_features.png"))
    # numeric LIME metadata (importance/influences/track_id) must NOT leak
    # into the tables as an "other" feature-group family (reference excludes
    # it). NB: the first path level under comparison_tables is the STEM
    # (which includes a stem literally named "other") — the feature-group
    # dir would be one level deeper.
    assert not list((out / "comparison_tables").glob("*/other/*.png"))
    mod.viz_feature_groups_by_component(df, out)
    assert list((out / "feature_groups_by_component").rglob("*.png"))
    mod.plot_audiolime_3rows_multicolumn(full_df, out)
    assert list((out / "pred_influence_feature_lines_multicolumn").glob("*_3rows_multicolumn.png"))
