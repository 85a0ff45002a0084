"""Cross-run comparison tests: run-label inference, common-key intersection,
and plot outputs for all four families."""

import json

from adx_tpu.viz.runs_compare import (
    extract_run_label,
    get_freq_unit,
    load_audio_lime_explanations,
    load_fbp_bands_for_runs,
    load_occlusion_windows_for_runs,
    load_predictions_runs,
    plot_audio_lime_influences,
    plot_fbp_band_importances,
    plot_occlusion_windows_importances,
    plot_predictions_comparison,
    try_num,
)


def test_extract_run_label_taxonomy():
    assert extract_run_label("/data/FakeRealMusicOriginal/x.json") == "Original"
    assert extract_run_label("/d/minus14/base/p.json") == "m14_base"
    assert extract_run_label("/d/minus23/mp3_192/p.json") == "m23_mp3_192"
    assert extract_run_label("/d/minus14/noise_snr30/p.json") == "m14_noise_snr30"
    # the reference's asymmetric resample labels, preserved exactly
    assert extract_run_label("/d/minus14/resample22k/p.json") == "m14_resample_22k"
    assert extract_run_label("/d/minus23/resample22k/p.json") == "m23_resample22k"
    assert extract_run_label("/d/minus23/reverb_room/p.json") == "m23_reverb_room"


def test_try_num_and_freq_unit():
    assert try_num("12_track") == 12
    assert try_num("track") == 999999
    assert get_freq_unit("STFT_Occlusion") == "Hz"
    assert get_freq_unit("mel_something") == "Mel"


def _write_predictions(path, tracks, offset=0.0):
    data = {
        "REAL": {
            t: {"prediction": 0.2 + offset + 0.05 * i, "track_stem": t}
            for i, t in enumerate(tracks)
        }
    }
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(data))


def test_predictions_runs_comparison(tmp_path):
    p1 = tmp_path / "minus14" / "base" / "predictions.json"
    p2 = tmp_path / "minus14" / "mp3_192" / "predictions.json"
    _write_predictions(p1, ["0_a", "1_b", "2_c"])
    _write_predictions(p2, ["0_a", "1_b"], offset=0.1)  # track 2_c missing in run 2
    df, labels = load_predictions_runs([str(p1), str(p2)])
    assert labels == "m14_base_m14_mp3_192"
    assert set(df["run"].unique()) == {"m14_base", "m14_mp3_192"}

    idxs = sorted(df["idx"].unique(), key=try_num)
    idx_pos = {i: j for j, i in enumerate(idxs)}
    out = tmp_path / "plots"
    out.mkdir()
    plot_predictions_comparison(
        df, "REAL", idxs, idx_pos, sorted(df["run"].unique()), idxs, output_dir=out
    )
    assert (out / "REAL_predictions.png").exists()


def _write_fbp_run(root, tracks, importance=0.1):
    for t in tracks:
        comp = root / "bands" / "REAL" / t / "mixture"
        comp.mkdir(parents=True, exist_ok=True)
        meta = {
            "file_name": t,
            "bands": [
                {"component": "mixture", "low": 100.0, "high": 500.0,
                 "importance": importance, "abs_importance": abs(importance), "type": "POSITIVE"},
                {"component": "mixture", "low": 500.0, "high": 1500.0,
                 "importance": -importance, "abs_importance": abs(importance), "type": "NEGATIVE"},
            ],
        }
        (comp / f"{t}_bands_metadata.json").write_text(json.dumps(meta))


def test_fbp_runs_comparison(tmp_path):
    r1 = tmp_path / "minus14" / "base" / "exp"
    r2 = tmp_path / "minus14" / "reverb_room" / "exp"
    _write_fbp_run(r1, ["0_t", "1_t"])
    _write_fbp_run(r2, ["0_t", "1_t", "2_only_in_run2"], importance=0.2)
    df, labels = load_fbp_bands_for_runs([str(r1), str(r2)])
    # common-key intersection drops the run2-only track
    assert "2_only_in_run2" not in df["track_stem"].values
    out = tmp_path / "plots"
    out.mkdir()
    plot_fbp_band_importances(df, output_dir=out)
    assert (out / "REAL_fbp_band_importances_by_track.png").exists()


def _write_occlusion_run(root, tracks):
    for t in tracks:
        d = root / "saliency_maps" / "REAL" / t / "top_windows" / "all"
        d.mkdir(parents=True, exist_ok=True)
        meta = {
            "file_name": t,
            "group": "all",
            "top_n": 2,
            "windows": [
                {"rank": r, "t_start": 0, "t_end": 8, "f_start": 0, "f_end": 64,
                 "start_time_sec": 0.0, "end_time_sec": 0.5,
                 "importance": 0.01 * r, "abs_importance": 0.01 * r, "type": "POSITIVE"}
                for r in (1, 2)
            ],
        }
        (d / f"{t}__all_occlusion_patches_from_list.json").write_text(json.dumps(meta))


def test_occlusion_runs_comparison(tmp_path):
    r1 = tmp_path / "minus14" / "base" / "STFT_exp"
    r2 = tmp_path / "minus23" / "base" / "STFT_exp"
    _write_occlusion_run(r1, ["0_t", "1_t"])
    _write_occlusion_run(r2, ["0_t", "1_t"])
    df, labels = load_occlusion_windows_for_runs([str(r1), str(r2)], max_rank=1)
    assert (df["rank"] <= 1).all()
    out = tmp_path / "plots"
    out.mkdir()
    plot_occlusion_windows_importances(df, output_dir=out)
    assert (out / "REAL_occlusion_windows_by_track.png").exists()


def test_audiolime_runs_comparison(tmp_path):
    def write(path, infl):
        data = {
            "REAL": {
                f"{i}_t": {
                    "track_id": i,
                    "type": "full_track",
                    "explanations": {
                        "component_influences": {
                            "vocals0": infl, "drums0": -infl, "bass0": 0.0, "other0": infl / 2
                        }
                    },
                }
                for i in range(3)
            }
        }
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(data))

    p1 = tmp_path / "minus14" / "base" / "explanations.json"
    p2 = tmp_path / "minus14" / "noise_snr30" / "explanations.json"
    write(p1, 0.1)
    write(p2, 0.3)
    df, labels = load_audio_lime_explanations([str(p1), str(p2)])
    assert set(df["component"].unique()) == {"vocals0", "drums0", "bass0", "other0"}
    out = tmp_path / "plots"
    out.mkdir()
    plot_audio_lime_influences(df, output_dir=out)
    assert (out / "REAL_audiolime_influences.png").exists()
    # combined providers x components grid (reference save_combined default)
    assert (out / "ALL_models_audiolime_influences.png").exists()
