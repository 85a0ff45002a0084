"""End-to-end occlusion/RISE experiment tests on a synthetic mini-dataset."""

import json

import numpy as np
import pytest

from adx_tpu.explainers.occlusion import SpectrogramExplainability
from adx_tpu.io.audio_io import write_wav
from adx_tpu.predict import LocalSonics

SR = 8000


@pytest.fixture(scope="module")
def predictor():
    return LocalSonics.from_pretrained("tiny", max_batch=8)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("OccMini")
    rng = np.random.default_rng(1)
    n = SR // 2
    t = np.arange(n) / SR
    for model in ["REAL", "UDIO"]:
        for i in range(2):
            y = 0.3 * np.sin(2 * np.pi * (250 + 100 * i) * t) + 0.05 * rng.standard_normal(n)
            write_wav(root / model / f"song {i}.wav", y.astype(np.float32), SR)
    return root


def make_explainer(predictor, tmp, method="occlusion", **kw):
    defaults = dict(
        predictor=predictor,
        sr=SR,
        duration=predictor.cfg.audio.duration,
        n_fft=256,
        hop_length=128,
        win_length=256,
        spec_type="stft",
        method=method,
        use_original_audio=False,
        patch_time_frames=8,
        stride_time_frames=8,
        patch_freq_percent=50.0,
        stride_freq_percent=50.0,
        n_masks=6,
        mask_probability=0.5,
        top_n_windows=2,
        checkpoint_dir=tmp / "ckpt",
    )
    defaults.update(kw)
    return SpectrogramExplainability(**defaults)


def test_occlusion_experiment_end_to_end(predictor, dataset, tmp_path):
    expl = make_explainer(predictor, tmp_path)
    out = tmp_path / "out"
    df = expl.run_experiment(
        base_path=dataset, output_dir=out, baseline_threshold=0.0,
        results_path=out / "spectrogram_results_occlusion.json",
    )
    assert len(df) == 4
    for key in (
        "file_path", "file_name", "folder", "method", "baseline_pred",
        "mean_importance", "max_importance", "min_importance",
        "std_importance", "p90_importance", "p10_importance",
    ):
        assert key in df.columns

    results = json.loads((out / "spectrogram_results_occlusion.json").read_text())
    assert set(results) == {"REAL", "UDIO"}
    assert results["REAL"]["song 0"]["method"] == "occlusion"

    track_dir = out / "saliency_maps" / "REAL" / "song 0"
    assert (track_dir / "saliency_song 0.png").exists()

    # top-window groups with reference-format filenames + metadata JSONs
    windows = track_dir / "top_windows"
    for group in ("all", "best", "worst", "most_influential"):
        meta_path = windows / group / f"song 0__{group}_occlusion_patches_from_list.json"
        assert meta_path.exists(), group
        meta = json.loads(meta_path.read_text())
        assert meta["group"] == group
        if meta["windows"]:
            w = meta["windows"][0]
            assert set(w) == {
                "rank", "t_start", "t_end", "f_start", "f_end",
                "start_time_sec", "end_time_sec", "importance",
                "abs_importance", "type",
            }
    # 'all' saves no audio; best/worst save top_n WAVs
    assert not list((windows / "all").glob("*.wav"))
    assert len(list((windows / "best").glob("*.wav"))) == 2
    name = next(iter((windows / "best").glob("*.wav"))).name
    assert name.startswith("song 0__best1_patch_") or name.startswith("song 0__best2_patch_")

    # aggregate visualizations + summary stats
    from adx_tpu.viz.saliency import visualize_aggregate_results

    viz_dir = out / "aggregate_visualizations"
    visualize_aggregate_results(df, viz_dir)
    assert (viz_dir / "summary_statistics.csv").exists()
    assert (viz_dir / "mean_importance_per_model.png").exists()


def test_occlusion_map_matches_patch_importances(predictor, dataset, tmp_path):
    """importance_map == scatter-add of per-patch deltas / count_map."""
    expl = make_explainer(predictor, tmp_path)
    path = next((dataset / "REAL").glob("*.wav"))
    res = expl._compute_occlusion_map(str(path), baseline_threshold=0.0, verbose=False)
    imap = res.importance_map
    rebuilt = np.zeros_like(imap)
    count = np.zeros_like(imap)
    for p in res.patch_importances:
        rebuilt[p["f_start"] : p["f_end"], p["t_start"] : p["t_end"]] += p["importance"]
        count[p["f_start"] : p["f_end"], p["t_start"] : p["t_end"]] += 1
    np.testing.assert_allclose(imap, rebuilt / (count + 1e-8), atol=1e-7)


def test_rise_experiment_end_to_end(predictor, dataset, tmp_path):
    expl = make_explainer(predictor, tmp_path, method="rise")
    out = tmp_path / "outr"
    df = expl.run_experiment(base_path=dataset, output_dir=out, baseline_threshold=0.0,
                             max_samples_per_model=1)
    assert len(df) == 2
    assert (df["method"] == "rise").all()
    # RISE maps are min-max normalized to [0, 1]
    assert (df["max_importance"] <= 1.0 + 1e-6).all()
    assert (df["min_importance"] >= -1e-6).all()
    # no top_windows for RISE
    assert not (out / "saliency_maps" / "REAL" / "song 0" / "top_windows").exists()


def test_occlusion_mel_mode(predictor, dataset, tmp_path):
    """Mel spectrogram mode: NNLS + Griffin-Lim inversion end-to-end."""
    expl = make_explainer(
        predictor, tmp_path, spec_type="mel", n_mels=32, n_iter=2,
        patch_time_frames=8, stride_time_frames=8,
        patch_freq_percent=50.0, stride_freq_percent=50.0,
    )
    path = next((dataset / "REAL").glob("*.wav"))
    res = expl._compute_occlusion_map(str(path), baseline_threshold=0.0, verbose=False)
    assert res.importance_map is not None
    assert res.importance_map.shape[0] == 32  # mel bins
    assert np.isfinite(res.importance_map).all()


def test_rise_mel_mode(predictor, dataset, tmp_path):
    expl = make_explainer(
        predictor, tmp_path, method="rise", spec_type="mel", n_mels=32,
        n_iter=2, n_masks=4,
    )
    path = next((dataset / "REAL").glob("*.wav"))
    res = expl._compute_rise_map(str(path), baseline_threshold=0.0, verbose=False)
    assert res.importance_map is not None
    assert res.importance_map.shape[0] == 32
    assert 0.0 <= res.importance_map.min() and res.importance_map.max() <= 1.0 + 1e-6


def test_baseline_threshold_skips(predictor, dataset, tmp_path):
    expl = make_explainer(predictor, tmp_path)
    out = tmp_path / "outskip"
    df = expl.run_experiment(base_path=dataset, output_dir=out, baseline_threshold=1.1)
    assert df.empty


def test_occlusion_track_fold_matches_serial(predictor, dataset, tmp_path):
    """run_experiment with the track-folded analyze precompute
    (track_batch=4) must reproduce the serial per-file dispatch
    (track_batch=1) within f32 multi-program reduction-order noise."""
    df_s = make_explainer(predictor, tmp_path / "a", track_batch=1).run_experiment(
        base_path=dataset, output_dir=tmp_path / "outs", baseline_threshold=0.0,
        results_path=tmp_path / "outs" / "r.json",
    )
    df_g = make_explainer(predictor, tmp_path / "b", track_batch=4).run_experiment(
        base_path=dataset, output_dir=tmp_path / "outg", baseline_threshold=0.0,
        results_path=tmp_path / "outg" / "r.json",
    )
    assert list(df_s["file_name"]) == list(df_g["file_name"])
    for col in ("baseline_pred", "mean_importance", "max_importance",
                "std_importance"):
        np.testing.assert_allclose(df_s[col], df_g[col], atol=2e-5, err_msg=col)
