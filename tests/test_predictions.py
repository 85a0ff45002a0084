"""Prediction pipeline tests: predictions.json schema + visualization outputs."""

import json

import numpy as np
import pytest

from adx_tpu.io.audio_io import write_wav
from adx_tpu.predict import LocalSonics
from adx_tpu.predictions import run_sonics_predictions

SR = 8000


@pytest.fixture(scope="module")
def predictor():
    return LocalSonics.from_pretrained("tiny", max_batch=8)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    rng = np.random.default_rng(1234)
    root = tmp_path_factory.mktemp("PredMini")
    n = SR // 2
    t = np.arange(n) / SR
    for model in ["REAL", "SUNO"]:
        for i in range(3):
            y = 0.3 * np.sin(2 * np.pi * (150 + 90 * i) * t) + 0.02 * rng.standard_normal(n)
            write_wav(root / model / f"tune {i}!.wav", y.astype(np.float32), SR)
    return root


def test_run_sonics_predictions_schema(predictor, dataset, tmp_path):
    out = tmp_path / "predictions.json"
    results = run_sonics_predictions(
        predictor, dataset_path=dataset, explanations_path=str(out), sample_rate=SR
    )
    data = json.loads(out.read_text())
    assert set(data) == {"REAL", "SUNO"}
    # keys are sanitized stems (reference: re.sub non-alnum → '_')
    assert "tune_0_" in data["REAL"]
    entry = data["REAL"]["tune_0_"]
    assert set(entry) == {
        "file_path", "model", "track_stem", "prediction",
        "predicted_class", "track_source",
    }
    assert entry["track_source"] == "Real"
    assert data["SUNO"]["tune_0_"]["track_source"] == "Fake"
    assert entry["predicted_class"] in ("Real", "Fake")
    assert 0.0 <= entry["prediction"] <= 1.0
    assert results == data


def test_prediction_visualizations(predictor, dataset, tmp_path):
    from adx_tpu.viz.predictions_viz import (
        load_predictions,
        plot_confusion_matrices,
        plot_metrics_table,
        plot_model_predictions_lines,
        plot_threshold_curves,
    )

    out = tmp_path / "predictions.json"
    run_sonics_predictions(predictor, dataset_path=dataset, explanations_path=str(out), sample_rate=SR)
    df = load_predictions(out)
    assert len(df) == 6
    assert set(df["true_binary"].unique()) <= {0, 1}

    # SUNO_PRO is in the default config's model list but absent from this
    # tree — every plotting family must tolerate a configured-but-absent
    # model (sklearn's confusion_matrix raises on empty input; this killed
    # the predictions_vis stage of a 3-model sweep)
    models = ["REAL", "SUNO", "SUNO_PRO"]
    colors = {"REAL": "#1f77b4", "SUNO": "#2ca02c", "SUNO_PRO": "#d62728"}
    viz = tmp_path / "viz"
    plot_model_predictions_lines(df, models, colors, viz)
    plot_confusion_matrices(df, models, colors, viz)
    plot_metrics_table(df, models, viz)
    plot_threshold_curves(df, models, colors, viz)
    assert (viz / "model_predictions_clean" / "predictions_lines.png").exists()
    assert (viz / "confusion_matrices" / "confusion_matrices.png").exists()
    assert (viz / "metrics" / "performance_metrics.png").exists()
    assert (viz / "threshold_curves" / "fake_share_vs_threshold_professional.png").exists()


def test_predict_batch_from_files_batches_dispatches(predictor, dataset, monkeypatch):
    """One chunked forward per max_batch group of files (VERDICT r1 #5),
    results identical to the serial per-file path."""
    paths = sorted(dataset.rglob("*.wav"))
    # mixed lengths: batching zero-pads to the group max
    assert len(paths) == 6

    serial = [predictor.predict_from_file(p, sr=SR) for p in paths]

    calls = []
    orig = predictor.forward_device

    def counting(dev):
        calls.append(dev.shape)
        return orig(dev)

    monkeypatch.setattr(predictor, "forward_device", counting)
    probs = predictor.predict_batch_from_files(paths, sr=SR, verbose=False)
    assert len(calls) == -(-len(paths) // predictor.max_batch)  # ceil-div
    np.testing.assert_allclose(probs, serial, atol=1e-6)


def test_predict_batch_from_files_mixed_lengths(predictor, dataset, tmp_path):
    """A shorter file in the same group predicts as if padded alone."""
    short = tmp_path / "short.wav"
    n = SR // 4
    t = np.arange(n) / SR
    y = (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    write_wav(short, y, SR)
    paths = sorted(dataset.rglob("*.wav"))[:2] + [short]
    got = predictor.predict_batch_from_files(paths, sr=SR, verbose=False)
    want = [predictor.predict_from_file(p, sr=SR) for p in paths]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_dataset_sweep_degrades_on_undecodable_files(predictor, dataset, tmp_path, capsys):
    """mp3 without ffmpeg (or any undecodable file) is skipped with a
    warning; the sweep completes and predictions.json carries only the
    decodable tracks (reference convention globs *.mp3 too —
    src/lime_explainer.py:525-531)."""
    import shutil

    root = tmp_path / "MixedData"
    for f in dataset.rglob("*.wav"):
        dest = root / f.parent.name / f.name
        dest.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy(f, dest)
    bad = root / "SUNO" / "broken song.mp3"
    bad.write_bytes(b"\xff\xfb\x90\x00 not really an mp3")

    out = tmp_path / "predictions.json"
    results = run_sonics_predictions(
        predictor, dataset_path=root, explanations_path=str(out), sample_rate=SR
    )
    printed = capsys.readouterr().out
    assert "skipping broken song.mp3" in printed
    assert "undecodable file(s) skipped" in printed
    assert len(results["SUNO"]) == 3  # the 3 wavs, mp3 dropped
    assert all(np.isfinite(v["prediction"]) for v in results["SUNO"].values())


def test_load_audio_mp3_error_names_ffmpeg(tmp_path):
    from adx_tpu.io.audio_io import load_audio

    bad = tmp_path / "x.mp3"
    bad.write_bytes(b"\x00\x01")
    import shutil as _sh
    from adx_tpu.io.mp3 import have_mp3
    if have_mp3():
        # In-process codec path: undecodable bytes must raise, not return
        # empty audio (see io/mp3.py::decode_mp3).
        with pytest.raises(ValueError, match="no MP3 frames"):
            load_audio(bad, sr=SR)
    elif _sh.which("ffmpeg"):
        pytest.skip("ffmpeg present; gate not exercised")
    else:
        with pytest.raises(RuntimeError, match="ffmpeg"):
            load_audio(bad, sr=SR)


def test_run_sonics_predictions_sharded_merges_to_single(predictor, dataset, tmp_path):
    import subprocess
    import sys
    from pathlib import Path

    single = run_sonics_predictions(
        predictor, dataset_path=dataset,
        explanations_path=str(tmp_path / "single.json"), sample_rate=SR,
    )
    shard_paths = []
    for shard in range(2):
        p = tmp_path / f"shard{shard}.json"
        part = run_sonics_predictions(
            predictor, dataset_path=dataset, explanations_path=str(p),
            sample_rate=SR, shard_index=shard, num_shards=2,
        )
        shard_paths.append(p)
        # disjoint slices
        for model in part:
            assert set(part[model]) <= set(single[model])
    s0 = json.loads(shard_paths[0].read_text())
    s1 = json.loads(shard_paths[1].read_text())
    for model in single:
        assert not (set(s0.get(model, {})) & set(s1.get(model, {})))
    merged_path = tmp_path / "predictions.json"
    repo = Path(__file__).resolve().parents[1]
    proc = subprocess.run(
        [sys.executable, str(repo / "scripts" / "merge_results.py"),
         str(merged_path)] + [str(p) for p in shard_paths],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr
    assert json.loads(merged_path.read_text()) == single
