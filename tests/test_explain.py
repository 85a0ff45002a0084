"""One-call full explanation API test (tiny model, CPU mesh)."""

import json

import numpy as np
import pytest

from adx_tpu.explain import explain_track
from adx_tpu.io.audio_io import write_wav
from adx_tpu.predict import LocalSonics

SR = 8000


def test_explain_track_full_record(tmp_path, rng):
    n = SR // 2
    t = np.arange(n) / SR
    y = (0.3 * np.sin(2 * np.pi * 300 * t) + 0.02 * rng.standard_normal(n)).astype(np.float32)
    path = tmp_path / "song x.wav"
    write_wav(path, y, SR)

    predictor = LocalSonics.from_pretrained("tiny", max_batch=8)
    record = explain_track(
        path, predictor=predictor, sr=SR, duration=predictor.cfg.audio.duration,
        n_fft=256, hop_length=128, win_length=256,
        patch_time_frames=8, stride_time_frames=8,
        patch_freq_percent=50.0, stride_freq_percent=50.0,
        num_samples_lime=16, out_dir=tmp_path / "out",
    )
    assert record["track_stem"] == "song_x"
    assert 0.0 <= record["baseline_pred"] <= 1.0
    assert len(record["fbp"]["bands"]) == 6
    assert record["occlusion"]["n_patches"] > 0
    assert len(record["occlusion"]["top_patches"]) <= 5
    assert set(record["lime"]["component_influences"]) == {
        "vocals0", "drums0", "bass0", "other0",
    }
    assert record["explain_seconds"] > 0
    assert set(record["stage_seconds"]) == {
        "analyze_baseline", "fbp", "occlusion", "separation", "lime"
    }

    out = tmp_path / "out"
    saved = json.loads((out / "song_x_explanation.json").read_text())
    assert saved["baseline_pred"] == pytest.approx(record["baseline_pred"], abs=1e-9)
    assert (out / "song_x_occlusion_saliency.png").exists()
    assert (out / "song_x_bar_influences.png").exists()


def test_explain_track_shorter_than_duration(tmp_path, rng):
    """A file shorter than the requested analysis duration must still yield
    a complete record (the reference happily analyzes partial tracks)."""
    predictor = LocalSonics.from_pretrained("tiny", max_batch=8)
    full = predictor.cfg.audio.duration
    n = int(SR * full * 0.4)  # 40% of the analysis window
    t = np.arange(n) / SR
    y = (0.3 * np.sin(2 * np.pi * 250 * t) + 0.02 * rng.standard_normal(n)).astype(np.float32)
    path = tmp_path / "short.wav"
    write_wav(path, y, SR)

    record = explain_track(
        path, predictor=predictor, sr=SR, duration=full,
        n_fft=256, hop_length=128, win_length=256,
        patch_time_frames=4, stride_time_frames=4,
        patch_freq_percent=50.0, stride_freq_percent=50.0,
        num_samples_lime=8, save_figures=False,
    )
    assert 0.0 <= record["baseline_pred"] <= 1.0
    assert record["occlusion"]["n_patches"] > 0
    assert np.isfinite([b["importance"] for b in record["fbp"]["bands"]]).all()
