"""Feature driver tests: dataset walk, features.json schema, merge rules."""

import json

import numpy as np
import pytest

from adx_tpu.features.calculate import run_features_extraction
from adx_tpu.io.audio_io import write_wav
from adx_tpu.io.results import append_update_features

SR = 8000


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    rng = np.random.default_rng(1234)
    root = tmp_path_factory.mktemp("FeatMini")
    n = SR
    t = np.arange(n) / SR
    for model in ["REAL", "UDIO"]:
        for i in range(2):
            y = 0.4 * np.sin(2 * np.pi * (180 + 80 * i) * t) + 0.02 * rng.standard_normal(n)
            write_wav(root / model / f"song_{i}.wav", y.astype(np.float32), SR)
    return root


def test_run_features_extraction_full_track(dataset, tmp_path):
    out = tmp_path / "features_out"
    run_features_extraction(
        dataset_path=dataset,
        max_samples=2,
        models_to_get_features=["REAL", "UDIO"],
        ids_to_get_features=[0, 1],
        features_output_dir_full=str(out),
        full_track_features=True,
        segmented_features=False,
        sample_rate=SR,
    )
    data = json.loads((out / "features.json").read_text())
    assert set(data) == {"REAL", "UDIO"}
    entry = data["REAL"]["song_0"]
    assert entry["type"] == "full_track"
    seg = entry["segments"]
    assert seg["segment_id"] == "full_track"
    assert seg["segment_meta"]["component"] == "mixture"
    feats = seg["features"]["mix"]
    assert "spectral_centroid" in feats and "jitter" in feats and "rhythm_stats" in feats
    # JSON round-trippable (all native types)
    json.dumps(data)


def test_run_features_extraction_segmented(dataset, tmp_path):
    out = tmp_path / "seg_out"
    run_features_extraction(
        dataset_path=dataset,
        max_samples=1,
        models_to_get_features=["REAL"],
        ids_to_get_features=[0],
        features_output_dir_full=None,
        features_output_dir_segmented=str(out),
        full_track_features=False,
        segmented_features=True,
        segment_duration=0.5,
        sample_rate=SR,
    )
    data = json.loads((out / "features.json").read_text())
    entry = data["REAL"]["song_0"]
    assert entry["type"] == "segment"
    assert len(entry["segments"]) == 2  # 1 s / 0.5 s
    seg_names = sorted(entry["segments"])
    assert seg_names[0].startswith("segment_0_0s_to_0s") or seg_names[0].startswith("segment_0")
    # per-segment WAVs exported
    assert (out / "REAL" / "song_0" / seg_names[0] / "segment_0.wav").exists()


def test_append_update_features_dont_overwrite_nonempty(tmp_path):
    path = tmp_path / "features.json"
    first = {"M": {"t": {"type": "full_track", "features": {"a": 1}}}}
    append_update_features(first, path)
    second = {"M": {"t": {"type": "full_track", "features": {"a": 999}}}}
    append_update_features(second, path)
    data = json.loads(path.read_text())
    # non-empty features must NOT be overwritten (reference merge policy)
    assert data["M"]["t"]["features"] == {"a": 1}
    # but empty ones must be
    append_update_features({"M": {"u": {"type": "full_track", "features": {}}}}, path)
    append_update_features({"M": {"u": {"type": "full_track", "features": {"b": 2}}}}, path)
    data = json.loads(path.read_text())
    assert data["M"]["u"]["features"] == {"b": 2}
