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


def test_explain_tracks_matches_single(tmp_path, rng):
    """Batched multi-track explain ≡ per-track explain_track (records in
    input order, mixed lengths grouped internally)."""
    from adx_tpu.explain import explain_tracks

    predictor = LocalSonics.from_pretrained("tiny", max_batch=8)
    dur = predictor.cfg.audio.duration
    n_full = int(SR * dur)
    paths = []
    for i, frac in enumerate((1.0, 1.0, 0.5)):  # two full, one shorter
        n = int(n_full * frac)
        t = np.arange(n) / SR
        y = (0.3 * np.sin(2 * np.pi * (250 + 60 * i) * t)
             + 0.02 * rng.standard_normal(n)).astype(np.float32)
        p = tmp_path / f"trk_{i}.wav"
        write_wav(p, y, SR)
        paths.append(p)

    kw = dict(
        predictor=predictor, sr=SR, duration=dur,
        n_fft=256, hop_length=128, win_length=256,
        patch_time_frames=8, stride_time_frames=8,
        patch_freq_percent=50.0, stride_freq_percent=50.0,
        num_samples_lime=16, save_figures=False,
    )
    singles = [explain_track(p, **kw) for p in paths]
    multis = explain_tracks(paths, out_dir=tmp_path / "out", **kw)

    assert len(multis) == 3
    for single, multi, p in zip(singles, multis, paths):
        assert multi["track_stem"] == single["track_stem"]
        assert multi["baseline_pred"] == pytest.approx(
            single["baseline_pred"], abs=1e-5)
        for bs, bm in zip(single["fbp"]["bands"], multi["fbp"]["bands"]):
            assert bm["importance"] == pytest.approx(bs["importance"], abs=2e-4)
        assert multi["occlusion"]["n_patches"] == single["occlusion"]["n_patches"]
        assert multi["occlusion"]["mean_importance"] == pytest.approx(
            single["occlusion"]["mean_importance"], abs=2e-4)
        for comp, w in single["lime"]["component_influences"].items():
            assert multi["lime"]["component_influences"][comp] == pytest.approx(
                w, abs=1e-3)
        assert multi["batch_size"] in (1, 2)
        assert (tmp_path / "out" / f"{multi['track_stem']}_explanation.json").exists()
    # the two full-length tracks shared one batch; the short one ran alone
    assert [m["batch_size"] for m in multis] == [2, 2, 1]
    # per-record timing is per-GROUP elapsed, not cumulative across groups:
    # each group's stages nest inside its own window, and the groups'
    # windows are disjoint (a cumulative clock would double-count group 1
    # inside group 2's figure)
    group_elapsed = {m["explain_seconds"] for m in multis}
    assert len(group_elapsed) == 2  # one figure per length group
    for m in multis:
        assert m["explain_seconds"] >= sum(m["stage_seconds"].values()) - 0.05
        assert "decode_seconds" in m
    total_wall = sum(group_elapsed) + multis[0]["decode_seconds"]
    for m in multis:
        assert m["explain_seconds"] < total_wall


def test_explain_tracks_waveform_inputs_get_unique_stems(tmp_path, rng):
    """Raw-waveform inputs must write distinct out_dir files (a shared ''
    stem silently overwrote every record but the last)."""
    from adx_tpu.explain import explain_tracks

    predictor = LocalSonics.from_pretrained("tiny", max_batch=8)
    dur = predictor.cfg.audio.duration
    n = int(SR * dur)
    t = np.arange(n) / SR
    waves = [
        (0.3 * np.sin(2 * np.pi * f * t)
         + 0.02 * rng.standard_normal(n)).astype(np.float32)
        for f in (260.0, 390.0)
    ]
    out = tmp_path / "out"
    recs = explain_tracks(
        waves, predictor=predictor, sr=SR, duration=dur,
        n_fft=256, hop_length=128, win_length=256,
        patch_time_frames=8, stride_time_frames=8,
        patch_freq_percent=50.0, stride_freq_percent=50.0,
        num_samples_lime=16, save_figures=False, out_dir=out,
    )
    stems = [r["track_stem"] for r in recs]
    assert len(set(stems)) == 2 and all(stems)
    for stem in stems:
        assert (out / f"{stem}_explanation.json").exists()


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


def test_explain_tracks_dedup_avoids_existing_stem(tmp_path, rng):
    """runA/song.wav + runB/song.wav + runC/song_1.wav: the duplicate
    'song' must NOT be renamed onto the legitimate 'song_1' (its outputs
    would be clobbered)."""
    from adx_tpu.explain import explain_tracks
    from adx_tpu.io.audio_io import write_wav

    predictor = LocalSonics.from_pretrained("tiny", max_batch=8)
    dur = predictor.cfg.audio.duration
    n = int(SR * dur)
    t = np.arange(n) / SR
    paths = []
    for sub, name, f in [("runA", "song.wav", 260.0),
                         ("runB", "song_1.wav", 330.0),
                         ("runC", "song.wav", 400.0)]:
        y = (0.3 * np.sin(2 * np.pi * f * t)
             + 0.02 * rng.standard_normal(n)).astype(np.float32)
        p = tmp_path / sub / name
        write_wav(p, y, SR)
        paths.append(str(p))
    out = tmp_path / "out"
    recs = explain_tracks(
        paths, predictor=predictor, sr=SR, duration=dur,
        n_fft=256, hop_length=128, win_length=256,
        patch_time_frames=8, stride_time_frames=8,
        patch_freq_percent=50.0, stride_freq_percent=50.0,
        num_samples_lime=16, save_figures=False, out_dir=out,
    )
    stems = [r["track_stem"] for r in recs]
    assert len(set(stems)) == 3, stems
    assert stems[0] == "song" and stems[1] == "song_1"
    assert stems[2] not in ("song", "song_1")
