"""End-to-end FBP experiment test on a synthetic mini-dataset (tiny model).

Checks the full driver surface: dataset walk, batched band evaluation,
bands metadata JSON schema, fbp_results.json merge, progress CSV, checkpoint
skip on rerun — the reference's output contract (SURVEY.md §5.4, §2.2)."""

import json

import numpy as np
import pytest

from adx_tpu.explainers.fbp import FrequencyBandPerturbation
from adx_tpu.io.audio_io import write_wav
from adx_tpu.predict import LocalSonics


SR = 8000


@pytest.fixture(scope="module")
def predictor():
    return LocalSonics.from_pretrained("tiny", max_batch=8)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("FakeRealMini")
    rng = np.random.default_rng(0)
    n = SR // 2
    t = np.arange(n) / SR
    for model in ["REAL", "SUNO"]:
        for i in range(2):
            y = 0.4 * np.sin(2 * np.pi * (300 + 200 * i) * t) + 0.05 * rng.standard_normal(n)
            write_wav(root / model / f"track_{i}.wav", y.astype(np.float32), SR)
    return root


def make_fbp(predictor, tmp, **kw):
    defaults = dict(
        predictor=predictor,
        preset="default",
        presets={"default": [(100, 500), (500, 1500), (1500, 3000)]},
        attenuation=0.25,
        transition_mode="abs",
        transition_hz=50.0,
        sr=SR,
        duration=predictor.cfg.audio.duration,
        n_fft=256,
        hop_length=128,
        win_length=256,
        spec_type="stft",
        normalize_loudness=True,
        checkpoint_dir=tmp / "checkpoints",
    )
    defaults.update(kw)
    return FrequencyBandPerturbation(**defaults)


def test_fbp_experiment_end_to_end(predictor, dataset, tmp_path):
    fbp = make_fbp(predictor, tmp_path)
    out = tmp_path / "out"
    df = fbp.run_experiment(
        base_path=dataset, output_dir=out, models_to_process=["REAL", "SUNO"],
        max_samples_per_model=2, results_path=out / "fbp_results.json",
    )
    assert len(df) == 4

    # results JSON: {model: {file: {...reference keys...}}}
    results = json.loads((out / "fbp_results.json").read_text())
    assert set(results) == {"REAL", "SUNO"}
    entry = results["REAL"]["track_0"]
    for key in (
        "file_path", "file_name", "folder", "components",
        "global_mean_importance", "global_max_importance",
        "global_min_importance", "global_std_importance",
    ):
        assert key in entry
    assert "mixture" in entry["components"]
    comp = entry["components"]["mixture"]
    assert set(comp) == {
        "baseline_pred_mean", "mean_importance", "max_importance",
        "min_importance", "std_importance",
    }

    # bands metadata JSON schema
    meta_path = out / "bands" / "REAL" / "track_0" / "mixture" / "track_0_bands_metadata.json"
    meta = json.loads(meta_path.read_text())
    assert meta["file_name"] == "track_0"
    assert len(meta["bands"]) == 3
    band = meta["bands"][0]
    assert set(band) == {"component", "low", "high", "importance", "abs_importance", "type"}
    assert band["type"] in ("POSITIVE", "NEGATIVE", "NEUTRAL")

    # per-track figure outputs
    assert (out / "bands" / "REAL" / "track_0" / "mixture" / "fbp_saliency_track_0.png").exists()
    assert (out / "bands" / "REAL" / "track_0" / "track_0__band_importance.png").exists()
    # progress CSV + timestamped final CSV
    assert (out / "FBP_results_progress.csv").exists()
    assert list(out.glob("fbp_results_*.csv"))


def test_fbp_checkpoint_skips_processed(predictor, dataset, tmp_path):
    fbp = make_fbp(predictor, tmp_path)
    out = tmp_path / "out"
    df1 = fbp.run_experiment(base_path=dataset, output_dir=out, max_samples_per_model=1)
    processed = fbp.checkpoint.load_processed_files()
    assert len(processed) == 2  # one per model folder
    # second run skips everything (results carried from progress CSV)
    df2 = fbp.run_experiment(base_path=dataset, output_dir=out, max_samples_per_model=1)
    assert len(df2) == len(df1)


def test_fbp_importance_map_band_structure(predictor, dataset, tmp_path):
    """The map must be constant within a band's core rows and equal to that
    band's delta (reference accumulation semantics, src/dsp_band_ops.py:652-653)."""
    fbp = make_fbp(predictor, tmp_path)
    from adx_tpu.io.audio_io import load_audio

    y, _ = load_audio(next((dataset / "REAL").glob("*.wav")), sr=SR)
    res = fbp._compute_component_importance(y, "mixture", "x.wav")
    assert res is not None
    band = fbp.bands[1]
    sel = (fbp._freqs >= band[0]) & (fbp._freqs <= band[1])
    sel_only = sel & ~np.any(
        [np.asarray((fbp._freqs >= b[0]) & (fbp._freqs <= b[1])) for b in fbp.bands if b != band],
        axis=0,
    )
    rows = res.importance_map[sel_only]
    delta = res.batch_importances[1]["importance"]
    np.testing.assert_allclose(rows, delta, atol=1e-6)


def test_fbp_save_audio_modes(predictor, dataset, tmp_path):
    fbp = make_fbp(
        predictor, tmp_path, save_perturbed_audio_only=True, checkpoint_dir=None
    )
    out = tmp_path / "outaudio"
    df = fbp.run_experiment(
        base_path=dataset, output_dir=out, models_to_process=["REAL"], max_samples_per_model=1
    )
    assert df.empty
    batch_dir = out / "bands" / "REAL" / "track_0" / "mixture" / "separated_bands" / "freq_batches"
    wavs = list(batch_dir.glob("*.wav"))
    assert len(wavs) == 3
    # filename format: {file}__{comp}__{low}-{high}Hz_{TYPE}_{delta:+.3f}.wav
    assert any("track_0__mixture__100-500Hz_" in w.name for w in wavs)


def test_fbp_track_batch_matches_serial(predictor, dataset, tmp_path):
    """Grouped multi-track sweep (VERDICT r2 item 3) ≡ per-file dispatch:
    the fbp_results.json trees must agree to float tolerance."""
    out_s = tmp_path / "serial"
    out_g = tmp_path / "grouped"
    df_s = make_fbp(predictor, tmp_path / "cks").run_experiment(
        base_path=dataset, output_dir=out_s, results_path=out_s / "fbp_results.json",
    )
    df_g = make_fbp(predictor, tmp_path / "ckg", track_batch=3).run_experiment(
        base_path=dataset, output_dir=out_g, results_path=out_g / "fbp_results.json",
    )
    assert len(df_s) == len(df_g) == 4

    res_s = json.loads((out_s / "fbp_results.json").read_text())
    res_g = json.loads((out_g / "fbp_results.json").read_text())
    assert res_s.keys() == res_g.keys()
    for model in res_s:
        assert res_s[model].keys() == res_g[model].keys()
        for fn in res_s[model]:
            a, b = res_s[model][fn], res_g[model][fn]
            for comp in a["components"]:
                for k, v in a["components"][comp].items():
                    assert abs(v - b["components"][comp][k]) < 1e-4, (fn, comp, k)
            for k in ("global_mean_importance", "global_max_importance",
                      "global_min_importance", "global_std_importance"):
                assert abs(a[k] - b[k]) < 1e-4, (fn, k)

    # per-band metadata also agrees
    for model in res_s:
        for fn in res_s[model]:
            ms = json.loads((out_s / "bands" / model / fn / "mixture" /
                             f"{fn}_bands_metadata.json").read_text())
            mg = json.loads((out_g / "bands" / model / fn / "mixture" /
                             f"{fn}_bands_metadata.json").read_text())
            for bs, bg in zip(ms["bands"], mg["bands"]):
                assert abs(bs["importance"] - bg["importance"]) < 1e-4


def test_fbp_negative_track_batch_clamped(predictor, dataset, tmp_path):
    """track_batch: -2 in a config must not make every file-group slice
    empty (the old step-only guard exited 'No results!' with no hint)."""
    out = tmp_path / "negtb"
    df = make_fbp(predictor, tmp_path / "ckn", track_batch=-2).run_experiment(
        base_path=dataset, output_dir=out, results_path=out / "fbp_results.json",
    )
    assert len(df) == 4
