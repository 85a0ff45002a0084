"""Experiment-runner mode contracts (seventeenth review):

- FBP --visualize-only and LIME --save-visualizations-only are CHIP-FREE:
  pure matplotlib post-processing must not pay (or fail on) the TPU boot.
- The LIME audio-save arms end before visualization (reference parity:
  reference run_LIME_experiment.py:222-224) — they must not regenerate
  PNGs from a previous full run's explanations.
- LIME viz-only with no explanations exits 1 (reference :218).
"""

import json
import sys
from pathlib import Path

import pandas as pd
import pytest

ROOT = Path(__file__).resolve().parents[1]
for p in (str(ROOT), str(ROOT / "scripts" / "experiments")):
    if p not in sys.path:
        sys.path.insert(0, p)


def _lime_mod():
    import importlib

    return importlib.import_module("run_LIME_experiment")


def _forbid_predictor(monkeypatch, mod):
    def boom(_cfg):
        raise AssertionError("build_predictor must not run in a host-only mode")

    monkeypatch.setattr(mod, "build_predictor", boom)


def test_fbp_visualize_only_needs_no_predictor(tmp_path):
    """FrequencyBandPerturbation(predictor=None) builds no engine and still
    renders the aggregate visualizations."""
    from adx_tpu.explainers.fbp import FrequencyBandPerturbation

    fbp = FrequencyBandPerturbation(predictor=None)
    assert fbp.engine is None
    # the gain precompute is a device round-trip (band_gain_matrix is jax) —
    # host-side-only instances must skip it or they stall on the TPU grant
    assert fbp._gains is None and fbp._freqs is None
    df = pd.DataFrame(
        {
            "file_path": ["a.wav", "b.wav"],
            "file_name": ["a.wav", "b.wav"],
            "folder": ["REAL", "SUNO"],
            "global_mean_importance": [0.1, -0.2],
            "global_max_importance": [0.3, 0.0],
            "global_min_importance": [-0.1, -0.4],
            "global_std_importance": [0.05, 0.1],
            "bands": [
                [{"name": "bass", "low": 60, "high": 250, "importance": 0.2,
                  "component": "mixture"}],
                [{"name": "bass", "low": 60, "high": 250, "importance": -0.3,
                  "component": "mixture"}],
            ],
        }
    )
    out = tmp_path / "viz"
    fbp.visualize_results(df, output_dir=out)
    assert list(out.rglob("*.png"))


def test_fbp_host_only_compute_raises_clearly(tmp_path):
    """A host-only instance hitting a compute path must fail with an
    explanatory RuntimeError, not AttributeError on engine=None (ADVICE r3)."""
    import numpy as np

    from adx_tpu.explainers.fbp import FrequencyBandPerturbation

    fbp = FrequencyBandPerturbation(predictor=None)
    with pytest.raises(RuntimeError, match="host-only"):
        fbp.process_audio_file("x.wav", tmp_path)
    with pytest.raises(RuntimeError, match="host-only"):
        fbp._compute_component_importance(np.zeros(100), "mixture", "x.wav")
    with pytest.raises(RuntimeError, match="host-only"):
        fbp._precompute_group(["x.wav"])


def _lime_cfg(tmp_path):
    cfg = {
        "dataset": {"dataset_path": str(tmp_path / "Data")},
        "model": {"local": True, "local_model": "tiny"},
        "lime": {"models_to_explain": ["REAL"]},
        "output": {"result_path": str(tmp_path / "res"), "experiment_name": "E"},
        "visualization": {"overall": True, "per_model": True},
    }
    import yaml

    p = tmp_path / "lime.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return p


def test_lime_viz_only_is_chip_free_and_exits_1_when_empty(tmp_path, monkeypatch):
    mod = _lime_mod()
    _forbid_predictor(monkeypatch, mod)
    monkeypatch.setattr(sys, "argv", [
        "run_LIME_experiment.py", "--config", str(_lime_cfg(tmp_path)),
        "--save-visualizations-only",
    ])
    with pytest.raises(SystemExit) as ei:
        mod.main()
    assert ei.value.code == 1  # nothing to render → reference exits 1


def test_lime_viz_only_rejects_audio_save_combo(tmp_path, monkeypatch):
    """viz-only builds no predictor so no audio would be saved — the combo
    used to print 'completed with separated audio saved' and exit 0
    (ADVICE r3)."""
    mod = _lime_mod()
    _forbid_predictor(monkeypatch, mod)
    monkeypatch.setattr(sys, "argv", [
        "run_LIME_experiment.py", "--config", str(_lime_cfg(tmp_path)),
        "--save-visualizations-only", "--save-separated-audio", "separated",
    ])
    with pytest.raises(SystemExit) as ei:
        mod.main()
    assert ei.value.code == 2  # argparse error


def test_lime_audio_save_arm_skips_visualization(tmp_path, monkeypatch):
    """A previous full run left explanations.json; the reversed audio-save
    arm must neither rebuild visualizations nor touch them."""
    mod = _lime_mod()
    monkeypatch.setattr(mod, "build_predictor", lambda cfg: object())

    ran = {}

    def fake_safe(**kwargs):
        ran["safe"] = True
        assert kwargs["save_reversed_separated_audio_only"] is True
        return None, None

    monkeypatch.setattr(mod, "run_lime_experiment_safe", fake_safe)

    def no_viz(*a, **k):
        raise AssertionError("audio-save arm must not visualize")

    monkeypatch.setattr(mod, "visualize_explanations", no_viz)
    monkeypatch.setattr(mod, "visualize_explanations_by_model", no_viz)

    expl = tmp_path / "res" / "E" / "full_track" / "explanations.json"
    expl.parent.mkdir(parents=True)
    expl.write_text(json.dumps({"REAL": {"t": {"explanations": {}}}}))

    monkeypatch.setattr(sys, "argv", [
        "run_LIME_experiment.py", "--config", str(_lime_cfg(tmp_path)),
        "--save-separated-audio", "reversed", "--no-checkpoint",
    ])
    mod.main()  # returns without SystemExit and without visualizing
    assert ran["safe"]


def test_fbp_end_of_run_renders_aggregates(tmp_path, monkeypatch):
    """A fresh full FBP experiment run must end with non-empty aggregate
    visualizations. The reference ships its per-row 'bands' key commented
    out (src/dsp_band_ops.py:852) so ITS end-of-run aggregate pass always
    prints 'No bands data' and writes nothing — we deviate where broken by
    re-loading the per-file bands metadata the run just saved (same
    enrichment the --visualize-only path already does)."""
    import importlib

    import numpy as np
    import yaml

    from adx_tpu.io.audio_io import write_wav

    mod = importlib.import_module("run_FBP_experiment")

    sr = 8000
    data = tmp_path / "Data"
    rng = np.random.default_rng(0)
    n = sr // 2
    t = np.arange(n) / sr
    for model in ["REAL", "SUNO"]:
        for i in range(2):
            y = 0.4 * np.sin(2 * np.pi * (300 + 200 * i) * t) + 0.05 * rng.standard_normal(n)
            write_wav(data / model / f"track_{i}.wav", y.astype(np.float32), sr)

    cfg = {
        "dataset": {"base_path": str(data),
                    "models_to_process": ["REAL", "SUNO"],
                    "max_samples_per_model": 2},
        "model": {"local": True, "local_model": "tiny"},
        "bands": {"preset": "default",
                  "presets": {"default": [[100, 500], [500, 1500]]},
                  "attenuation": 0.25,
                  "transition": {"mode": "abs", "hz": 50.0}},
        "spectrogram": {"sr": sr, "duration": 0.5, "n_fft": 256,
                        "hop_length": 128, "win_length": 256,
                        "spec_type": "stft"},
        "explainability": {"use_separation": False,
                           "normalize_loudness": True},
        "output": {"result_path": str(tmp_path / "res"),
                   "experiment_name": "E"},
        "checkpoint": {"enabled": False},
    }
    cfg_path = tmp_path / "fbp.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    monkeypatch.setattr(sys, "argv", [
        "run_FBP_experiment.py", "--config", str(cfg_path), "--no-checkpoint",
    ])
    mod.main()

    viz = tmp_path / "res" / "E" / "aggregate_visualizations"
    pngs = {p.name for p in viz.glob("*.png")}
    # the band-level families require the re-loaded bands; presence of
    # heatmap_model_x_band.png is the regression gate
    assert "heatmap_model_x_band.png" in pngs, pngs
    assert len(pngs) >= 4
