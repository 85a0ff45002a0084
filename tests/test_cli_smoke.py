"""CLI smoke tests: every runner must parse --help (import integrity for the
whole scripts tree without running experiments)."""

import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]

SCRIPTS = [
    "scripts/experiments/run_FBP_experiment.py",
    "scripts/experiments/run_spectrogram_experiment.py",
    "scripts/experiments/run_LIME_experiment.py",
    "scripts/run_sonics_predictions.py",
    "scripts/run_sonics_pred_vis.py",
    "scripts/run_sep_predictions.py",
    "scripts/run_dataprep.py",
    "scripts/train_spectttra.py",
    "scripts/parity_check.py",
    "scripts/convert_spleeter.py",
    "scripts/compare_librosa_golden.py",
    "scripts/cleanup_fbp_audio.py",
    "scripts/explain_track.py",
    "scripts/serve_sonics.py",
    "scripts/feature_extraction/run_features_extraction.py",
    "scripts/feature_extraction/run_lime_features.py",
    "scripts/feature_extraction/run_fbp_patch_features.py",
    "scripts/feature_extraction/run_occlusion_patch_features.py",
    "scripts/feature_visualizations/run_overall_features_vis.py",
    "scripts/feature_visualizations/run_LIME_features_vis.py",
    "scripts/feature_visualizations/run_FBP_features_vis.py",
    "scripts/feature_visualizations/run_Occlusion_features_vis.py",
    "scripts/runs_comparision/compare_predictions_across_runs.py",
    "scripts/runs_comparision/compare_fbp_results_across_runs.py",
    "scripts/runs_comparision/compare_occlusion_results_across_runs.py",
    "scripts/runs_comparision/compare_audiolime_results_across_runs.py",
]


@pytest.mark.parametrize("script", SCRIPTS)
def test_cli_help(script):
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    result = subprocess.run(
        [sys.executable, str(ROOT / script), "--help"],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert result.returncode == 0, f"{script}: {result.stderr[-500:]}"
    assert "usage" in result.stdout.lower()
