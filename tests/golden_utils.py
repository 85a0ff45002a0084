"""Golden regression tree: deterministic generation + comparison.

The tree pins the JSON outputs of every result family (predictions, FBP,
occlusion, LIME explanations, features) for a tiny seeded dataset on the
CPU×8 test mesh. Any numerics change — intended or not — fails
``tests/test_goldens.py`` until the goldens are regenerated, making every
future value move explicit instead of discovered-by-diff at sweep time
(VERDICT r3 item 5: this round moved values twice — PCM16 scale, pyin
rework — with no gate).

Refresh procedure (run from the repo root, AFTER reviewing why values
moved):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/make_goldens.py

then commit the diff under ``tests/goldens/`` together with the change
that moved the values and a commit-message note saying why.
"""

from __future__ import annotations

import json
import math
from pathlib import Path

import numpy as np

SR = 8000
GOLDEN_FILES = (
    "predictions.json",
    "fbp_results.json",
    "occlusion_results.json",
    "explanations.json",
    "features.json",
    # VERDICT r4 item 7: the surfaces whose drift was historically caught
    # only by cross-sweep diffing
    "explanations_segmented.json",
    "summary_statistics.csv",
    "fbp_runs_compare.csv",
)


def make_dataset(root: Path) -> Path:
    """2 models × 2 deterministic 1 s tracks at 8 kHz."""
    from adx_tpu.io.audio_io import write_wav

    rng = np.random.default_rng(20260819)
    n = SR
    t = np.arange(n) / SR
    for model in ("REAL", "SUNO"):
        for i in range(2):
            y = (
                0.3 * np.sin(2 * np.pi * (210 + 60 * i + (37 if model == "SUNO" else 0)) * t)
                + 0.1 * np.sin(2 * np.pi * 3 * t) * np.sin(2 * np.pi * 880 * t)
                + 0.05 * rng.standard_normal(n)
            ).astype(np.float32)
            write_wav(root / model / f"track_{i}.wav", y, SR)
    return root


def generate_tree(dst: Path) -> None:
    """Generate every golden JSON into ``dst`` (assumes the CPU test mesh —
    same env as tests/conftest.py)."""
    from adx_tpu.explainers.fbp import FrequencyBandPerturbation
    from adx_tpu.explainers.lime_explainer import run_lime_experiment_safe
    from adx_tpu.explainers.occlusion import SpectrogramExplainability
    from adx_tpu.features.calculate import run_features_extraction
    from adx_tpu.predict import LocalSonics
    from adx_tpu.predictions import run_sonics_predictions

    dst = Path(dst)
    dst.mkdir(parents=True, exist_ok=True)
    work = dst / "_work"
    dataset = make_dataset(work / "dataset")
    predictor = LocalSonics.from_pretrained("tiny", max_batch=8)
    dur = predictor.cfg.audio.duration

    run_sonics_predictions(
        predictor, dataset_path=dataset,
        explanations_path=dst / "predictions.json", sample_rate=SR,
    )

    fbp = FrequencyBandPerturbation(
        predictor=predictor, sr=SR, duration=dur, n_fft=256, hop_length=128,
        win_length=256, spec_type="stft", use_separation=False,
        preset="golden",
        presets={"golden": [(0, 500), (500, 2000), (2000, 4000)]},
    )
    fbp.run_experiment(
        base_path=dataset, output_dir=work / "fbp",
        results_path=dst / "fbp_results.json",
    )

    occ = SpectrogramExplainability(
        predictor=predictor, sr=SR, duration=dur, n_fft=256, hop_length=128,
        win_length=256, spec_type="stft", method="occlusion",
        use_original_audio=False, patch_time_frames=8, stride_time_frames=8,
        patch_freq_percent=50.0, stride_freq_percent=50.0, top_n_windows=1,
    )
    occ.run_experiment(
        base_path=dataset, output_dir=work / "occ", baseline_threshold=0.0,
        results_path=dst / "occlusion_results.json",
    )

    run_lime_experiment_safe(
        predictor=predictor, model_time=float(dur), explain=True,
        max_samples_explain=2, dataset_path=dataset, num_samples_lime=32,
        models_to_explain=["REAL", "SUNO"], ids_to_explain=[0, 1],
        checkpoint_dir=None,
        explanations_path=str(dst / "explanations.json"),
        # segmented mode on the same tracks: 1 s tracks / 0.5 s model → 2
        # segments each (the reference's `model_prediction: null` quirk and
        # segment keying are pinned here)
        segmented_explanations=True,
        segment_duration=float(dur),
        segmented_explanations_path=str(dst / "explanations_segmented.json"),
        # segments are explained via exported per-segment WAVs (reference
        # design) — without this dir the segment loop has nothing to explain
        features_output_dir_segmented=str(work / "lime_seg"),
    )

    # summary_statistics.csv through the production aggregate writer
    # (viz/saliency.py::visualize_aggregate_results — the groupby/round
    # surface that drifted silently before the goldens existed)
    import pandas as pd

    from adx_tpu.viz.saliency import visualize_aggregate_results

    occ_csvs = sorted(
        p for p in (work / "occ").glob("spectrogram_results_*.csv")
        if not p.name.endswith("_progress.csv")
    )
    visualize_aggregate_results(pd.read_csv(occ_csvs[-1]), work / "occ_agg")
    (dst / "summary_statistics.csv").write_text(
        (work / "occ_agg" / "summary_statistics.csv").read_text()
    )

    # runs-compare intersection: the same FBP run under two taxonomy-labeled
    # roots, run B missing one track so the common-keys filter actually
    # filters (viz/runs_compare.py::load_fbp_bands_for_runs)
    import shutil

    from adx_tpu.viz.runs_compare import load_fbp_bands_for_runs

    run_a = work / "runs" / "minus14" / "fbp_exp"
    run_b = work / "runs" / "minus14_noise_snr30" / "fbp_exp"
    shutil.copytree(work / "fbp", run_a)
    shutil.copytree(work / "fbp", run_b)
    drop = sorted((run_b / "bands" / "SUNO").iterdir())[-1]
    shutil.rmtree(drop)
    df_common, _labels = load_fbp_bands_for_runs([str(run_a), str(run_b)])
    df_common.to_csv(dst / "fbp_runs_compare.csv", index=False)

    run_features_extraction(
        dataset_path=dataset, model_time=float(dur), max_samples=2,
        models_to_get_features=["REAL", "SUNO"],
        ids_to_get_features=[0, 1],
        features_output_dir_full=work / "features",
        full_track_features=True, segmented_features=False, sample_rate=SR,
    )
    (dst / "features.json").write_text(
        (work / "features" / "features.json").read_text()
    )

    import shutil

    shutil.rmtree(work)


def normalize(obj):
    """Strip run-specific noise so trees from different tmp dirs compare:
    path-valued strings reduce to their basename; floats round-trip through
    repr (what json emits) so the comparison is on serialized values."""
    if isinstance(obj, dict):
        return {
            k: (Path(v).name if k in ("file_path",) and isinstance(v, str) else normalize(v))
            for k, v in obj.items()
        }
    if isinstance(obj, list):
        return [normalize(v) for v in obj]
    return obj


def diff_trees(golden_dir: Path, fresh_dir: Path, rel_tol: float = 0.0):
    """Return a list of human-readable differences between the two trees
    (empty = identical after normalization). ``rel_tol`` > 0 tolerates that
    relative drift on floats (0.0 = exact)."""
    problems = []
    for name in GOLDEN_FILES:
        g, f = Path(golden_dir) / name, Path(fresh_dir) / name
        if not g.exists():
            problems.append(f"{name}: golden missing (run scripts/make_goldens.py)")
            continue
        if not f.exists():
            problems.append(f"{name}: fresh tree failed to produce it")
            continue
        if name.endswith(".csv"):
            # CSVs carry no run-specific paths — byte-equal is the contract
            if g.read_text() != f.read_text():
                problems.append(f"{name}: CSV bytes differ")
            continue
        a = normalize(json.loads(g.read_text()))
        b = normalize(json.loads(f.read_text()))
        _walk(name, a, b, problems, rel_tol)
    return problems


def _walk(path, a, b, problems, rel_tol):
    if type(a) is not type(b) and not (
        isinstance(a, (int, float)) and isinstance(b, (int, float))
    ):
        problems.append(f"{path}: type {type(a).__name__} != {type(b).__name__}")
        return
    if isinstance(a, dict):
        if set(a) != set(b):
            problems.append(
                f"{path}: keys differ (only-golden={sorted(set(a) - set(b))}, "
                f"only-fresh={sorted(set(b) - set(a))})"
            )
            return
        for k in a:
            _walk(f"{path}.{k}", a[k], b[k], problems, rel_tol)
    elif isinstance(a, list):
        if len(a) != len(b):
            problems.append(f"{path}: length {len(a)} != {len(b)}")
            return
        for i, (x, y) in enumerate(zip(a, b)):
            _walk(f"{path}[{i}]", x, y, problems, rel_tol)
    elif isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return
        if fa != fb and (
            rel_tol == 0.0 or abs(fa - fb) > rel_tol * max(abs(fa), abs(fb), 1e-12)
        ):
            problems.append(f"{path}: {fa!r} != {fb!r}")
    elif a != b:
        problems.append(f"{path}: {a!r} != {b!r}")
