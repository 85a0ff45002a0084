#!/usr/bin/env python
"""Degradation-robustness chain: dataprep → per-run sweeps → runs comparison.

The reference's only systemic sanity check (SURVEY.md §4.2) is re-running
the same experiments on loudness-normalized + degraded dataset variants and
overlaying the results per track: the notebook dataprep arms
(Notebooks/0. AnalyzeSongs/analyzesongs.ipynb cell 7) feed the path
taxonomy ``minus{14,23}/{base,resample22k,noise_snr30,reverb_room}/GROUP/…``
that the four ``scripts/runs_comparision/compare_*_across_runs.py`` scripts
parse back into run labels (e.g. ``m14_reverb_room``,
compare_fbp_results_across_runs.py:66-93) and intersect on common keys
(:182-197).

This driver chains the WHOLE workflow in one process (same rationale as
scripts/run_full_pipeline.py: one TPU boot, shared predictor + engines):

1. optionally synthesize a small model-folder dataset,
2. dataprep: LUFS bases × degradation arms via adx_tpu.dataprep,
3. per run: predictions / FBP / occlusion / LIME sweeps through the REAL
   CLI runners (runpy, exactly as invoked standalone),
4. the four cross-run comparison scripts,
5. artifact validation (every run's results present, every comparison
   produced plots).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np
import yaml

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))
if str(ROOT / "scripts") not in sys.path:
    sys.path.insert(0, str(ROOT / "scripts"))

from run_full_pipeline import _print_summary, run_stage  # noqa: E402  (one-process stage runner)


def make_synthetic_dataset(root: Path, models, tracks_per_model: int,
                           seconds: float, sr: int) -> None:
    """Model-folder dataset of distinct tones+noise tracks (16-bit WAV)."""
    from adx_tpu.io.audio_io import write_wav

    rng = np.random.default_rng(0)
    n = int(seconds * sr)
    t = np.arange(n) / sr
    for mi, model in enumerate(models):
        for i in range(tracks_per_model):
            f0 = 180.0 + 70.0 * mi + 45.0 * i
            y = (
                0.35 * np.sin(2 * np.pi * f0 * t)
                + 0.15 * np.sin(2 * np.pi * 2.7 * f0 * t + 0.4)
                + 0.04 * rng.standard_normal(n)
            )
            # gentle AM so LUFS/degradations have structure to work on
            y *= 0.7 + 0.3 * np.sin(2 * np.pi * 0.5 * t + i)
            write_wav(root / model / f"track_{i}.wav", y.astype(np.float32), sr)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out-root", required=True)
    ap.add_argument("--dataset", default=None,
                    help="Existing model-folder dataset (default: synthesize one)")
    ap.add_argument("--models", nargs="*", default=["REAL", "SUNO"])
    ap.add_argument("--tracks-per-model", type=int, default=2)
    ap.add_argument("--track-seconds", type=float, default=12.0,
                    help="Synthetic track length; also the FBP/occlusion "
                         "analysis crop for the synthetic dataset")
    ap.add_argument("--duration", type=float, default=None,
                    help="FBP/occlusion analysis crop in seconds. Defaults "
                         "to --track-seconds for the synthetic dataset and "
                         "to the reference's 120 s crop for --dataset (the "
                         "synthetic default would silently crop a user "
                         "dataset to 12 s)")
    ap.add_argument("--sr", type=int, default=44100)
    ap.add_argument("--local-model", default="spectttra-alpha-120s")
    ap.add_argument(
        "--checkpoint-dir", default=None,
        help="classifier weights for every sweep; default: "
        "checkpoints/alpha120s/best when it exists (the committed trained "
        "flagship, like bench.py/serving/stage configs), else random init. "
        "Pass 'random' to force random.")
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--arms", nargs="*",
                    default=["mp3_192", "resample22k", "noise_snr30",
                             "reverb_room"],
                    help="Degradation arms (mp3_192 uses the in-process "
                         "lame/mpg123 codecs, adx_tpu.io.mp3)")
    ap.add_argument("--lufs", nargs="*", type=int, default=[14, 23],
                    help="LUFS bases (minusN)")
    ap.add_argument("--num-samples-lime", type=int, default=500)
    ap.add_argument("--patch-time-frames", type=int, default=256,
                    help="Occlusion patch/stride in frames (scale to track length)")
    ap.add_argument("--skip-lime", action="store_true")
    ap.add_argument("--skip-dataprep", action="store_true",
                    help="Reuse an existing <out-root>/data tree")
    cli = ap.parse_args()

    out = Path(cli.out_root)
    out.mkdir(parents=True, exist_ok=True)
    t_start = time.time()
    timings = []

    # ---- 0. fail fast on taxonomy the chain cannot label --------------------
    # (these would otherwise surface only AFTER hours of successful sweeps,
    # as a "Missing artifacts: run labels" abort at the very end)
    from adx_tpu.dataprep.pipeline import KNOWN_GROUPS
    from adx_tpu.viz.runs_compare import extract_run_label

    unknown_models = [m for m in cli.models if m not in KNOWN_GROUPS]
    if unknown_models:
        # dataprep re-buckets EVERY input (user-supplied --dataset included)
        # via infer_group_from_path, so unknown folder names land in UNKNOWN
        # and the per-model sweeps then find nothing — hours in
        print(f"❌ --models {unknown_models} are not dataprep groups "
              f"({', '.join(KNOWN_GROUPS)}); their tracks would be "
              f"re-bucketed to UNKNOWN and vanish from every sweep")
        sys.exit(2)
    # group keywords match SUBSTRINGS of the whole path (reference parity),
    # and dataprep buckets by SOURCE file path (dataprep/pipeline.py::
    # infer_group_from_path) — so probe the actual source-tree layout the
    # tracks will be read from, before spending hours. For the synthetic flow
    # the source lives under the out-root, so an out-root keyword like
    # /mnt/real/robust is caught too; for --dataset the user's own path is
    # what matters (a keyword there would silently re-bucket every track).
    from adx_tpu.dataprep.pipeline import infer_group_from_path
    data_root = out / "data"
    src_probe_root = Path(cli.dataset) if cli.dataset else out / "source_dataset"
    bad_bucket = {
        m: infer_group_from_path(str(src_probe_root / m / "t.wav"))
        for m in cli.models
    }
    bad_bucket = {m: g for m, g in bad_bucket.items() if g != m}
    if bad_bucket:
        print(f"❌ The source-tree path re-buckets model folders: {bad_bucket}. "
              f"Group keywords match substrings of the FULL path (reference "
              f"parity) — pick a source root ({src_probe_root}) containing no "
              f"group name like 'real' or 'suno'.")
        sys.exit(2)
    probe_labels = sorted({
        extract_run_label(str(out / "results" / "Predictions" / f"minus{l}"
                              / arm / "x" / "predictions.json"))
        for l in cli.lufs for arm in ["base", *cli.arms]
    })
    n_expected = len(cli.lufs) * (1 + len(cli.arms))
    if len(probe_labels) != n_expected:
        print(f"❌ The run-label taxonomy cannot distinguish these runs: "
              f"{n_expected} runs map to labels {probe_labels}. "
              f"extract_run_label knows minus14/minus23 × the notebook arms "
              f"(reference parity), and matches SUBSTRINGS of the full path — "
              f"check --lufs and make sure --out-root ({out}) contains no "
              f"taxonomy keyword like 'base' or 'm14'.")
        sys.exit(2)

    # ---- 1. source dataset -------------------------------------------------
    if cli.dataset:
        src_dataset = Path(cli.dataset)
    else:
        src_dataset = out / "source_dataset"
        n_wavs_expected = len(cli.models) * cli.tracks_per_model
        n_have = len(list(src_dataset.rglob("*.wav"))) if src_dataset.exists() else 0
        if n_have == 0:
            print(f"🎵 Synthesizing dataset: {src_dataset}")
            make_synthetic_dataset(src_dataset, cli.models,
                                   cli.tracks_per_model, cli.track_seconds,
                                   cli.sr)
        elif n_have != n_wavs_expected:
            # a chain killed mid-synthesis (or rerun with different
            # --models/--tracks-per-model) leaves a partial/stale tree that
            # exists-check reuse would silently sweep — fail fast instead
            print(f"❌ {src_dataset} holds {n_have} WAVs but the requested "
                  f"taxonomy needs {n_wavs_expected} "
                  f"({len(cli.models)} models × {cli.tracks_per_model}); "
                  f"delete it (or fix --models/--tracks-per-model) and rerun")
            sys.exit(2)

    # ---- 2. dataprep (data_root defined with the taxonomy probe above) ------
    if not cli.skip_dataprep:
        rc, secs = run_stage(
            "scripts/run_dataprep.py",
            [str(src_dataset), "--out-root", str(data_root),
             "--sr", str(cli.sr), "--arms", *cli.arms,
             "--lufs", *[str(l) for l in cli.lufs]],
        )
        timings.append(("dataprep", rc, secs))
        if rc != 0:
            print("⚠️ interrupted" if rc == 130 else "❌ dataprep failed")
            _print_summary(timings)
            sys.exit(rc)

    runs = [(f"minus{l}", arm) for l in cli.lufs for arm in ["base", *cli.arms]]
    for minus, arm in runs:
        run_dir = data_root / minus / arm
        if not any(run_dir.rglob("*.wav")):
            print(f"❌ dataprep produced no audio for run {minus}/{arm}")
            sys.exit(1)

    # ---- 3. per-run sweeps -------------------------------------------------
    cfg_dir = out / "configs"
    cfg_dir.mkdir(exist_ok=True)
    from adx_tpu.io.config import resolve_default_checkpoint

    model_cfg = {
        "local": True, "local_model": cli.local_model,
        "max_batch": cli.max_batch, "device": "tpu",
    }
    ckpt_dir = resolve_default_checkpoint(cli.checkpoint_dir, cli.local_model)
    if ckpt_dir is not None:
        model_cfg["checkpoint_dir"] = ckpt_dir
        print(f"🏋️ sweeps use classifier weights: {ckpt_dir}")
    # FBP/occlusion analysis crop: the synthetic tracks are exactly
    # --track-seconds long, but a user --dataset must not inherit that 12 s
    # default — fall back to the reference's 120 s crop there
    analysis_s = cli.duration if cli.duration is not None else (
        float(cli.track_seconds) if not cli.dataset else 120.0)
    spectro = {
        "sr": cli.sr, "duration": analysis_s, "n_fft": 2048,
        "hop_length": 512, "win_length": 2048, "spec_type": "stft",
    }
    pred_jsons, fbp_roots, occ_roots, lime_jsons = [], [], [], []

    def stage(name, script, cfg, extra_args=()):
        cfg_path = cfg_dir / f"{name}.yaml"
        cfg_path.write_text(yaml.safe_dump(cfg))
        rc, secs = run_stage(script, ["--config", str(cfg_path), *extra_args])
        timings.append((name, rc, secs))
        if rc != 0:
            # print the timing ledger gathered so far — it's what the
            # operator needs to resume/diagnose a multi-hour chain
            if rc == 130:
                print(f"⚠️  Chain interrupted at stage {name}")
            else:
                print(f"❌ Stage {name} failed (rc={rc})")
            _print_summary(timings)
            sys.exit(rc if rc == 130 else 1)

    for minus, arm in runs:
        run_data = str(data_root / minus / arm)
        tag = f"{minus}_{arm}"

        pred_root = out / "results" / "Predictions" / minus / arm
        stage(f"pred_{tag}", "scripts/run_sonics_predictions.py", {
            "dataset": {"dataset_path": run_data, "sample_rate": cli.sr},
            "model": model_cfg,
            "output": {"result_path": str(pred_root),
                       "experiment_name": "Sonics_predictions"},
        })
        pred_jsons.append(str(pred_root / "Sonics_predictions" / "full_track"
                              / "predictions.json"))

        fbp_root = out / "results" / "FBP" / minus / arm / "FBP_chain"
        stage(f"fbp_{tag}", "scripts/experiments/run_FBP_experiment.py", {
            "dataset": {"base_path": run_data,
                        "models_to_process": cli.models,
                        "max_samples_per_model": cli.tracks_per_model},
            "model": model_cfg,
            "bands": {"preset": "default", "attenuation": 0.25,
                      "transition": {"mode": "rel", "rel": 0.2}},
            "spectrogram": spectro,
            "explainability": {"use_separation": False,
                               "normalize_loudness": False},
            "output": {"result_path": str(fbp_root.parent),
                       "experiment_name": fbp_root.name},
            "checkpoint": {"enabled": False},
        }, ["--no-checkpoint"])
        fbp_roots.append(str(fbp_root))

        occ_root = out / "results" / "Occlusion" / minus / arm / "Occ_chain"
        stage(f"occ_{tag}", "scripts/experiments/run_spectrogram_experiment.py", {
            "dataset": {"base_path": run_data,
                        "models_to_process": cli.models,
                        "max_samples_per_model": cli.tracks_per_model},
            "model": model_cfg,
            "spectrogram": spectro,
            "explainability": {
                "method": "occlusion", "baseline_threshold": 0.0,
                "occlusion": {"patch_time_frames": cli.patch_time_frames,
                              "stride_time_frames": cli.patch_time_frames,
                              "patch_freq_percent": 25.0,
                              "stride_freq_percent": 25.0,
                              "use_original_audio": False,
                              "top_n_windows": 2},
            },
            "output": {"result_path": str(occ_root.parent),
                       "experiment_name": occ_root.name},
            "checkpoint": {"enabled": False},
        }, ["--no-checkpoint"])
        occ_roots.append(str(occ_root))

        if not cli.skip_lime:
            lime_root = out / "results" / "AudioLIME" / minus / arm
            stage(f"lime_{tag}", "scripts/experiments/run_LIME_experiment.py", {
                "dataset": {"dataset_path": run_data},
                "model": model_cfg,
                "lime": {"explain": True,
                         "max_samples_explain": cli.tracks_per_model,
                         "num_samples_lime": cli.num_samples_lime,
                         "separation_model": "spleeter:4stems",
                         "models_to_explain": cli.models,
                         "ids_to_explain": list(range(cli.tracks_per_model))},
                "output": {"result_path": str(lime_root),
                           "experiment_name": "LIME_chain"},
                "visualization": {"overall": False, "per_model": False,
                                  "per_sample": False},
                "explanation_variants": {"full_track_explanations": True,
                                         "segmented_explanations": False},
            }, ["--no-checkpoint"])
            lime_jsons.append(str(lime_root / "LIME_chain" / "full_track"
                                  / "explanations.json"))

    # ---- 4. cross-run comparisons ------------------------------------------
    comparisons = [
        ("cmp_predictions",
         "scripts/runs_comparision/compare_predictions_across_runs.py",
         {"files": pred_jsons, "models": cli.models, "threshold": 0.5,
          "annotate": False,
          "output": {"result_path": str(out / "comparison" / "Predictions")}}),
        ("cmp_fbp",
         "scripts/runs_comparision/compare_fbp_results_across_runs.py",
         {"files": fbp_roots,
          "output": {"result_path": str(out / "comparison" / "FBP")}}),
        ("cmp_occlusion",
         "scripts/runs_comparision/compare_occlusion_results_across_runs.py",
         {"files": occ_roots, "max_rank": None,
          "output": {"result_path": str(out / "comparison" / "Occlusion")}}),
    ]
    if not cli.skip_lime:
        comparisons.append(
            ("cmp_audiolime",
             "scripts/runs_comparision/compare_audiolime_results_across_runs.py",
             {"files": lime_jsons,
              "output": {"result_path": str(out / "comparison" / "AudioLIME")}}))
    for name, script, cfg in comparisons:
        stage(name, script, cfg)

    # ---- 5. validate artifacts ---------------------------------------------
    missing = []
    for p in pred_jsons:
        if not Path(p).exists():
            missing.append(p)
    for r in fbp_roots:
        if not (Path(r) / "fbp_results.json").exists():
            missing.append(f"{r}/fbp_results.json")
    for r in occ_roots:
        if not list(Path(r).rglob("spectrogram_results*.json")):
            missing.append(f"{r}/spectrogram_results*.json")
    for p in lime_jsons:
        if not Path(p).exists():
            missing.append(p)
    for name, _script, cfg in comparisons:
        pngs = list(Path(cfg["output"]["result_path"]).rglob("*.png"))
        if not pngs:
            missing.append(f"{cfg['output']['result_path']} (no PNGs)")
        else:
            print(f"🖼️  {name}: {len(pngs)} plots")
    # run labels must round-trip through the path taxonomy (pre-validated at
    # chain start; re-checked here against the REAL result paths)
    labels = sorted({extract_run_label(p) for p in pred_jsons})
    # expected labels via the same canonical taxonomy (the mapping itself
    # carries reference quirks like m14_resample_22k, parity-tested in
    # tests/test_reference_parity.py) — here assert each run round-trips
    # to a DISTINCT label through the real result paths
    want = sorted({extract_run_label(f"/d/minus{l}/{arm}/x")
                   for l in cli.lufs for arm in ["base", *cli.arms]})
    if labels != want or len(labels) != len(runs):
        missing.append(f"run labels {labels} != {want} (n_runs={len(runs)})")

    _print_summary(timings)
    print(f"   {'WALL':30s}        {time.time() - t_start:8.1f} s")
    if missing:
        print("\n❌ Missing artifacts:")
        for m in missing:
            print(f"   - {m}")
        sys.exit(1)
    n_runs = len(runs)
    print(f"\n✅ Robustness chain complete: {n_runs} runs × "
          f"{'4' if not cli.skip_lime else '3'} sweeps + "
          f"{len(comparisons)} comparisons")


if __name__ == "__main__":
    main()
