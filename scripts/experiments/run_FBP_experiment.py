#!/usr/bin/env python
"""Frequency Band Perturbation experiment runner.

CLI- and config-compatible with the reference runner
(reference: scripts/experiments/run_FBP_experiment.py): same YAML sections,
flags (--config / --no-checkpoint / --resume / --visualize-only /
--bands-root / --save-fbp-audio), output tree and result files — backed by
the batched TPU engine instead of serial per-band loops.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import pandas as pd

ROOT = Path(__file__).resolve().parents[2]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from adx_tpu.explainers.fbp import FrequencyBandPerturbation
from adx_tpu.io.config import build_predictor, load_yaml, save_experiment_config
from adx_tpu.parallel.host_shard import add_shard_args, shard_spec_from_args


def load_results_from_json(json_path: Path) -> pd.DataFrame:
    """FBP_results.json → DataFrame (columns used by visualize_results)."""
    with open(json_path, "r", encoding="utf-8") as f:
        results = json.load(f)
    rows = []
    for folder, files in results.items():
        for filename, data in files.items():
            rows.append(
                {
                    "file_path": data.get("file_path", ""),
                    "file_name": filename,
                    "folder": folder,
                    "global_mean_importance": data.get("global_mean_importance", 0.0),
                    "global_max_importance": data.get("global_max_importance", 0.0),
                    "global_min_importance": data.get("global_min_importance", 0.0),
                    "global_std_importance": data.get("global_std_importance", 0.0),
                }
            )
    return pd.DataFrame(rows)


def load_all_bands(folder: str, filename: str, bands_root: Path) -> list:
    """Collect per-component *_bands_metadata.json under bands_root."""
    all_bands = []
    track_dir = bands_root / folder / filename
    if not track_dir.exists():
        return []
    for comp_dir in track_dir.iterdir():
        if comp_dir.is_dir():
            meta_path = comp_dir / f"{filename}_bands_metadata.json"
            if meta_path.exists():
                try:
                    with open(meta_path, "r", encoding="utf-8") as f:
                        meta = json.load(f)
                    bands = meta.get("bands", [])
                    for band in bands:
                        band["component"] = comp_dir.name
                    all_bands.extend(bands)
                except Exception:
                    pass
    return all_bands


def enrich_bands(df: pd.DataFrame, output_dir: Path, args) -> pd.DataFrame:
    """Attach the per-file band metadata saved during the run as a ``bands``
    column (in-memory only — the JSON/CSV outputs are untouched). Shared by
    the end-of-run and ``--visualize-only`` paths. The reference ships its
    per-row "bands" key commented out (src/dsp_band_ops.py:852), so ITS
    end-of-run aggregate viz always prints "No bands data" and writes
    nothing; deviate where broken."""
    bands_root = Path(args.bands_root) if args.bands_root else output_dir / "bands"
    if df.empty or not bands_root.exists():
        return df
    print(f"Loading bands from {bands_root}")
    df = df.copy()
    df["bands"] = df.apply(
        lambda row: load_all_bands(row["folder"], row["file_name"], bands_root), axis=1
    )
    return df


def main():
    ap = argparse.ArgumentParser(description="Run Frequency Band Perturbation experiment")
    ap.add_argument("--config", default=str(ROOT / "configs" / "FBP_configs" / "fbp_experiment.yaml"))
    ap.add_argument("--no-checkpoint", action="store_true", help="Disable checkpointing")
    ap.add_argument(
        "--resume", action="store_true",
        help="Accepted for reference CLI parity; checkpointed files auto-skip "
             "on any rerun (with or without this flag) — use --no-checkpoint "
             "for a fresh run",
    )
    ap.add_argument(
        "--visualize-only", nargs="?", const=True, default=None,
        help="Run ONLY visualization. Optional path (default: output_dir/fbp_results.json)",
    )
    ap.add_argument(
        "--bands-root", type=str, default=None,
        help="Directory with *_bands_metadata.json (default output_dir/bands)",
    )
    ap.add_argument(
        "--save-fbp-audio", choices=["none", "separated", "reversed"], default="none",
        help="Save WAV with frequency band perturbations.",
    )
    add_shard_args(ap)
    args = ap.parse_args()
    shard_index, num_shards = shard_spec_from_args(args)

    config = load_yaml(Path(args.config))
    dataset_cfg = config.get("dataset", {})
    model_cfg = config.get("model", {})
    bands_cfg = config.get("bands", {})
    spectrogram_cfg = config.get("spectrogram", {})
    explain_cfg = config.get("explainability", {})
    output_cfg = config.get("output", {})
    checkpoint_cfg = config.get("checkpoint", {})

    base_path = Path(dataset_cfg.get("base_path"))
    output_root = Path(output_cfg.get("result_path"))
    experiment_name = str(output_cfg.get("experiment_name", "exp"))
    output_dir = output_root / experiment_name
    output_dir.mkdir(parents=True, exist_ok=True)

    config_path = save_experiment_config(config, output_dir, experiment_name)

    if args.visualize_only:
        path = (
            output_dir / "fbp_results.json"
            if args.visualize_only is True
            else Path(args.visualize_only)
        )
        if not path.exists():
            print(f"❌ {path} does not exist!")
            sys.exit(1)
        print(f"📊 Loading results: {path}")
        df = load_results_from_json(path) if path.suffix == ".json" else pd.read_csv(path)
        df = enrich_bands(df, output_dir, args)
        # predictor=None: visualization is pure host-side matplotlib — do
        # not pay (or fail on) the TPU boot for it (the occlusion runner's
        # --visualize-only made the same chip-free choice)
        fbp = FrequencyBandPerturbation(predictor=None)
        viz_dir = output_dir / "aggregate_visualizations"
        viz_dir.mkdir(exist_ok=True)
        fbp.visualize_results(df, output_dir=viz_dir)
        print("✅ Visualizations in:", viz_dir)
        return

    checkpoint_dir = None
    if checkpoint_cfg.get("enabled", True) and not args.no_checkpoint:
        checkpoint_dir = output_dir / "checkpoints"
        checkpoint_dir.mkdir(parents=True, exist_ok=True)

    predictor = build_predictor(model_cfg)
    transition_cfg = bands_cfg.get("transition", {})
    fbp = FrequencyBandPerturbation(
        predictor=predictor,
        preset=bands_cfg.get("preset", "default"),
        presets=bands_cfg.get("presets", {}) or None,
        attenuation=float(bands_cfg.get("attenuation", 0.0)),
        transition_mode=str(transition_cfg.get("mode", "rel")),
        transition_hz=float(transition_cfg.get("hz", 200.0)),
        transition_rel=float(transition_cfg.get("rel", 0.2)),
        transition_min_hz=float(transition_cfg.get("min_hz", 20.0)),
        transition_max_hz=float(transition_cfg.get("max_hz", 2000.0)),
        sr=int(spectrogram_cfg.get("sr", 44100)),
        # float, not int: the reference coerces to int (scripts/experiments/
        # run_FBP_experiment.py:242) which silently truncates sub-second
        # durations to 0 and produces all-silence analysis
        duration=float(spectrogram_cfg.get("duration", 120)),
        n_mels=int(spectrogram_cfg.get("n_mels", 128)),
        n_fft=int(spectrogram_cfg.get("n_fft", 2048)),
        hop_length=int(spectrogram_cfg.get("hop_length", 512)),
        win_length=int(spectrogram_cfg.get("win_length", 2048)),
        n_iter=int(spectrogram_cfg.get("n_iter", 32)),
        spec_type=str(spectrogram_cfg.get("spec_type", "stft")),
        fmax=spectrogram_cfg.get("fmax", None),
        use_original_audio=bool(explain_cfg.get("use_original_audio", False)),
        use_separation=bool(explain_cfg.get("use_separation", False)),
        separation_model=str(explain_cfg.get("separation_model", "spleeter:2stems")),
        separation_targets=tuple(
            explain_cfg.get("separation_targets", ("vocals0", "accompaniment0"))
        ),
        normalize_loudness=bool(explain_cfg.get("normalize_loudness", True)),
        lufs=float(explain_cfg.get("lufs", -14.0)),
        checkpoint_dir=checkpoint_dir,
        save_perturbed_audio_only=args.save_fbp_audio == "separated",
        save_reversed_perturbed_audio_only=args.save_fbp_audio == "reversed",
        # adx_tpu extension (absent from the reference schema): fold this
        # many files' components into each batched device program
        track_batch=explain_cfg.get("track_batch"),
    )

    try:
        df = fbp.run_experiment(
            base_path=base_path,
            output_dir=output_dir,
            models_to_process=dataset_cfg.get("models_to_process"),
            max_samples_per_model=dataset_cfg.get("max_samples_per_model"),
            results_path=output_dir / "fbp_results.json",
            shard_index=shard_index,
            num_shards=num_shards,
        )
    except KeyboardInterrupt:
        print("\n\n⚠️  Experiment interrupted (Ctrl+C)")
        if checkpoint_dir:
            print(f"💾 Progress saved in: {checkpoint_dir}")
            print("💡 Resume with --resume flag")
        sys.exit(130)  # SIGINT convention; 0 hid interrupts from the orchestrators
    except Exception as e:
        print(f"\n\n❌ Critical error: {type(e).__name__}: {e}")
        import traceback

        traceback.print_exc()
        sys.exit(1)

    if df.empty:
        print("\n⚠️  No results generated!")
        sys.exit(1)

    print("\n📊 Generating visualizations...")
    viz_dir = output_dir / "aggregate_visualizations"
    try:
        df = enrich_bands(df, output_dir, args)
        fbp.visualize_results(df, output_dir=viz_dir)
        print("   ✅ Result visualizations")
    except Exception as e:
        print(f"   ⚠️  Error visualizing results: {e}")

    print("\n" + "=" * 70)
    print("🎉 All done!")
    print("=" * 70)
    print(f"💾 Configuration: {config_path}")
    print(f"📈 Aggregate visualizations: {viz_dir}")
    # sorted: glob order is filesystem order, and the summary must name the
    # NEWEST autosave (timestamps in the name sort lexically)
    csvs = sorted(output_dir.glob("fbp_results_*.csv"))
    if csvs:
        print(f"📄 Results CSV: {csvs[-1]}")
    print("=" * 70 + "\n")


if __name__ == "__main__":
    main()
