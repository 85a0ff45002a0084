#!/usr/bin/env python
"""Spectrogram occlusion / RISE explainability experiment runner.

CLI- and config-compatible with the reference runner
(reference: scripts/experiments/run_spectrogram_experiment.py): same YAML
sections and flags, backed by the batched TPU engine.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from adx_tpu.explainers.occlusion import SpectrogramExplainability
from adx_tpu.io.config import build_predictor, load_yaml, save_experiment_config
from adx_tpu.parallel.host_shard import add_shard_args, shard_spec_from_args
from adx_tpu.viz.saliency import visualize_aggregate_results


def main():
    ap = argparse.ArgumentParser(description="Run Spectrogram Occlusion Explainability experiment")
    ap.add_argument(
        "--config",
        default=str(ROOT / "configs" / "Spec_occlusion_configs" / "spectrogram_explainability.yaml"),
    )
    ap.add_argument("--no-checkpoint", action="store_true", help="Disable checkpointing")
    ap.add_argument("--resume", action="store_true", help="Resume from checkpoint")
    ap.add_argument("--visualize-only", action="store_true", help="Only generate aggregate visualizations")
    add_shard_args(ap)
    args = ap.parse_args()
    shard_index, num_shards = shard_spec_from_args(args)

    config = load_yaml(Path(args.config))
    dataset_cfg = config.get("dataset", {})
    model_cfg = config.get("model", {})
    spectrogram_cfg = config.get("spectrogram", {})
    output_cfg = config.get("output", {})
    checkpoint_cfg = config.get("checkpoint", {})

    base_path = Path(dataset_cfg.get("base_path"))
    output_root = Path(output_cfg.get("result_path"))
    experiment_name = output_cfg.get("experiment_name", "spectrogram_exp")
    output_dir = output_root / experiment_name
    output_dir.mkdir(parents=True, exist_ok=True)

    config_path = save_experiment_config(config, output_dir, experiment_name)

    checkpoint_dir = None
    if checkpoint_cfg.get("enabled", True) and not args.no_checkpoint:
        checkpoint_dir = output_dir / "checkpoints"
        checkpoint_dir.mkdir(parents=True, exist_ok=True)

    def _results_csvs():
        # exclude the ever-growing progress CSV: it sorts after every
        # timestamped final CSV ('p' > digits) and accumulates rows across
        # runs, so "latest" would render stale, mixed-run aggregates (the
        # reference has the same defect — deviate where it is broken,
        # like the LIME features path fix); fall back to it only when no
        # timestamped CSV exists (an interrupted first run)
        final = sorted(p for p in output_dir.glob("spectrogram_results_*.csv")
                       if not p.name.endswith("_progress.csv"))
        return final or sorted(output_dir.glob("spectrogram_results_progress.csv"))

    if args.visualize_only:
        print("\n📊 Generating aggregate visualizations only...")
        csv_files = _results_csvs()
        if not csv_files:
            print("❌ No results CSV found!")
            sys.exit(1)
        import pandas as pd

        latest_csv = csv_files[-1]
        print(f"📥 Loading: {latest_csv}")
        df = pd.read_csv(latest_csv)
        viz_dir = output_dir / "aggregate_visualizations"
        visualize_aggregate_results(df, viz_dir)
        print(f"✅ Visualizations saved to: {viz_dir}")
        sys.exit(0)

    predictor = build_predictor(model_cfg)

    explainability_cfg = config.get("explainability", {})
    method = explainability_cfg.get("method", "rise")
    visualization_cfg = explainability_cfg.get("visualization", {})

    common = dict(
        predictor=predictor,
        sr=spectrogram_cfg.get("sr", 44100),
        duration=float(spectrogram_cfg.get("duration", 120)),
        n_fft=spectrogram_cfg.get("n_fft", 2048),
        hop_length=spectrogram_cfg.get("hop_length", 512),
        win_length=spectrogram_cfg.get("win_length", 2048),
        n_iter=spectrogram_cfg.get("n_iter", 256),
        spec_type=spectrogram_cfg.get("spec_type", "mel"),
        fmax=spectrogram_cfg.get("fmax", None),
        # Griffin-Lim compute dtype for mel inversion sweeps: bfloat16
        # (MXU matmul loop), float32 (exact-dtype matmul), or fft (the
        # FFT-pair loop) — see ops/stft.py::griffin_lim_matmul
        gl_synth_dtype=spectrogram_cfg.get("gl_synth_dtype", "bfloat16"),
        checkpoint_dir=checkpoint_dir,
        highlight_percent=visualization_cfg.get("highlight_percent", 20.0),
        abs_threshold=visualization_cfg.get("abs_threshold", None),
        # files folded per batched analyze+baseline program (1 = serial)
        track_batch=explainability_cfg.get("track_batch", 4),
    )
    if method == "rise":
        rise_cfg = explainability_cfg.get("rise", {})
        explainer = SpectrogramExplainability(
            n_mels=spectrogram_cfg.get("n_mels", 256),
            method="rise",
            use_original_audio=False,
            n_masks=rise_cfg.get("n_masks", 500),
            mask_probability=rise_cfg.get("mask_probability", 0.5),
            **common,
        )
    else:
        occlusion_cfg = explainability_cfg.get("occlusion", {})
        explainer = SpectrogramExplainability(
            n_mels=spectrogram_cfg.get("n_mels", 128),
            top_n_windows=occlusion_cfg.get("top_n_windows", 5),
            method="occlusion",
            use_original_audio=occlusion_cfg.get("use_original_audio", True),
            patch_time_frames=occlusion_cfg.get("patch_time_frames", 2048),
            stride_time_frames=occlusion_cfg.get("stride_time_frames", 2048),
            patch_freq_percent=occlusion_cfg.get("patch_freq_percent", 25.0),
            stride_freq_percent=occlusion_cfg.get("stride_freq_percent", 25.0),
            **common,
        )

    try:
        baseline_threshold = explainability_cfg.get("baseline_threshold", 0.3)
        df = explainer.run_experiment(
            base_path=base_path,
            output_dir=output_dir,
            models_to_process=dataset_cfg.get("models_to_process"),
            max_samples_per_model=dataset_cfg.get("max_samples_per_model"),
            baseline_threshold=baseline_threshold,
            resume=args.resume or (not args.no_checkpoint),
            results_path=output_dir / f"spectrogram_results_{method}.json",
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

    print("\n📊 Generating aggregate visualizations...")
    viz_dir = output_dir / "aggregate_visualizations"
    visualize_aggregate_results(df, viz_dir)

    print("\n" + "=" * 70)
    print("🎉 All done!")
    print("=" * 70)
    print(f"💾 Configuration: {config_path}")
    print(f"🗺️  Saliency maps: {output_dir / 'saliency_maps'}")
    print(f"📈 Aggregate visualizations: {viz_dir}")
    print(f"📄 Results CSV: {_results_csvs()[-1]}")
    print("=" * 70 + "\n")


if __name__ == "__main__":
    main()
