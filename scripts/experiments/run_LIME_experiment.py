#!/usr/bin/env python
"""AudioLIME experiment runner.

CLI- and config-compatible with the reference runner
(reference: scripts/experiments/run_LIME_experiment.py): same YAML sections,
flags (--save-separated-audio / --save-visualizations-only), output tree
(full_track/explanations.json, segmented/segmented_explanations.json,
overall_visualizations/, visualizations_per_model/).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from adx_tpu.explainers.lime_explainer import run_lime_experiment_safe
from adx_tpu.io.config import build_predictor, load_yaml, save_experiment_config
from adx_tpu.parallel.host_shard import add_shard_args, shard_spec_from_args
from adx_tpu.io.results import load_existing_explanations
from adx_tpu.viz.lime_viz import (
    visualize_explanations,
    visualize_explanations_by_model,
    visualize_per_sample_explanations,
)


def main():
    ap = argparse.ArgumentParser(description="Run LIME experiment for fake song detection")
    ap.add_argument("--config", default=str(ROOT / "configs/AudioLIME_configs" / "lime_experiment.yaml"))
    ap.add_argument("--no-checkpoint", action="store_true", help="Disable checkpointing")
    ap.add_argument(
        "--resume", action="store_true",
        help="Accepted for reference CLI parity; checkpointed files auto-skip "
             "on any rerun (with or without this flag) — use --no-checkpoint "
             "for a fresh run",
    )
    ap.add_argument(
        "--save-separated-audio", choices=["none", "separated", "reversed"], default="none",
        help="'separated' saves stem WAVs, 'reversed' saves mixture-minus-stem WAVs.",
    )
    ap.add_argument(
        "--save-visualizations-only", action="store_true",
        help="Skip explanation generation; regenerate visualizations from existing explanations.",
    )
    ap.add_argument(
        "--track-batch", type=int, default=4,
        help="Tracks folded per batched stem-mix device program (1 = serial)",
    )
    add_shard_args(ap)
    args = ap.parse_args()
    if args.save_visualizations_only and args.save_separated_audio != "none":
        # viz-only builds no predictor, so no audio would be saved — yet the
        # audio-save early-return would print success and exit 0
        ap.error("--save-visualizations-only cannot be combined with "
                 "--save-separated-audio (viz-only mode saves no audio)")
    shard_index, num_shards = shard_spec_from_args(args)

    config = load_yaml(Path(args.config))
    dataset_cfg = config.get("dataset", {})
    model_cfg = config.get("model", {})
    lime_cfg = config.get("lime", {})
    output_cfg = config.get("output", {})
    viz_cfg = config.get("visualization", {})
    explanations_variants_cfg = config.get("explanation_variants", {})

    dataset_path = dataset_cfg.get("dataset_path")
    result_path = Path(output_cfg.get("result_path"))
    experiment_name = output_cfg.get("experiment_name", "lime_exp")
    num_samples_lime = lime_cfg.get("num_samples_lime", 50)
    full_track_explanations = explanations_variants_cfg.get("full_track_explanations", True)
    segmented_explanations = explanations_variants_cfg.get("segmented_explanations", False)
    segment_duration = explanations_variants_cfg.get("segment_duration", 10)
    explanations_path = result_path / experiment_name / "full_track" / "explanations.json"
    segmented_explanations_path = (
        result_path / experiment_name / "segmented" / "segmented_explanations.json"
    )
    full_track_output_dir = result_path / experiment_name / "full_track"
    segmented_output_dir = result_path / experiment_name / "segmented"

    config_path = save_experiment_config(config, result_path / experiment_name, experiment_name)

    checkpoint_dir = None
    if not args.no_checkpoint:
        checkpoint_dir = result_path / experiment_name / "checkpoints"
        checkpoint_dir.mkdir(parents=True, exist_ok=True)

    print("\n" + "=" * 70)
    print("🔍 LIME Explainability Experiment")
    print("=" * 70)
    print(f"📁 Dataset: {dataset_path}")
    print(f"📊 Output: {result_path / experiment_name}")
    print(f"⚙️  Config: {config_path}")
    print(f"🎯 Models to explain: {', '.join(lime_cfg.get('models_to_explain', []))}")
    print(f"📏 Samples per model: {lime_cfg.get('max_samples_explain')}")
    print(f"🔬 LIME samples: {num_samples_lime}")
    print(f"💾 Checkpoint: {'Enabled' if checkpoint_dir else 'Disabled'}")
    print("=" * 70 + "\n")

    if not args.save_visualizations_only:
        # built only when explanations actually run: viz-only mode is pure
        # host-side matplotlib and must not pay (or fail on) the TPU boot
        predictor = build_predictor(model_cfg)
        try:
            run_lime_experiment_safe(
                predictor=predictor,
                model_time=model_cfg.get("model_time", 120),
                explain=lime_cfg.get("explain", True),
                max_samples_explain=lime_cfg.get("max_samples_explain", 5),
                dataset_path=dataset_path,
                num_samples_lime=num_samples_lime,
                models_to_explain=lime_cfg.get("models_to_explain", []),
                ids_to_explain=lime_cfg.get("ids_to_explain", list(range(10))),
                checkpoint_dir=checkpoint_dir,
                explanations_path=str(explanations_path),
                features_output_dir_full=str(full_track_output_dir),
                features_output_dir_segmented=str(segmented_output_dir),
                full_track_explanations=full_track_explanations,
                segmented_explanations=segmented_explanations,
                segment_duration=segment_duration,
                segmented_explanations_path=str(segmented_explanations_path),
                save_separated_audio_only=args.save_separated_audio == "separated",
                save_reversed_separated_audio_only=args.save_separated_audio == "reversed",
                separation_model=lime_cfg.get("separation_model", "spleeter:4stems"),
                shard_index=shard_index,
                num_shards=num_shards,
                track_batch=args.track_batch,
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

    if args.save_separated_audio in ("separated", "reversed"):
        # reference parity: the audio-save arms end here — they must not
        # regenerate visualizations from a previous full run's explanations
        print("\n✅ Experiment completed with separated audio saved. No explanations generated.")
        return

    print("🔍 Loading existing explanations...")
    explanations = load_existing_explanations(explanations_path)
    if explanations:
        print(f"✅ Loaded explanations from {explanations_path}")
    else:
        print(f"⚠️  No explanations found at {explanations_path}. Cannot generate visualizations.")
        if args.save_visualizations_only:
            # reference parity: viz-only with nothing to render is a failure
            sys.exit(1)
        return

    print("\n📊 Generating visualizations...")
    # each family degrades independently (reference parity): a plotting
    # error must not turn an already-written explanations.json into rc!=0
    if viz_cfg.get("overall", True):
        viz_path_overall = result_path / experiment_name / "overall_visualizations"
        try:
            visualize_explanations(explanations, output_dir=str(viz_path_overall))
            print(f"✅ Overall visualizations: {viz_path_overall}")
        except Exception as e:
            print(f"⚠️  Error in overall visualizations: {e}")
    if viz_cfg.get("per_model", True):
        viz_path_per_model = result_path / experiment_name / "visualizations_per_model"
        try:
            visualize_explanations_by_model(explanations, output_dir=str(viz_path_per_model))
            print(f"✅ Per-model visualizations: {viz_path_per_model}")
        except Exception as e:
            print(f"⚠️  Error in per-model visualizations: {e}")
    if viz_cfg.get("per_sample", False):
        try:
            visualize_per_sample_explanations(
                explanations,
                features_outputdir_full=result_path / experiment_name / "full_track",
            )
        except Exception as e:
            print(f"⚠️  Error in per-sample visualizations: {e}")

    print("\n" + "=" * 70)
    print("✅ Experiment completed successfully!")
    print("=" * 70)
    print(f"⚙️  Configuration: {config_path}")
    print(f"📄 Explanations: {str(explanations_path)}")
    print("=" * 70 + "\n")


if __name__ == "__main__":
    main()
