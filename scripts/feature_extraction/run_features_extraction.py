#!/usr/bin/env python
"""Overall feature extraction runner (CLI/config-compatible with the
reference's scripts/feature_extraction/run_features_extraction.py)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from adx_tpu.features.calculate import run_features_extraction
from adx_tpu.io.config import load_yaml, save_experiment_config
from adx_tpu.parallel.host_shard import add_shard_args, shard_spec_from_args


def main():
    ap = argparse.ArgumentParser(description="Extract features for audio dataset")
    ap.add_argument("--config", default=str(ROOT / "configs/Features_extraction" / "features_configs.yaml"))
    ap.add_argument("--batch-size", type=int, default=16,
                    help="Equal-length tracks folded per device batch")
    ap.add_argument("--serial-features", action="store_true",
                    help="Per-file host-exact extraction (no device batching/pyin)")
    add_shard_args(ap)
    args = ap.parse_args()
    shard_index, num_shards = shard_spec_from_args(args)

    config = load_yaml(Path(args.config))
    dataset_cfg = config.get("dataset", {})
    output_cfg = config.get("output", {})
    feat_cfg = config.get("features", {})
    audio_cfg = config.get("audio", {})

    dataset_path = dataset_cfg.get("dataset_path")
    result_path = Path(output_cfg.get("result_path"))
    experiment_name = output_cfg.get("experiment_name", "features_exp")
    sample_rate = audio_cfg.get("sample_rate", 44100)

    full_track_output_dir = result_path / experiment_name / "full_track"
    segmented_output_dir = result_path / experiment_name / "segmented"

    config_path = save_experiment_config(config, result_path / experiment_name, experiment_name)

    print("\n" + "=" * 70)
    print("🚀 Starting feature extraction")
    print("=" * 70 + "\n")
    print(f"📁 Dataset: {dataset_path}")
    print(f"📊 Output: {result_path / experiment_name}")
    print(f"⚙️  Config: {config_path}")
    print(f"🎯 Models to get features: {', '.join(feat_cfg.get('models_to_get_features', []))}")
    print(f"📏 Samples per model: {feat_cfg.get('max_samples', None)}")
    print("=" * 70 + "\n")

    try:
        run_features_extraction(
            dataset_path=dataset_path,
            model_time=120.0,
            max_samples=feat_cfg.get("max_samples", None),
            models_to_get_features=feat_cfg.get("models_to_get_features", ["dummy_model"]),
            ids_to_get_features=feat_cfg.get("ids_to_get_features", []),
            features_output_dir_full=full_track_output_dir,
            features_output_dir_segmented=segmented_output_dir,
            full_track_features=feat_cfg.get("extract_full_track_features", True),
            segmented_features=feat_cfg.get("extract_segmented_features", False),
            segment_duration=feat_cfg.get("segment_duration", 10.0),
            sample_rate=sample_rate,
            shard_index=shard_index,
            num_shards=num_shards,
            device_batch=not args.serial_features,
            batch_size=args.batch_size,
        )
    except KeyboardInterrupt:
        print("\n\n⚠️  Experiment interrupted (Ctrl+C)")
        sys.exit(130)  # SIGINT convention; 0 hid interrupts from the orchestrators
    except Exception as e:
        print(f"\n\n❌ Critical error: {type(e).__name__}: {e}")
        import traceback

        traceback.print_exc()
        sys.exit(1)


if __name__ == "__main__":
    main()
