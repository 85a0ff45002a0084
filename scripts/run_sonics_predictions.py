#!/usr/bin/env python
"""SONICS batch prediction runner (CLI/config-compatible with the
reference's scripts/run_sonics_predictions.py)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from adx_tpu.io.config import build_predictor, load_yaml, save_experiment_config
from adx_tpu.parallel.host_shard import add_shard_args, shard_spec_from_args
from adx_tpu.predictions import run_sonics_predictions


def main():
    ap = argparse.ArgumentParser(description="Run SONICS predictions for fake song detection")
    ap.add_argument("--config", default=str(ROOT / "configs/SONICS_predictions" / "sonics_config.yaml"))
    add_shard_args(ap)
    args = ap.parse_args()
    shard_index, num_shards = shard_spec_from_args(args)

    config = load_yaml(Path(args.config))
    dataset_cfg = config.get("dataset", {})
    model_cfg = config.get("model", {})
    output_cfg = config.get("output", {})

    dataset_path = dataset_cfg.get("dataset_path")
    result_path = Path(output_cfg.get("result_path"))
    experiment_name = output_cfg.get("experiment_name", "sonics_predictions")
    explanations_path = result_path / experiment_name / "full_track" / "predictions.json"

    config_path = save_experiment_config(config, result_path / experiment_name, experiment_name)

    print("\n" + "=" * 70)
    print("🔮 SONICS Predictions")
    print("=" * 70)
    print(f"📁 Dataset: {dataset_path}")
    print(f"📊 Output: {result_path / experiment_name}")
    print(f"⚙️  Config: {config_path}")
    print("=" * 70 + "\n")

    predictor = build_predictor(model_cfg)

    try:
        run_sonics_predictions(
            predictor=predictor,
            dataset_path=dataset_path,
            explanations_path=str(explanations_path),
            sample_rate=dataset_cfg.get("sample_rate", 44100),
            threshold=0.5,
            shard_index=shard_index,
            num_shards=num_shards,
        )
    except KeyboardInterrupt:
        print("\n\n⚠️  Experiment interrupted (Ctrl+C)")
        sys.exit(130)  # SIGINT convention; 0 hid interrupts from the orchestrators
    except Exception as e:
        print(f"\n\n❌ Critical error: {type(e).__name__}: {e}")
        import traceback

        traceback.print_exc()
        sys.exit(1)

    print("\n" + "=" * 70)
    print("✅ Experiment completed successfully!")
    print("=" * 70)
    print(f"⚙️  Configuration: {config_path}")
    print(f"📄 Predictions: {str(explanations_path)}")
    print("=" * 70 + "\n")


if __name__ == "__main__":
    main()
