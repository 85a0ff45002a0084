#!/usr/bin/env python
"""SONICS predictions visualization (CLI/config-compatible with the
reference's scripts/run_sonics_pred_vis.py)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from adx_tpu.io.config import load_yaml
from adx_tpu.viz.predictions_viz import (
    load_predictions,
    plot_confusion_matrices,
    plot_metrics_table,
    plot_model_predictions_lines,
    plot_threshold_curves,
)


def main():
    parser = argparse.ArgumentParser(description="Visualize SONICS predictions")
    parser.add_argument(
        "--config", type=str,
        default=str(ROOT / "configs/SONICS_predictions" / "sonics_pred_vis.yaml"),
        help="Path to config.yaml",
    )
    args = parser.parse_args()
    config = load_yaml(args.config)

    print("📊 Loading predictions...")
    data_cfg = config.get("data", {})
    predictions_path = data_cfg.get("predictions_path")
    df = load_predictions(predictions_path)
    print(f"   Loaded {len(df)} predictions for {len(df['model'].unique())} models")

    output_cfg = config.get("output", {})
    output_root = Path(output_cfg.get("result_path"))
    output_root.mkdir(parents=True, exist_ok=True)

    vis_cfg = config.get("visualizations", {})
    models = vis_cfg.get("models", [])
    colors = vis_cfg.get("colors", {})

    print("\nGenerating visualizations...")
    plot_model_predictions_lines(df, models, colors, output_root)
    plot_confusion_matrices(df, models, colors, output_root)
    plot_metrics_table(df, models, output_root)
    plot_threshold_curves(df, models, colors, output_root)
    print(f"\n✅ All visualizations saved to: {output_root}")


if __name__ == "__main__":
    main()
