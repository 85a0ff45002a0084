#!/usr/bin/env python
"""Compare SONICS predictions across degradation runs
(CLI/config-compatible with the reference script of the same name)."""
import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from adx_tpu.io.config import load_yaml
from adx_tpu.viz.runs_compare import load_predictions_runs, plot_predictions_comparison, try_num


def main():
    parser = argparse.ArgumentParser(description="Compare predictions from config.yaml")
    parser.add_argument("--config", type=str, required=True, help="Path to config.yaml")
    args = parser.parse_args()
    config = load_yaml(Path(args.config))

    files_cfg = config.get("files", [])
    if not files_cfg:
        print("❌ No files specified in config!")
        return
    df_all, runs_labels = load_predictions_runs(files_cfg, threshold=config.get("threshold", 0.5))

    output_cfg = config.get("output", {})
    output_dir = Path(output_cfg.get("result_path", "results/Predictions/Runs_comparison")) / runs_labels
    output_dir.mkdir(parents=True, exist_ok=True)
    models_to_plot = config.get("models", sorted(df_all["source"].unique()))
    runs = sorted(df_all["run"].unique(), key=lambda s: s.lower())
    print(f" Runs: {runs}")

    for source in models_to_plot:
        if source not in df_all["source"].values:
            print(f"⚠️ Skipping {source} (no data)")
            continue
        df_sub = df_all[df_all["source"] == source]
        idxs = sorted(df_sub["idx"].unique(), key=try_num)
        idx_pos = {idx: i for i, idx in enumerate(idxs)}
        short_labels = [str(i)[:25] + "..." if len(str(i)) > 25 else str(i) for i in idxs]
        print(f"\n📊 Plotting {source}...")
        plot_predictions_comparison(
            df_all, source, idxs, idx_pos, runs, short_labels,
            annotate_decision=config.get("annotate", False), output_dir=output_dir,
        )
    print(f"\n✅ All plots saved to: {output_dir}")


if __name__ == "__main__":
    main()
