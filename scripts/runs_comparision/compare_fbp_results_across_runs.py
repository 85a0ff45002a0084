#!/usr/bin/env python
"""Compare FBP band importances across degradation runs
(CLI/config-compatible with the reference script of the same name)."""
import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from adx_tpu.io.config import load_yaml
from adx_tpu.viz.runs_compare import load_fbp_bands_for_runs, plot_fbp_band_importances


def main():
    parser = argparse.ArgumentParser(description="FBP band importance – runs comparison")
    parser.add_argument("--config", type=str, required=True)
    args = parser.parse_args()
    config = load_yaml(Path(args.config))

    fbp_roots = config.get("files", [])
    if not fbp_roots:
        print("❌ No FBP roots specified in config['files']!")
        return
    df_common, runs_labels = load_fbp_bands_for_runs(fbp_roots)

    output_cfg = config.get("output", {})
    output_dir = Path(output_cfg.get("result_path", "results/FBP/Runs_comparison")) / runs_labels
    output_dir.mkdir(parents=True, exist_ok=True)
    plot_fbp_band_importances(df_common, output_dir=output_dir)
    print(f"\n✅ All plots saved to: {output_dir}")


if __name__ == "__main__":
    main()
