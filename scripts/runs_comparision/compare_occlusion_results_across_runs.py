#!/usr/bin/env python
"""Compare occlusion window importances across degradation runs
(CLI/config-compatible with the reference script of the same name;
supports the max_rank filter)."""
import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from adx_tpu.io.config import load_yaml
from adx_tpu.viz.runs_compare import (
    load_occlusion_windows_for_runs,
    plot_occlusion_windows_importances,
)


def main():
    parser = argparse.ArgumentParser(description="Occlusion window importance – runs comparison")
    parser.add_argument("--config", type=str, required=True)
    args = parser.parse_args()
    config = load_yaml(Path(args.config))

    occ_roots = config.get("files", [])
    if not occ_roots:
        print("❌ No occlusion roots specified in config['files']!")
        return
    max_rank = config.get("max_rank", None)
    if max_rank is not None:
        print(f"Limiting windows to rank <= {max_rank}")
    df_common, runs_labels = load_occlusion_windows_for_runs(occ_roots, max_rank)

    output_cfg = config.get("output", {})
    output_dir = Path(output_cfg.get("result_path", "results/Occlusion/Runs_comparison")) / runs_labels
    output_dir.mkdir(parents=True, exist_ok=True)
    plot_occlusion_windows_importances(df_common, output_dir=output_dir)
    print(f"\n✅ All plots saved to: {output_dir}")


if __name__ == "__main__":
    main()
