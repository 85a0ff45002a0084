#!/usr/bin/env python
"""Compare AudioLIME stem influences across degradation runs
(CLI/config-compatible with the reference script of the same name)."""
import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from adx_tpu.io.config import load_yaml
from adx_tpu.viz.runs_compare import load_audio_lime_explanations, plot_audio_lime_influences


def main():
    parser = argparse.ArgumentParser(description="AudioLIME influences – runs comparison")
    parser.add_argument("--config", type=str, required=True)
    args = parser.parse_args()
    config = load_yaml(Path(args.config))

    files_cfg = config.get("files", [])
    if not files_cfg:
        print("❌ No explanation files specified in config['files']!")
        return
    df_common, runs_labels = load_audio_lime_explanations(files_cfg)

    output_cfg = config.get("output", {})
    output_dir = Path(output_cfg.get("result_path", "results/AudioLIME/Runs_comparison")) / runs_labels
    output_dir.mkdir(parents=True, exist_ok=True)
    plot_audio_lime_influences(df_common, output_dir=output_dir)
    print(f"\n✅ All plots saved to: {output_dir}")


if __name__ == "__main__":
    main()
