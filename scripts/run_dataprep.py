#!/usr/bin/env python
"""Data-prep CLI: audio inventory + LUFS normalization + degradation arms
(the reference ships this only as notebook cells — Notebooks/0. AnalyzeSongs/
analyzesongs.ipynb; here it is a proper command)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from adx_tpu.dataprep.pipeline import ARMS, audio_inventory, plot_inventory, run_pipeline


def main():
    ap = argparse.ArgumentParser(description="Normalize + degrade an audio dataset")
    ap.add_argument("inputs", nargs="+", help="Input files or directories")
    ap.add_argument("--out-root", required=True, help="Output root directory")
    ap.add_argument("--sr", type=int, default=44100)
    ap.add_argument(
        "--arms", nargs="*", default=None, choices=sorted(ARMS),
        help="Degradation arms to run (default: all)",
    )
    ap.add_argument("--inventory-only", action="store_true", help="Only write audio_inventory.csv")
    ap.add_argument(
        "--lufs", nargs="*", type=float, default=None,
        help="LUFS normalization bases as positive numbers (minusN trees; "
             "default: 14 23, the notebook's targets)",
    )
    args = ap.parse_args()

    df = audio_inventory(args.inputs, Path(args.out_root) / "audio_inventory.csv")
    plot_inventory(df, Path(args.out_root) / "inventory_plots")
    if args.inventory_only:
        return
    run_pipeline(args.inputs, args.out_root, sr=args.sr, arms=args.arms,
                 lufs_targets=args.lufs)


if __name__ == "__main__":
    main()
