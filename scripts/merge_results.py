#!/usr/bin/env python
"""Merge per-shard result JSONs from a multi-host sweep into one file.

Companion to the runners' ``--num-shards/--shard-index`` flags
(track-level DP across hosts, SURVEY.md §2.6(c)): every host writes its
own result JSON; this tool folds them into a single file using the SAME
merge policy the incremental writers use (adx_tpu/io/results.py), so the
merged output is indistinguishable from a single-host sweep:

* ``explanations.json`` family  → don't-overwrite-non-empty
  component_influences, segment-level grain (reference
  src/lime_explainer.py:27-94),
* ``features.json`` family      → same policy keyed on 'features'
  (reference src/feature_calculate.py:20-78),
* everything else ({model: {file_key: data}} shape: fbp_results,
  spectrogram_results, predictions) → blind per-file merge (reference
  src/dsp_band_ops.py:86-118).

Usage:
  python scripts/merge_results.py out.json shard0.json shard1.json ...
  python scripts/merge_results.py --policy explanations out.json in/*.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from adx_tpu.io.results import (
    append_update_explanations,
    append_update_features,
    append_update_results,
)

POLICIES = {
    "results": append_update_results,
    "explanations": append_update_explanations,
    "features": append_update_features,
}


def infer_policy(output_path: Path, inputs: list[Path]) -> str:
    """Pick the merge policy from the output/input filenames."""
    names = [output_path.name.lower()] + [p.name.lower() for p in inputs]
    if any("explanation" in n for n in names):
        return "explanations"
    if any("feature" in n for n in names):
        return "features"
    return "results"


def merge(output_path: Path, inputs: list[Path], policy: str) -> None:
    fn = POLICIES[policy]
    for src in inputs:
        with open(src, "r", encoding="utf-8") as f:
            data = json.load(f)
        if not isinstance(data, dict):
            raise SystemExit(f"❌ {src}: expected a JSON object, got {type(data).__name__}")
        fn(data, output_path)
        print(f"  merged {src} ({len(data)} model folder(s))")
    print(f"✅ {len(inputs)} shard file(s) merged into {output_path} "
          f"(policy: {policy})")


def main():
    ap = argparse.ArgumentParser(description="Merge sharded sweep result JSONs")
    ap.add_argument("output", type=Path, help="Merged output JSON (appended to if it exists)")
    ap.add_argument("inputs", type=Path, nargs="+", help="Per-shard result JSONs")
    ap.add_argument(
        "--policy", choices=sorted(POLICIES), default=None,
        help="Merge policy (default: inferred from filenames)",
    )
    args = ap.parse_args()

    missing = [p for p in args.inputs if not p.exists()]
    if missing:
        raise SystemExit(f"❌ Input file(s) not found: {', '.join(map(str, missing))}")
    policy = args.policy or infer_policy(args.output, args.inputs)
    merge(args.output, args.inputs, policy)


if __name__ == "__main__":
    main()
