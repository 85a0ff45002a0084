#!/usr/bin/env python
"""Predict on reversed-separated component WAVs and dump JSON
(capability-equivalent to the reference's scripts/run_sep_predictions.py,
which loops a raw Gradio client over every stem file; here the on-device
predictor batch-processes them)."""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from adx_tpu.io.config import build_predictor, load_yaml


def main():
    ap = argparse.ArgumentParser(description="Predict on separated-component WAVs")
    ap.add_argument(
        "--dataset-path",
        default="results/AudioLIME/FakeRealMusicOriginal/AudioLIME_500_samples_full_track/full_track/",
    )
    ap.add_argument(
        "--output-json",
        default="results/AudioLIME/FakeRealMusicOriginal/AudioLIME_500_samples_full_track/mix_without_components_predictions.json",
    )
    ap.add_argument("--components-dir", default="reversed_separated_components")
    ap.add_argument("--config", default=None, help="Optional model config YAML (model section)")
    args = ap.parse_args()

    model_cfg = {"local": True, "local_model": "awsaf49/sonics-spectttra-alpha-120s"}
    if args.config:
        model_cfg = load_yaml(Path(args.config)).get("model", model_cfg)
    predictor = build_predictor(model_cfg)

    dataset_path = Path(args.dataset_path)
    results = {}
    for model_dir in sorted(p for p in dataset_path.iterdir() if p.is_dir()):
        model = model_dir.name
        print(f"Processing model: {model}")
        audio_results = {}
        for track_dir in sorted(p for p in model_dir.iterdir() if p.is_dir()):
            comp_dir = track_dir / args.components_dir
            if not comp_dir.is_dir():
                continue
            file_results = {}
            for wav in sorted(comp_dir.glob("*.wav")):
                print(f"Processing file: {wav.name}")
                prob = predictor.predict_from_file(wav)
                file_results[wav.name] = {
                    "file_path": str(wav),
                    "model": model,
                    "prediction": prob,
                }
            audio_results[track_dir.name] = {
                "file_path": str(track_dir.name),
                "model": model,
                "results": file_results,
            }
        results[model] = audio_results

    out = Path(args.output_json)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=4)
    print(f"✅ Saved: {out}")


if __name__ == "__main__":
    main()
