#!/usr/bin/env python
"""Extract features for AudioLIME separated/reversed stem WAVs and join them
with LIME influences (output-schema-compatible with the reference's
scripts/feature_extraction/run_lime_features.py →
audiolime_component_features.json)."""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

from tqdm import tqdm

ROOT = Path(__file__).resolve().parents[2]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from adx_tpu.features.extraction import extract_features_for_paths
from adx_tpu.io.results import append_update_features, safe_stem


def main():
    ap = argparse.ArgumentParser(description="Extract AudioLIME component features")
    ap.add_argument("--config", default=str(ROOT / "configs/AudioLIME_configs" / "lime_comp_features.yaml"))
    ap.add_argument("--batch-size", type=int, default=16,
                    help="Equal-length WAVs folded per device batch")
    ap.add_argument("--serial-features", action="store_true",
                    help="Per-file host-exact extraction (no device batching/pyin)")
    args = ap.parse_args()

    from adx_tpu.io.config import load_yaml

    config = load_yaml(Path(args.config))
    dataset_cfg = config.get("dataset", {})
    output_cfg = config.get("output", {})
    audio_cfg = config.get("audio", {})
    components_cfg = config.get("lime_comp_features", {})

    lime_root = Path(dataset_cfg.get("lime_result_path"))
    result_root = Path(output_cfg.get("result_path"))
    sr = int(audio_cfg.get("samplerate", 44100))
    components = sorted(set(components_cfg.get("components", ["mixture"])))
    version = components_cfg.get("version", "separated")

    output_root = (
        result_root / "separated_components"
        if version == "separated"
        else result_root / "reversed_separated_components"
    )
    output_root.mkdir(parents=True, exist_ok=True)
    print("=" * 70)
    print("AudioLIME Component Features Extraction")
    print("=" * 70)
    print(f"AudioLIME results: {lime_root}")
    print(f"Output:            {output_root}")
    print(f"Sample rate:       {sr}")
    print(f"Components:        {', '.join(components)}")
    print("=" * 70)

    all_features = {}
    full_root = lime_root / "full_track"
    if not full_root.exists():
        print(f"[ERROR]: Full track directory not found: {full_root}")
        return

    expl_path = full_root / "explanations.json"
    if expl_path.exists():
        with open(expl_path, "r", encoding="utf-8") as f:
            expl_df = json.load(f)
    else:
        # the audio-save arm writes stem WAVs without explanations — feature
        # extraction still works, with importances defaulting to 0.0
        print(f"[WARN]: {expl_path} not found; component importances written "
              f"as null (component_type UNKNOWN)")
        expl_df = {}

    for model_dir in sorted(full_root.iterdir()):
        if not model_dir.is_dir():
            continue
        model_name = model_dir.name
        print(f"Processing model: {model_name}")
        track_dirs = [d for d in model_dir.iterdir() if d.is_dir()]
        for track_dir in tqdm(track_dirs, desc=model_name, unit="track"):
            track_stem = Path(track_dir.name).stem
            safe_track_name = safe_stem(track_dir.name)
            components_dir = (
                track_dir / "separated_components"
                if version == "separated"
                else track_dir / "reversed_separated_components"
            )
            if not components_dir.exists():
                print(f"[WARN] Components directory not found: {components_dir}")
                continue

            # one track's stems are equal-length — fold them into ONE
            # device-batched extraction (shared H2D + device pyin)
            comp_files = [
                f for f in sorted(components_dir.glob("*.wav"))
                if f.stem in components
            ]
            feats_batch = extract_features_for_paths(
                comp_files, sr,
                batch_size=args.batch_size,
                device_batch=not args.serial_features,
            )
            for component_file, feats in zip(comp_files, feats_batch):
                if feats is None:
                    continue
                component_name = component_file.stem
                meta = expl_df.get(model_name, {}).get(safe_track_name, {}).get("explanations", {})
                influences = meta.get("component_influences", {})
                # a missing explanations.json (audio-save arm) must not
                # fabricate importance 0.0 / POSITIVE rows indistinguishable
                # from real zeros — write null/UNKNOWN instead (vis loaders
                # fillna(0.0) at plot time, so downstream still renders)
                importance = influences.get(component_name)

                feats = dict(feats)
                feats["importance"] = importance

                track_entry = all_features.setdefault(model_name, {}).setdefault(
                    safe_track_name, {"type": "full_track", "components": {}}
                )
                track_entry["components"][component_name] = {
                    "features": feats,
                    "component_meta": {
                        "importance": importance,
                        "abs_importance": abs(importance) if importance is not None else None,
                        "component_type": (
                            "UNKNOWN" if importance is None
                            else "POSITIVE" if importance >= 0 else "NEGATIVE"
                        ),
                        "model": model_name,
                        "track_stem": track_stem,
                        "component_name": component_name,
                    },
                }

    features_path = output_root / "audiolime_component_features.json"
    append_update_features(all_features, features_path)
    print("Saved AudioLIME component features to:", features_path)


if __name__ == "__main__":
    main()
