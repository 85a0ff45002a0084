#!/usr/bin/env python
"""Extract features from FBP per-band WAV exports and join with band
importances (output-schema-compatible with the reference's
scripts/feature_extraction/run_fbp_patch_features.py →
fbp_band_features.json, band keys ``{component}_{low:.1f}_{high:.1f}Hz``)."""

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
from adx_tpu.io.config import load_yaml
from adx_tpu.io.results import append_update_features


def main():
    ap = argparse.ArgumentParser(description="Extract FBP band features")
    ap.add_argument("--config", default=str(ROOT / "configs/FBP_configs" / "fbp_bands_features.yaml"))
    ap.add_argument("--batch-size", type=int, default=16,
                    help="Equal-length WAVs folded per device batch")
    ap.add_argument("--serial-features", action="store_true",
                    help="Per-file host-exact extraction (no device batching/pyin)")
    args = ap.parse_args()
    config = load_yaml(Path(args.config))

    dataset_cfg = config.get("dataset", {})
    output_cfg = config.get("output", {})
    audio_cfg = config.get("audio", {})
    bands_cfg = config.get("fbp_bands", {})

    fbp_root = Path(dataset_cfg.get("fbp_result_path"))
    result_root = Path(output_cfg.get("result_path"))
    experiment_name = output_cfg.get("experiment_name", "fbp_bands")
    sr = int(audio_cfg.get("samplerate", 44100))
    # sorted, not set(): the component loop writes JSON keys in iteration
    # order, and per-process string-hash randomization made that order
    # differ between otherwise-identical runs
    components = sorted(set(bands_cfg.get("components", ["mixture"])))
    version = bands_cfg.get("version", "separated")

    result_root = (
        result_root / "separated_bands" if version == "separated" else result_root / "reversed_separated_bands"
    )
    output_root = result_root / experiment_name
    output_root.mkdir(parents=True, exist_ok=True)
    print("=" * 70)
    print("FBP Band Features Extraction")
    print("=" * 70)
    print(f"FBP results: {fbp_root}")
    print(f"Output:      {output_root}")
    print(f"Sample rate: {sr}")
    print(f"Components:  {', '.join(components)}")
    print("=" * 70)

    all_features = {}
    bands_root = fbp_root / "bands"
    if not bands_root.exists():
        print(f"[ERROR]: Bands directory not found: {bands_root}")
        return

    for model_dir in sorted(bands_root.iterdir()):
        if not model_dir.is_dir():
            continue
        model_name = model_dir.name
        print(f"Processing model: {model_name}")
        track_dirs = sorted(d for d in model_dir.iterdir() if d.is_dir())
        for track_dir in tqdm(track_dirs, desc=model_name, unit="track"):
            track_stem = track_dir.name
            for component in components:
                component_dir = track_dir / component
                if not component_dir.is_dir():
                    continue
                meta_path = component_dir / f"{track_stem}_bands_metadata.json"
                separated_dir = (
                    component_dir / "separated_bands"
                    if version == "separated"
                    else component_dir / "reversed_separated_bands"
                )
                if not meta_path.exists():
                    print(f"[WARN] Missing meta json: {meta_path}")
                    continue
                with open(meta_path, "r", encoding="utf-8") as f:
                    bands = json.load(f).get("bands", [])
                if not bands:
                    continue

                # all of one (track, component)'s band WAVs are equal-length
                # resyntheses — fold them into device-batched extraction
                # (extract_features_for_paths; ONE H2D + shared programs +
                # device pyin instead of a per-band serial walk)
                todo = []
                for band in bands:
                    comp = band.get("component", "mixture")
                    low, high = band["low"], band["high"]
                    importance = band["importance"]
                    ptype = band.get("type", "unknown")
                    wav_name = (
                        f"{track_stem}__{comp}__{int(low)}-{int(high)}Hz_{ptype}_{importance:+.3f}.wav"
                    )
                    wav_path = separated_dir / "freq_batches" / wav_name
                    if not wav_path.exists():
                        print(f"[WARN] Missing wav file: {wav_path}")
                        continue
                    todo.append((band, comp, low, high, importance, ptype, wav_path))

                feats_list = extract_features_for_paths(
                    [t[-1] for t in todo], sr,
                    batch_size=args.batch_size,
                    device_batch=not args.serial_features,
                )
                for (band, comp, low, high, importance, ptype, _p), feats in zip(
                    tqdm(todo, desc=f"{model_name} - {track_stem} - {component}",
                         unit="band", leave=False),
                    feats_list,
                ):
                    if feats is None:
                        continue
                    feats = dict(feats)
                    track_entry = all_features.setdefault(model_name, {}).setdefault(
                        track_stem, {"type": "band", "bands": {}}
                    )
                    track_entry["bands"][f"{comp}_{low:.1f}_{high:.1f}Hz"] = {
                        "features": feats,
                        "band_meta": {
                            "component": comp,
                            "importance": importance,
                            "abs_importance": band["abs_importance"],
                            "low_freq": low,
                            "high_freq": high,
                            "band_type": ptype,
                            "model": model_name,
                            "track_stem": track_stem,
                        },
                    }

    features_path = output_root / "fbp_band_features.json"
    append_update_features(all_features, features_path)
    print("Saved fbp band features to:", features_path)


if __name__ == "__main__":
    main()
