#!/usr/bin/env python
"""Extract features from occlusion top-window WAV exports
(output-schema-compatible with the reference's
scripts/feature_extraction/run_occlusion_patch_features.py →
occlusion_patches_features.json, patch keys ``{group}_rank{rank}``)."""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[2]
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from adx_tpu.features.extraction import extract_features_for_paths
from adx_tpu.io.config import load_yaml
from adx_tpu.io.results import append_update_features


def main():
    ap = argparse.ArgumentParser(description="Extract occlusion patch features")
    ap.add_argument(
        "--config",
        default=str(ROOT / "configs/Spec_occlusion_configs" / "occlusion_patch_features.yaml"),
    )
    ap.add_argument("--batch-size", type=int, default=16,
                    help="Equal-length WAVs folded per device batch")
    ap.add_argument("--serial-features", action="store_true",
                    help="Per-file host-exact extraction (no device batching/pyin)")
    args = ap.parse_args()
    config = load_yaml(Path(args.config))

    dataset_cfg = config.get("dataset", {})
    output_cfg = config.get("output", {})
    audio_cfg = config.get("audio", {})
    patches_cfg = config.get("occlusion_patches", {})

    occlusion_root = Path(dataset_cfg.get("occlusion_result_path"))
    result_root = Path(output_cfg.get("result_path"))
    experiment_name = output_cfg.get("experiment_name", "occlusion_patches")
    sr = int(audio_cfg.get("samplerate", 44100))
    # sorted, not set(): per-process string-hash randomization made the
    # group iteration (and thus the output JSON's key insertion order)
    # differ between otherwise-identical runs — caught by a cross-sweep
    # byte diff whose parsed content was equal
    groups = sorted(set(patches_cfg.get("groups", ["best", "most_influential"])))

    output_root = result_root / experiment_name
    output_root.mkdir(parents=True, exist_ok=True)
    print("=" * 70)
    print("Occlusion Patch Features Extraction")
    print("=" * 70)
    print(f"Occlusion results: {occlusion_root}")
    print(f"Output:            {output_root}")
    print(f"Sample rate:       {sr}")
    print(f"Groups:            {', '.join(groups)}")
    print("=" * 70)

    all_features = {}
    saliency_root = occlusion_root / "saliency_maps"
    if not saliency_root.exists():
        print(f"[ERROR] saliency_maps dir not found: {saliency_root}")
        return

    for model_dir in sorted(saliency_root.iterdir()):
        if not model_dir.is_dir():
            continue
        model_name = model_dir.name
        print(f"Processing model: {model_name}")
        for track_dir in sorted(model_dir.iterdir()):
            if not track_dir.is_dir():
                continue
            track_stem = track_dir.name
            windows_dir = track_dir / "top_windows"
            if not windows_dir.exists():
                continue
            for group in groups:
                group_dir = windows_dir / group
                if not group_dir.exists():
                    continue
                meta_path = group_dir / f"{track_stem}__{group}_occlusion_patches_from_list.json"
                if not meta_path.exists():
                    print(f"[WARN] Missing meta json: {meta_path}")
                    continue
                with open(meta_path, "r", encoding="utf-8") as f:
                    windows = json.load(f).get("windows", [])
                # top-window patch WAVs share the fixed patch-grid length —
                # fold them into device-batched extraction (the helper
                # groups by exact length, so a clamped edge patch still
                # extracts correctly in its own batch)
                todo = []
                for win in windows:
                    rank = win["rank"]
                    abs_importance = win["abs_importance"]
                    ptype = win["type"]
                    wav_name = (
                        f"{track_stem}__{group}{rank}_patch_"
                        f"{ptype}_{abs_importance:.3f}_"
                        f"t{win['t_start']}-{win['t_end']}_f{win['f_start']}-{win['f_end']}.wav"
                    )
                    wav_path = group_dir / wav_name
                    if not wav_path.exists():
                        print(f"[WARN] Missing patch wav: {wav_path}")
                        continue
                    todo.append((win, rank, abs_importance, ptype, wav_path))

                feats_list = extract_features_for_paths(
                    [t[-1] for t in todo], sr,
                    batch_size=args.batch_size,
                    device_batch=not args.serial_features,
                )
                for (win, rank, abs_importance, ptype, _p), feats in zip(todo, feats_list):
                    if feats is None:
                        continue
                    feats = dict(feats)
                    track_entry = all_features.setdefault(model_name, {}).setdefault(
                        track_stem, {"type": "patch", "patches": {}}
                    )
                    track_entry["patches"][f"{group}_rank{rank}"] = {
                        "features": feats,
                        "occlusion_meta": {
                            "group": group,
                            "rank": int(rank),
                            "importance": float(win["importance"]),
                            "abs_importance": float(abs_importance),
                            "tstart": int(win["t_start"]),
                            "tend": int(win["t_end"]),
                            "fstart": int(win["f_start"]),
                            "fend": int(win["f_end"]),
                            "start_time_sec": float(win["start_time_sec"]),
                            "end_time_sec": float(win["end_time_sec"]),
                            "patch_type": ptype,
                            "model": model_name,
                            "track_stem": track_stem,
                        },
                    }

    features_path = output_root / "occlusion_patches_features.json"
    append_update_features(all_features, features_path)
    print("Saved occlusion patch features to:", features_path)


if __name__ == "__main__":
    main()
