"""Feature extraction drivers — flow- and schema-compatible with the
reference's ``src/feature_calculate.py`` (extract_all_features_separately
:105-166, extract_features_segmented :168-234, run_features_extraction
:236-338), minus the TF graph-scope wrapper (no TF in this process)."""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from adx_tpu.features.extraction import (
    extract_all_features,
    extract_all_features_batch,
)
from adx_tpu.io.audio_io import load_audio, write_wav
from adx_tpu.io.results import append_update_features, safe_stem, to_native_dict
from adx_tpu.parallel.host_shard import host_shard


def extract_all_features_separately(
    audio_files: List[Path],
    max_samples: int = 5,
    ids_to_get_features: Optional[List[int]] = (0, 1, 2, 3, 4, 5, 6, 7, 8, 9),
    features_output_dir: Optional[Path] = None,
    folder_name: str = "",
    sample_rate: int = 44100,
    device_batch: bool = True,
    batch_size: int = 16,
) -> Dict[str, dict]:
    """Full-track extraction: per-file 120 s decode → feature dict keyed by
    sanitized stem, merged over any existing features.json.

    ``device_batch=True`` folds equal-length tracks (the 120 s crops all
    are) into device-batched extraction (one H2D + shared programs + device
    pyin — see extraction.extract_all_features_batch); a batch failure falls
    back to the serial per-sample path so error containment is per sample
    either way.

    ``max_samples=None`` means "all files" (a config without
    ``features.max_samples`` reaches here as None; the reference crashes on
    that — deviate where broken)."""
    if max_samples is None:
        max_samples = len(audio_files)
    print(f"Starting calculating features for {min(len(audio_files), max_samples)} samples...")
    audio_arrays = []
    for fpath in audio_files[:max_samples]:
        y, _ = load_audio(fpath, sr=sample_rate, mono=True, offset=0, duration=120)
        audio_arrays.append(y)

    features_all_tracks: Dict[str, dict] = {}
    if features_output_dir:
        features_path = Path(features_output_dir) / folder_name / "features.json"
        if features_path.exists():
            try:
                import json

                with open(features_path, "r", encoding="utf-8") as f:
                    features_all_tracks = json.load(f)
            except Exception as e:
                print(f"   Warning: Could not load existing features from {features_path}: {e}")

    eligible = [
        i for i in range(min(len(audio_arrays), max_samples))
        if ids_to_get_features is None or i in ids_to_get_features
    ]

    # device batching: equal-length groups → one batched program chain;
    # on any batch failure fall back to the serial per-sample path below,
    # so error containment stays per sample
    batched: Dict[int, dict] = {}
    if device_batch and eligible:
        from adx_tpu.batching import equal_length_chunks

        # singletons go through the B=1 batch path too: routing them
        # to host pyin would make a track's feature numerics depend
        # on accidental batch grouping (device f32 vs host f64 razor
        # edges) — adding one file could move ANOTHER file's values
        for sel in equal_length_chunks(
            {i: audio_arrays[i] for i in eligible}, batch_size
        ):
            try:
                feats = extract_all_features_batch(
                    [audio_arrays[i] for i in sel], sample_rate
                )
                batched.update(zip(sel, feats))
            except Exception as e:  # noqa: BLE001 — fall back serial
                print(f"   Warning: batched extraction failed "
                      f"({type(e).__name__}: {e}); falling back to serial")

    for i in eligible:
        print(f"   Extracting features from sample {i+1}/{len(audio_arrays)}")
        try:
            safe_name = safe_stem(audio_files[i])
            # load_audio(mono=True) above already downmixed (ops.audio.to_mono)
            mix_features = batched.get(i) or extract_all_features(
                audio_arrays[i], sr=sample_rate
            )
            if "intonation_pattern" in mix_features:
                mix_features["intonation_pattern"].pop("f0_contour", None)
                mix_features["intonation_pattern"].pop("times", None)
            features_all_tracks[safe_name] = {"mix": to_native_dict(mix_features)}
        except Exception as e:  # noqa: BLE001 — per-sample resilience by contract
            print(f"❌ Error processing sample {i+1}: {e}")

    return features_all_tracks


def extract_features_segmented(
    audio_path: str,
    max_duration: Optional[float] = None,
    ids_to_get_features: Optional[List[int]] = None,
    model_time: float = 120.0,
    features_output_dir: Optional[Path] = None,
    max_samples: int = 5,
    model_name: Optional[str] = None,
    audio_file_stem: Optional[str] = None,
    segment_duration: float = 10.0,
    sample_rate: int = 44100,
    device_batch: bool = True,
    batch_size: int = 16,
) -> Dict[str, Dict]:
    if ids_to_get_features is None:
        ids_to_get_features = list(range(1000))

    y, sr = load_audio(audio_path, sr=sample_rate, mono=True, duration=max_duration)
    total_duration = min(len(y) / sr, model_time)
    segment_samples = int(segment_duration * sr)
    n_segments = int(np.ceil(total_duration / segment_duration))

    print(f"total_duration: {total_duration}")
    print(f"segment_samples: {segment_samples}")
    print(f"n_segments: {n_segments}")

    results = {}
    for seg_i in range(n_segments):
        start_sample = seg_i * segment_samples
        end_sample = min((seg_i + 1) * segment_samples, len(y))
        segment_audio = y[start_sample:end_sample]
        if len(segment_audio) < 2048:
            print(f"⏭️  Segment {seg_i} too short ({len(segment_audio)} samples), skipping.")
            continue
        print(
            f"\n🎵 Processing segment {seg_i} ({start_sample}-{end_sample} samples, "
            f"{segment_duration}s approx)"
        )
        segment_dir_name = f"segment_{seg_i}_{int(start_sample / sr)}s_to_{int(end_sample / sr)}s"
        if features_output_dir and model_name and audio_file_stem:
            segment_output_dir = Path(features_output_dir) / model_name / audio_file_stem / segment_dir_name
            segment_output_dir.mkdir(parents=True, exist_ok=True)
            segment_wav_path = segment_output_dir / f"segment_{seg_i}.wav"
            write_wav(segment_wav_path, segment_audio, sr)
        else:
            segment_wav_path = None

        segmented_audio_files = [segment_wav_path] if segment_wav_path else []
        results[segment_dir_name] = extract_all_features_separately(
            audio_files=segmented_audio_files,
            max_samples=max_samples,
            ids_to_get_features=ids_to_get_features,
            features_output_dir=Path(features_output_dir) / model_name / audio_file_stem
            if features_output_dir
            else None,
            folder_name=segment_dir_name,
            sample_rate=sample_rate,
            device_batch=device_batch,
            batch_size=batch_size,
        )
    return results


def run_features_extraction(
    dataset_path: Path,
    model_time: float = 120.0,
    max_samples: int = 5,
    models_to_get_features=("ElevenLabs", "REAL", "SUNO", "SUNO_PRO", "UDIO"),
    ids_to_get_features=(0, 1, 2, 3, 4, 5, 6, 7, 8, 9),
    features_output_dir_full: Optional[str] = None,
    features_output_dir_segmented: Optional[str] = None,
    full_track_features: bool = True,
    segmented_features: bool = False,
    segment_duration: float = 5.0,
    sample_rate: int = 44100,
    shard_index: int = 0,
    num_shards: int = 1,
    device_batch: bool = True,
    batch_size: int = 16,
):
    merged_segmented_features: Dict[str, dict] = {}

    for folder in Path(dataset_path).iterdir():
        if not folder.is_dir() or folder.name not in models_to_get_features:
            continue
        print(f"\n🔊 Processing folder: {folder.name}")
        all_audio = sorted(list(folder.glob("*.mp3")) + list(folder.glob("*.wav")))[:max_samples]
        if num_shards > 1:
            # track-level DP across hosts (SURVEY §2.6(c)); with sharding,
            # ids_to_get_features indexes this host's slice
            all_audio = host_shard(all_audio, shard_index, num_shards)
            print(f"   Shard {shard_index}/{num_shards}: {len(all_audio)} files")
        if not all_audio:
            print("   No audio files found, skipping...")
            continue

        if full_track_features:
            folder_features = extract_all_features_separately(
                audio_files=all_audio,
                max_samples=max_samples,
                ids_to_get_features=list(ids_to_get_features),
                features_output_dir=features_output_dir_full,
                folder_name=folder.name,
                sample_rate=sample_rate,
                device_batch=device_batch,
                batch_size=batch_size,
            )
            # full-track entries wrapped in the reference's segments-shaped
            # schema (src/feature_calculate.py:273-289)
            folder_features_str_keys = {
                str(k): {
                    "type": "full_track",
                    "segments": {
                        "segment_id": "full_track",
                        "features": v,
                        "segment_meta": {
                            "component": "mixture",
                            "model": folder.name,
                            "track_stem": k,
                            "segment_name": "full_track",
                        },
                    },
                }
                for k, v in folder_features.items()
                if not isinstance(k, int) and not (isinstance(k, str) and k.isdigit())
            }
            if not folder_features_str_keys:
                continue
            append_update_features(
                {folder.name: folder_features_str_keys},
                Path(features_output_dir_full) / "features.json",
            )

        if segmented_features:
            merged_segmented_features.setdefault(folder.name, {})
            for audio_file in all_audio:
                audio_stem = Path(audio_file).stem
                segs = extract_features_segmented(
                    audio_path=str(audio_file),
                    segment_duration=segment_duration,
                    features_output_dir=features_output_dir_segmented,
                    max_samples=max_samples,
                    ids_to_get_features=list(ids_to_get_features),
                    model_name=folder.name,
                    audio_file_stem=audio_stem,
                    max_duration=model_time,
                    sample_rate=sample_rate,
                    device_batch=device_batch,
                    batch_size=batch_size,
                )
                entry = merged_segmented_features[folder.name].setdefault(
                    audio_stem, {"type": "segment", "segments": {}}
                )
                for segment_id, features_data in segs.items():
                    if isinstance(segment_id, str) and segment_id.isdigit():
                        continue
                    entry["segments"][str(segment_id)] = {
                        "features": features_data,
                        "segment_meta": {
                            "component": "mixture",
                            "model": folder.name,
                            "track_stem": audio_stem,
                            "segment_name": segment_id,
                        },
                    }
                append_update_features(
                    merged_segmented_features,
                    Path(features_output_dir_segmented) / "features.json",
                )
