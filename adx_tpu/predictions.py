"""Batch prediction runner — schema-compatible with the reference's
``run_sonics_predictions`` (src/sonic_predictions.py:114-164):
``predictions.json`` = {model: {safe_stem: {file_path, model, track_stem,
prediction, predicted_class, track_source}}}."""

from __future__ import annotations

import math
from pathlib import Path

from adx_tpu.io.results import _dump_json_atomic, safe_stem
from adx_tpu.parallel.host_shard import host_shard
from adx_tpu.predict import predict_batch_from_files


def run_sonics_predictions(
    predictor,
    dataset_path="../../Data/FakeRealMusic",
    explanations_path="predictions.json",
    sample_rate: int = 44100,
    threshold: float = 0.5,
    shard_index: int = 0,
    num_shards: int = 1,
):
    results = {}
    dataset_path = Path(dataset_path)

    for folder in dataset_path.iterdir():
        if not folder.is_dir():
            continue
        class_name = folder.name
        all_audio = list(folder.glob("*.mp3")) + list(folder.glob("*.wav"))
        if num_shards > 1:
            # track-level DP across hosts (SURVEY §2.6(c)): shard the sorted
            # list so every host sees the same order (predictions.json is
            # keyed by stem, so output order is immaterial)
            all_audio = host_shard(sorted(all_audio), shard_index, num_shards)
        if not all_audio:
            continue

        print(f"🔊 Processing: {class_name}: {len(all_audio)} files")
        probs = predict_batch_from_files(predictor, all_audio, verbose=True, sr=sample_rate)

        folder_results = {}
        skipped = []
        for audio_file, model_prob in zip(all_audio, probs):
            if not math.isfinite(model_prob):
                skipped.append(audio_file.name)
                continue
            safe_name = safe_stem(audio_file)
            folder_results[safe_name] = {
                "file_path": str(audio_file),
                "model": folder.name,
                "track_stem": safe_name,
                "prediction": float(model_prob),
                "predicted_class": "Fake" if model_prob > threshold else "Real",
                "track_source": "Real" if folder.name.lower() == "real" else "Fake",
            }
        if skipped:
            print(f"   [Warning] {len(skipped)} undecodable file(s) skipped in "
                  f"{class_name}: {', '.join(skipped)}")
        results[class_name] = folder_results

    output_path = Path(explanations_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    # tmp+replace like every other result writer: a dump truncated by a kill
    # must not clobber a previous good predictions.json
    _dump_json_atomic(output_path, results)
    print(f"\n✅ Results saved in: {explanations_path}")
    return results
