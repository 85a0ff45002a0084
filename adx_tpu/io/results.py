"""Result-JSON merge semantics, preserved bit-for-bit from the reference.

Three merge families exist in the reference, each with distinct overwrite
policy (SURVEY.md §5.4):

* ``append_update_results`` — blind per-file overwrite, used by the
  spectrogram and FBP experiments (src/spectrogram_explainability.py:254-286,
  src/dsp_band_ops.py:86-118; both ``indent=4, ensure_ascii=False``).
* ``append_update_explanations`` — don't-overwrite-non-empty
  ``component_influences``, with segment-level grain
  (src/lime_explainer.py:27-94).
* ``append_update_features`` — same shape for feature dicts
  (src/feature_calculate.py:20-78).
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import numpy as np


def _dump_json_atomic(path, payload, indent: int = 4) -> None:
    """Write a result JSON via tmp + os.replace: these files are the
    sweep's ONLY durable output, and an in-place dump truncated by a kill
    (a real occurrence on this host) silently destroys every previously
    merged entry while the checkpoint still marks them processed."""
    import contextlib
    import os
    import tempfile

    path = Path(path)
    fd, tmp = tempfile.mkstemp(dir=str(path.parent), suffix=".tmp")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(payload, f, indent=indent, ensure_ascii=False)
        os.replace(tmp, path)
    except BaseException:
        with contextlib.suppress(OSError):
            os.unlink(tmp)
        raise


def convert_to_native(obj):
    """Recursively convert numpy scalars/arrays to JSON-native types
    (reference: src/lime_explainer.py:106-120)."""
    if isinstance(obj, dict):
        return {k: convert_to_native(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [convert_to_native(i) for i in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, np.floating):
        return float(obj)
    if isinstance(obj, np.integer):
        return int(obj)
    if isinstance(obj, np.bool_):
        return bool(obj)
    return obj


def to_native_dict(d):
    """Shallow variant (reference: src/lime_explainer.py:122-129)."""
    native = {}
    for k, v in d.items():
        if isinstance(v, (np.generic, np.ndarray)):
            native[k] = float(v)
        else:
            native[k] = v
    return native


def importance_type(delta: float) -> str:
    """POSITIVE/NEGATIVE/NEUTRAL label for an importance delta (the
    reference's filename/JSON convention, shared by the FBP band exports,
    band metadata, and occlusion top-window names)."""
    return "POSITIVE" if delta > 0 else "NEGATIVE" if delta < 0 else "NEUTRAL"


def safe_stem(path: str | Path) -> str:
    """Sanitized track key used across all result JSONs
    (reference: ``re.sub(r'[^a-zA-Z0-9_\\-]', '_', Path(p).stem)``,
    src/lime_explainer.py:416)."""
    return re.sub(r"[^a-zA-Z0-9_\-]", "_", Path(path).stem)


def _read_json(path: Path, warn_label: str, set_aside_corrupt: bool = False) -> dict:
    """Tolerant read. With ``set_aside_corrupt`` (the merge-on-write callers),
    an UNREADABLE existing file is preserved as ``<name>.corrupt`` rather than
    silently treated as empty: the subsequent atomic dump would otherwise
    overwrite it with just the new batch, destroying every previously merged
    entry while the checkpoint still marks those files processed."""
    if path.exists():
        try:
            with open(path, "r", encoding="utf-8") as f:
                return json.load(f)
        except Exception:
            print(f"⚠️ Warning: could not read existing {warn_label} from {path}")
            if set_aside_corrupt:
                import contextlib
                import os

                backup = path.with_name(path.name + ".corrupt")
                with contextlib.suppress(OSError):
                    os.replace(path, backup)
                    print(f"   (unreadable file preserved as {backup})")
    return {}


def append_update_results(new_results: dict, results_path: Path) -> None:
    """Blind per-file merge: {model: {file_key: data}} (spectrogram/FBP)."""
    results_path = Path(results_path)
    merged = _read_json(results_path, "results", set_aside_corrupt=True)
    for model_name, files_dict in new_results.items():
        if model_name not in merged:
            merged[model_name] = {}
        for file_key, data in files_dict.items():
            merged[model_name][file_key] = data
    results_path.parent.mkdir(parents=True, exist_ok=True)
    _dump_json_atomic(results_path, convert_to_native(merged))


def _is_empty_component_influences(entry: dict) -> bool:
    ci = None
    if entry.get("type") == "full_track":
        ci = entry.get("explanations", {}).get("component_influences")
    elif entry.get("type") == "segment":
        segments = entry.get("segments", {})
        if not segments:
            return True
        for seg_data in segments.values():
            ci_seg = seg_data.get("explanations", {}).get("component_influences")
            if ci_seg is not None and len(ci_seg) > 0:
                return False
        return True
    else:
        ci = entry.get("component_influences")
    return ci is None or ci == {} or len(ci) == 0


def append_update_explanations(new_explanations: dict, explanations_path: Path) -> None:
    """LIME merge: keep existing entries whose component_influences are
    non-empty; merge segment entries per segment id."""
    explanations_path = Path(explanations_path)
    merged = _read_json(explanations_path, "explanations", set_aside_corrupt=True)
    for model_name, audio_items in new_explanations.items():
        if model_name not in merged:
            merged[model_name] = audio_items
            continue
        for audio_stem, explanation_data in audio_items.items():
            if audio_stem not in merged[model_name]:
                merged[model_name][audio_stem] = explanation_data
                continue
            existing_entry = merged[model_name][audio_stem]
            if explanation_data.get("type") == "full_track":
                if _is_empty_component_influences(existing_entry):
                    merged[model_name][audio_stem] = explanation_data
            elif explanation_data.get("type") == "segment":
                if "segments" not in existing_entry:
                    merged[model_name][audio_stem] = explanation_data
                else:
                    existing_segments = existing_entry.get("segments", {})
                    for seg_id, seg_expl in explanation_data.get("segments", {}).items():
                        if seg_id not in existing_segments or _is_empty_component_influences(
                            existing_segments[seg_id]
                        ):
                            existing_segments[seg_id] = seg_expl
                    merged[model_name][audio_stem]["segments"] = existing_segments
    explanations_path.parent.mkdir(parents=True, exist_ok=True)
    _dump_json_atomic(explanations_path, convert_to_native(merged))


def _is_empty_features(entry: dict) -> bool:
    if entry.get("type") == "full_track":
        return not bool(entry.get("features"))
    if entry.get("type") == "segment":
        segments = entry.get("segments", {})
        if not segments:
            return True
        for seg_data in segments.values():
            if seg_data.get("features"):
                return False
        return True
    return not bool(entry.get("features"))


def append_update_features(new_features: dict, features_path: Path) -> None:
    """Feature merge: same policy as explanations but keyed on 'features'."""
    features_path = Path(features_path)
    merged = _read_json(features_path, "features", set_aside_corrupt=True)
    for model_name, audio_items in new_features.items():
        if model_name not in merged:
            merged[model_name] = audio_items
            continue
        for audio_stem, feature_data in audio_items.items():
            if audio_stem not in merged[model_name]:
                merged[model_name][audio_stem] = feature_data
                continue
            existing_entry = merged[model_name][audio_stem]
            if feature_data.get("type") == "full_track":
                if _is_empty_features(existing_entry):
                    merged[model_name][audio_stem] = feature_data
            elif feature_data.get("type") == "segment":
                if "segments" not in existing_entry:
                    merged[model_name][audio_stem] = feature_data
                else:
                    existing_segments = existing_entry.get("segments", {})
                    for seg_id, seg_features in feature_data.get("segments", {}).items():
                        if seg_id not in existing_segments or _is_empty_features(
                            existing_segments[seg_id]
                        ):
                            existing_segments[seg_id] = seg_features
                    merged[model_name][audio_stem]["segments"] = existing_segments
    features_path.parent.mkdir(parents=True, exist_ok=True)
    _dump_json_atomic(features_path, convert_to_native(merged))


def load_existing_explanations(explanations_path: Path) -> dict:
    return _read_json(Path(explanations_path), "explanations")
