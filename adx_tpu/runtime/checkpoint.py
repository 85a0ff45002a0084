"""Experiment checkpoint/resume with the reference's exact JSON schemas.

Three checkpoint families (SURVEY.md §5.4), preserved file-for-file so runs
from the reference and this framework can resume each other's sweeps:

* ``ExperimentCheckpoint``      — FBP: ``processing_checkpoint.json`` with
  processed_files/totals/last_updated + ``failed_files.json`` +
  ``progress.txt`` (src/dsp_band_ops.py:120-209).
* ``SpectrogramCheckpoint``     — occlusion/RISE: ``spectrogram_checkpoint
  .json`` + ``spectrogram_progress.txt`` (src/spectrogram_explainability
  .py:97-135).
* ``LIMEExperimentCheckpoint``  — per-sample and per-segment grain in
  ``lime_checkpoint.json`` (src/lime_explainer.py:220-281).
"""

from __future__ import annotations

import json
from datetime import datetime
from pathlib import Path
from typing import Dict, List

from adx_tpu.io.results import convert_to_native


class ExperimentCheckpoint:
    """File-level checkpoint with failure ledger (FBP family)."""

    def __init__(self, checkpoint_dir: str | Path):
        self.checkpoint_dir = Path(checkpoint_dir)
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self.checkpoint_file = self.checkpoint_dir / "processing_checkpoint.json"
        self.failed_files_log = self.checkpoint_dir / "failed_files.json"
        self.progress_log = self.checkpoint_dir / "progress.txt"

    def load_processed_files(self) -> set:
        if self.checkpoint_file.exists():
            with open(self.checkpoint_file, "r", encoding="utf-8") as f:
                data = json.load(f)
                return set(data.get("processed_files", []))
        return set()

    def mark_as_processed(self, file_path: str, success: bool = True, error_msg: str | None = None):
        if self.checkpoint_file.exists():
            with open(self.checkpoint_file, "r", encoding="utf-8") as f:
                data = json.load(f)
        else:
            data = {
                "processed_files": [],
                "last_updated": None,
                "total_processed": 0,
                "total_failed": 0,
            }
        if file_path not in data["processed_files"]:
            data["processed_files"].append(file_path)
            data["total_processed"] = len(data["processed_files"])
        data["last_updated"] = datetime.now().isoformat()
        if not success:
            data["total_failed"] = data.get("total_failed", 0) + 1
        with open(self.checkpoint_file, "w", encoding="utf-8") as f:
            json.dump(data, f, ensure_ascii=False, indent=2)
        if not success and error_msg:
            self._log_failed_file(file_path, error_msg)

    def _log_failed_file(self, file_path: str, error_msg: str):
        if self.failed_files_log.exists():
            with open(self.failed_files_log, "r", encoding="utf-8") as f:
                failed = json.load(f)
        else:
            failed = {"failed_files": []}
        failed["failed_files"].append(
            {
                "file_path": file_path,
                "error": str(error_msg),
                "timestamp": datetime.now().isoformat(),
            }
        )
        with open(self.failed_files_log, "w", encoding="utf-8") as f:
            json.dump(failed, f, ensure_ascii=False, indent=2)
        with open(self.progress_log, "a", encoding="utf-8") as f:
            f.write(f"[FAILED] {datetime.now().isoformat()} | {file_path} | {error_msg}\n")

    def get_failed_files(self) -> list:
        if self.failed_files_log.exists():
            with open(self.failed_files_log, "r", encoding="utf-8") as f:
                data = json.load(f)
                return data.get("failed_files", [])
        return []

    def get_stats(self) -> dict:
        if self.checkpoint_file.exists():
            with open(self.checkpoint_file, "r", encoding="utf-8") as f:
                data = json.load(f)
                return {
                    "total_processed": data.get("total_processed", 0),
                    "total_failed": data.get("total_failed", 0),
                    "last_updated": data.get("last_updated", None),
                }
        return {"total_processed": 0, "total_failed": 0, "last_updated": None}

    def reset(self):
        for f in [self.checkpoint_file, self.failed_files_log, self.progress_log]:
            if f.exists():
                f.unlink()


class SpectrogramCheckpoint:
    """File-level checkpoint with append-only progress log (occlusion/RISE)."""

    def __init__(self, checkpoint_dir: str | Path):
        self.checkpoint_dir = Path(checkpoint_dir)
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self.checkpoint_file = self.checkpoint_dir / "spectrogram_checkpoint.json"
        self.progress_log = self.checkpoint_dir / "spectrogram_progress.txt"

    def load_processed_files(self) -> set:
        if self.checkpoint_file.exists():
            with open(self.checkpoint_file, "r", encoding="utf-8") as f:
                data = json.load(f)
                return set(data.get("processed_files", []))
        return set()

    def mark_as_processed(self, file_path: str):
        if self.checkpoint_file.exists():
            with open(self.checkpoint_file, "r", encoding="utf-8") as f:
                data = json.load(f)
        else:
            data = {"processed_files": [], "last_updated": None}
        if file_path not in data["processed_files"]:
            data["processed_files"].append(file_path)
        data["last_updated"] = datetime.now().isoformat()
        with open(self.checkpoint_file, "w", encoding="utf-8") as f:
            json.dump(data, f, ensure_ascii=False, indent=2)
        with open(self.progress_log, "a", encoding="utf-8") as f:
            f.write(f"[PROCESSED] {datetime.now().isoformat()} | {file_path}\n")


class LIMEExperimentCheckpoint:
    """Sample- and segment-level checkpoint (AudioLIME)."""

    def __init__(self, checkpoint_dir: str | Path):
        self.checkpoint_dir = Path(checkpoint_dir)
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self.checkpoint_file = self.checkpoint_dir / "lime_checkpoint.json"

    def load_processed_samples(self) -> Dict[str, set]:
        if self.checkpoint_file.exists():
            with open(self.checkpoint_file, "r", encoding="utf-8") as f:
                data = json.load(f)
                return {
                    folder: set(samples)
                    for folder, samples in data.get("processed_samples", {}).items()
                }
        return {}

    def mark_as_processed(self, folder: str, sample_id: int):
        if self.checkpoint_file.exists():
            with open(self.checkpoint_file, "r", encoding="utf-8") as f:
                data = json.load(f)
        else:
            data = {"processed_samples": {}}
        data.setdefault("processed_samples", {}).setdefault(folder, [])
        if sample_id not in data["processed_samples"][folder]:
            data["processed_samples"][folder].append(sample_id)
        with open(self.checkpoint_file, "w", encoding="utf-8") as f:
            json.dump(convert_to_native(data), f, ensure_ascii=False, indent=2)

    def load_processed_segments(self) -> Dict[str, Dict[str, List[int]]]:
        if self.checkpoint_file.exists():
            with open(self.checkpoint_file, "r", encoding="utf-8") as f:
                data = json.load(f)
                return data.get("processed_segments", {})
        return {}

    def mark_segment_as_processed(self, model: str, audio_file_stem: str, segment_idx: int):
        if self.checkpoint_file.exists():
            with open(self.checkpoint_file, "r", encoding="utf-8") as f:
                data = json.load(f)
        else:
            data = {"processed_segments": {}}
        seg = data.setdefault("processed_segments", {}).setdefault(model, {}).setdefault(
            audio_file_stem, []
        )
        if segment_idx not in seg:
            seg.append(segment_idx)
        with open(self.checkpoint_file, "w", encoding="utf-8") as f:
            json.dump(data, f, ensure_ascii=False, indent=2)
