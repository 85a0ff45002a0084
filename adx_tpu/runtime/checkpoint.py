"""Experiment checkpoint/resume with the reference's exact JSON schemas.

Three checkpoint families (SURVEY.md §5.4) whose FILE FORMATS are the
parity contract — file names, JSON keys, indent-2 layout, and progress-log
line formats match the reference byte-for-byte so runs from either
implementation can resume each other's sweeps:

* ``ExperimentCheckpoint``      — FBP: ``processing_checkpoint.json`` with
  processed_files/totals/last_updated + ``failed_files.json`` +
  ``progress.txt`` (reference schema: src/dsp_band_ops.py:120-209).
* ``SpectrogramCheckpoint``     — occlusion/RISE: ``spectrogram_checkpoint
  .json`` + ``spectrogram_progress.txt`` (src/spectrogram_explainability
  .py:97-135).
* ``LIMEExperimentCheckpoint``  — per-sample and per-segment grain in
  ``lime_checkpoint.json`` (src/lime_explainer.py:220-281).

The implementation is NOT the reference's: every ledger mutation goes
through one shared read-modify-write core with (a) ATOMIC writes (tmp +
``os.replace`` — the reference dumps in place, so a crash mid-write
destroys the whole ledger) and (b) TOLERANT reads (a truncated file from a
killed run degrades to a fresh ledger with a warning instead of aborting
every subsequent resume), and all payloads are numpy-sanitized.
"""

from __future__ import annotations

import contextlib
import json
import os
import tempfile
from datetime import datetime
from pathlib import Path
from typing import Callable, Dict, List

from adx_tpu.io.results import convert_to_native


def _now() -> str:
    return datetime.now().isoformat()


def _read_state(path: Path, default: dict) -> dict:
    """Missing or truncated (crash mid-write) files yield ``default``."""
    if not path.exists():
        return json.loads(json.dumps(default))
    try:
        with open(path, "r", encoding="utf-8") as f:
            return json.load(f)
    except (json.JSONDecodeError, UnicodeDecodeError, OSError) as e:
        # UnicodeDecodeError is NOT a JSONDecodeError subclass: a reference-
        # side kill mid-write (it dumps in place) can truncate inside a
        # multi-byte UTF-8 sequence, and resume must degrade, not crash
        print(f"⚠️ Warning: unreadable checkpoint {path} ({e}); treating as empty")
        return json.loads(json.dumps(default))


def _write_state(path: Path, data: dict) -> None:
    """Atomic replace so a kill mid-dump never truncates the ledger."""
    fd, tmp = tempfile.mkstemp(dir=str(path.parent), suffix=".tmp")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(convert_to_native(data), f, ensure_ascii=False, indent=2)
        os.replace(tmp, path)
    except BaseException:
        with contextlib.suppress(OSError):
            os.unlink(tmp)
        raise


def _update_state(path: Path, default: dict, mutate: Callable[[dict], None]) -> dict:
    state = _read_state(path, default)
    mutate(state)
    _write_state(path, state)
    return state


def _append_line(path: Path, line: str) -> None:
    with open(path, "a", encoding="utf-8") as f:
        f.write(line + "\n")


class ExperimentCheckpoint:
    """File-level checkpoint with failure ledger (FBP family)."""

    _DEFAULT = {
        "processed_files": [],
        "last_updated": None,
        "total_processed": 0,
        "total_failed": 0,
    }

    def __init__(self, checkpoint_dir: str | Path):
        self.checkpoint_dir = Path(checkpoint_dir)
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self.checkpoint_file = self.checkpoint_dir / "processing_checkpoint.json"
        self.failed_files_log = self.checkpoint_dir / "failed_files.json"
        self.progress_log = self.checkpoint_dir / "progress.txt"

    def load_processed_files(self) -> set:
        return set(_read_state(self.checkpoint_file, self._DEFAULT)["processed_files"])

    def mark_as_processed(self, file_path: str, success: bool = True,
                          error_msg: str | None = None):
        def mutate(state: dict) -> None:
            done: list = state.setdefault("processed_files", [])
            if file_path not in done:
                done.append(file_path)
                state["total_processed"] = len(done)
            state["last_updated"] = _now()
            if not success:
                state["total_failed"] = state.get("total_failed", 0) + 1

        _update_state(self.checkpoint_file, self._DEFAULT, mutate)
        if not success and error_msg:
            self._log_failed_file(file_path, error_msg)

    def _log_failed_file(self, file_path: str, error_msg: str):
        _update_state(
            self.failed_files_log,
            {"failed_files": []},
            lambda state: state.setdefault("failed_files", []).append(
                {"file_path": file_path, "error": str(error_msg),
                 "timestamp": _now()}
            ),
        )
        _append_line(self.progress_log,
                     f"[FAILED] {_now()} | {file_path} | {error_msg}")

    def get_failed_files(self) -> list:
        return _read_state(self.failed_files_log, {"failed_files": []})["failed_files"]

    def get_stats(self) -> dict:
        state = _read_state(self.checkpoint_file, self._DEFAULT)
        return {
            "total_processed": state.get("total_processed", 0),
            "total_failed": state.get("total_failed", 0),
            "last_updated": state.get("last_updated", None),
        }

    def reset(self):
        for f in (self.checkpoint_file, self.failed_files_log, self.progress_log):
            if f.exists():
                f.unlink()


class SpectrogramCheckpoint:
    """File-level checkpoint with append-only progress log (occlusion/RISE)."""

    _DEFAULT = {"processed_files": [], "last_updated": None}

    def __init__(self, checkpoint_dir: str | Path):
        self.checkpoint_dir = Path(checkpoint_dir)
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self.checkpoint_file = self.checkpoint_dir / "spectrogram_checkpoint.json"
        self.progress_log = self.checkpoint_dir / "spectrogram_progress.txt"

    def load_processed_files(self) -> set:
        return set(_read_state(self.checkpoint_file, self._DEFAULT)["processed_files"])

    def mark_as_processed(self, file_path: str):
        def mutate(state: dict) -> None:
            done: list = state.setdefault("processed_files", [])
            if file_path not in done:
                done.append(file_path)
            state["last_updated"] = _now()

        _update_state(self.checkpoint_file, self._DEFAULT, mutate)
        _append_line(self.progress_log, f"[PROCESSED] {_now()} | {file_path}")


class LIMEExperimentCheckpoint:
    """Sample- and segment-level checkpoint (AudioLIME)."""

    def __init__(self, checkpoint_dir: str | Path):
        self.checkpoint_dir = Path(checkpoint_dir)
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self.checkpoint_file = self.checkpoint_dir / "lime_checkpoint.json"

    def _state(self) -> dict:
        return _read_state(self.checkpoint_file, {})

    def load_processed_samples(self) -> Dict[str, set]:
        return {
            folder: set(samples)
            for folder, samples in self._state().get("processed_samples", {}).items()
        }

    def mark_as_processed(self, folder: str, sample_id: int):
        def mutate(state: dict) -> None:
            done: list = state.setdefault("processed_samples", {}).setdefault(folder, [])
            if sample_id not in done:
                done.append(sample_id)

        _update_state(self.checkpoint_file, {}, mutate)

    def load_processed_segments(self) -> Dict[str, Dict[str, List[int]]]:
        return self._state().get("processed_segments", {})

    def mark_segment_as_processed(self, model: str, audio_file_stem: str, segment_idx: int):
        def mutate(state: dict) -> None:
            done: list = (
                state.setdefault("processed_segments", {})
                .setdefault(model, {})
                .setdefault(audio_file_stem, [])
            )
            if segment_idx not in done:
                done.append(segment_idx)

        _update_state(self.checkpoint_file, {}, mutate)
