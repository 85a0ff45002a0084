"""Occlusion & RISE spectrogram saliency — batched TPU engine.

Capability-equivalent to the reference's ``SpectrogramExplainability``
(src/spectrogram_explainability.py:288-1049): same constructor surface,
patch-grid math, importance/count-map normalization, RISE normalization,
baseline-threshold skipping, top-window export (groups ``all``/``best``/
``worst``/``most_influential`` with identical filenames and JSON schemas),
checkpointing, results JSON/CSV and per-file stats.

The hot loop is re-architected: instead of one invert→predict round trip per
patch/mask (reference :665-703 / :766-791), all patches are evaluated by the
``PerturbationEngine`` in fixed-size compiled chunks, and RISE masks are
generated and reduced entirely on device.
"""

from __future__ import annotations

import os
import time
from datetime import datetime
from pathlib import Path
from typing import Any, Dict, List, NamedTuple, Optional

import jax
import numpy as np
import pandas as pd

from adx_tpu.io.audio_io import load_audio, write_wav
from adx_tpu.io.results import append_update_results
from adx_tpu.io.results import importance_type as _importance_type
from adx_tpu.ops.masks import occlusion_patch_grid
from adx_tpu.parallel.host_shard import host_shard
from adx_tpu.runtime.checkpoint import SpectrogramCheckpoint
from adx_tpu.runtime.engine import PerturbationEngine, cached_engine
from adx_tpu.runtime.profiler import TimeAggregator, timed
from adx_tpu.viz.saliency import visualize_spectrogram_saliency


class OcclusionResult(NamedTuple):
    importance_map: Optional[np.ndarray]
    spectrogram_db: np.ndarray
    baseline_pred: float
    y: np.ndarray
    S: Any  # device-resident spectrogram handle (complex stays on device)
    patch_importances: Optional[List[dict]]


class RiseResult(NamedTuple):
    importance_map: Optional[np.ndarray]
    spectrogram_db: np.ndarray
    baseline_pred: float
    y: np.ndarray
    S: Any


def rise_normalize(imp, n_masks: int, mask_probability: float):
    """RISE map normalization: divide by the expected per-cell mask count,
    then min-max to [0, 1] (reference:
    src/spectrogram_explainability.py:795-801; parity-tested against the
    exec'd reference lines in tests/test_reference_parity.py)."""
    importance_map = imp / (n_masks * mask_probability + 1e-8)
    return (importance_map - importance_map.min()) / (
        importance_map.max() - importance_map.min() + 1e-8
    )


def per_file_stats(importance_map, baseline_pred) -> dict:
    """The per-file numeric stats of the results row (reference:
    src/spectrogram_explainability.py:904-916)."""
    return {
        "baseline_pred": float(baseline_pred),
        "mean_importance": float(importance_map.mean()),
        "max_importance": float(importance_map.max()),
        "min_importance": float(importance_map.min()),
        "std_importance": float(importance_map.std()),
        "p90_importance": float(np.percentile(importance_map, 90)),
        "p10_importance": float(np.percentile(importance_map, 10)),
    }


class SpectrogramExplainability:
    """Main class for spectrogram-based explainability experiments."""

    def __init__(
        self,
        predictor,
        sr: int = 44100,
        duration: int = 120,
        n_fft: int = 2048,
        hop_length: int = 512,
        win_length: int = 2048,
        n_mels: int = 128,
        n_iter: int = 256,
        spec_type: str = "mel",
        fmax: Optional[float] = None,
        top_n_windows: int = 5,
        method: str = "rise",
        use_original_audio: bool = True,
        patch_time_frames: int = 2048,
        stride_time_frames: int = 2048,
        patch_freq_percent: float = 25.0,
        stride_freq_percent: float = 25.0,
        n_masks: int = 500,
        mask_probability: float = 0.5,
        checkpoint_dir: Optional[str | Path] = None,
        highlight_percent: float = 20.0,
        abs_threshold: float = 0.0,
        engine: Optional[PerturbationEngine] = None,
        rng_seed: int = 0,
        gl_synth_dtype: str = "bfloat16",
        track_batch: Optional[int] = 4,
    ):
        self.predictor = predictor
        self.sr = sr
        self.duration = duration
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length
        self.n_mels = n_mels
        self.n_iter = n_iter
        self.top_n_windows = top_n_windows
        self.method = method.lower()

        self.spec_type = spec_type.lower()
        if self.spec_type not in ["mel", "stft"]:
            raise ValueError(f"Unsupported spec_type: {spec_type}. Use 'mel' or 'stft'.")
        self.fmax = fmax if fmax is not None else sr // 2

        self.patch_time_frames = patch_time_frames
        self.stride_time_frames = stride_time_frames
        self.patch_freq_percent = patch_freq_percent
        self.stride_freq_percent = stride_freq_percent
        self.use_original_audio = use_original_audio

        self.n_masks = n_masks
        self.mask_probability = mask_probability
        self.highlight_percent = highlight_percent
        self.abs_threshold = abs_threshold
        self.rng_seed = rng_seed

        self.checkpoint = SpectrogramCheckpoint(checkpoint_dir) if checkpoint_dir else None
        self.profiler = TimeAggregator()
        # files folded per batched analyze+baseline program in run_experiment
        # (None/1 = per-file dispatch); the sweep itself stays per-file
        self.track_batch = track_batch

        self.engine = engine or cached_engine(
            predictor, sr=sr, duration=duration, n_fft=n_fft,
            hop_length=hop_length, win_length=win_length, spec_type=self.spec_type,
            n_mels=n_mels, fmax=fmax, n_iter=n_iter, profiler=self.profiler,
            gl_synth_dtype=gl_synth_dtype,
        )

    # -- maps ---------------------------------------------------------------

    @timed("Computing occlusion map")
    def _compute_occlusion_map(
        self,
        audio_path: str,
        occlusion_value: float = 0.0,
        baseline_threshold: float = 0.3,
        verbose: bool = True,
        pre: Optional[tuple] = None,
    ) -> OcclusionResult:
        """``pre=(y, S, S_db, baseline)`` skips the per-file analyze dispatch
        — supplied by run_experiment's track-folded group precompute
        (``engine.analyze_and_baseline_multi``)."""
        if pre is not None:
            y, S, S_db, baseline_pred = pre
        else:
            y, _ = load_audio(audio_path, sr=self.sr, duration=self.duration, mono=True)
            # spectrogram + baseline fused into one program; S_db pulled to
            # host lazily (only the figures need it)
            S, S_db, baseline_pred = self.engine.analyze_and_baseline(y)
        if verbose:
            print(f"    Baseline prediction: {baseline_pred:.4f}")
        if baseline_pred < baseline_threshold:
            if verbose:
                print(f"    ⏭️  Baseline too low ({baseline_pred:.4f}), skipping...")
            return OcclusionResult(None, np.asarray(S_db), baseline_pred, y, S, None)

        n_freq, n_time = S_db.shape
        starts, patch_freq, t_patch = occlusion_patch_grid(
            n_freq, n_time, self.patch_time_frames, self.stride_time_frames,
            self.patch_freq_percent, self.stride_freq_percent,
        )
        if verbose:
            print(
                f"    Processing {len(starts)} patches "
                f"(t_patch={t_patch}, t_stride={self.stride_time_frames}, "
                f"f_patch≈{patch_freq} bins ({self.patch_freq_percent:.1f}%), "
                f"f_stride≈{max(1, int(round(self.stride_freq_percent / 100.0 * n_freq)))} bins "
                f"({self.stride_freq_percent:.1f}%))..."
            )

        probs = self.engine.occlusion_probs(
            S, starts, patch_freq, t_patch, occlusion_value, len(y)
        )
        importances = baseline_pred - probs

        # float32: importances are ~1e-2 scalars added ≤ a few times per
        # cell; the f64 slice-adds cost ~0.5 s per file on a 1-core host
        importance_map = np.zeros((n_freq, n_time), np.float32)
        count_map = np.zeros((n_freq, n_time), np.float32)
        patch_importances: List[dict] = []
        for (t_start, f_start), importance in zip(starts, importances):
            t_end = min(int(t_start) + t_patch, n_time)
            f_end = min(int(f_start) + patch_freq, n_freq)
            patch_importances.append(
                {
                    "t_start": int(t_start),
                    "t_end": int(t_end),
                    "f_start": int(f_start),
                    "f_end": int(f_end),
                    "importance": float(importance),
                }
            )
            importance_map[f_start:f_end, t_start:t_end] += importance
            count_map[f_start:f_end, t_start:t_end] += 1

        importance_map = importance_map / (count_map + 1e-8)
        if verbose:
            print(
                f"    ✅ Completed | Mean importance: {importance_map.mean():.4f}, "
                f"Max: {importance_map.max():.4f}"
            )
        return OcclusionResult(importance_map, np.asarray(S_db), baseline_pred, y, S, patch_importances)

    @timed("Computing RISE map")
    def _compute_rise_map(
        self, audio_path: str, baseline_threshold: float = 0.3,
        verbose: bool = True, pre: Optional[tuple] = None,
    ) -> RiseResult:
        if pre is not None:
            y, S, S_db, baseline_pred = pre
        else:
            y, _ = load_audio(audio_path, sr=self.sr, duration=self.duration, mono=True)
            S, S_db, baseline_pred = self.engine.analyze_and_baseline(y)
        if verbose:
            print(f"    Baseline prediction: {baseline_pred:.4f}")
        if baseline_pred < baseline_threshold:
            if verbose:
                print(f"    ⏭️  Baseline too low ({baseline_pred:.4f}), skipping...")
            return RiseResult(None, np.asarray(S_db), baseline_pred, y, S)

        n_freq, n_time = S_db.shape
        if verbose:
            print(f"    Processing {self.n_masks} random masks (RISE method)...")
            print(f"    Spectrogram shape: {n_freq} freq × {n_time} time")

        _, imp = self.engine.rise_map(
            S, self.n_masks, self.mask_probability, len(y),
            key=jax.random.key(self.rng_seed),
        )
        importance_map = rise_normalize(imp, self.n_masks, self.mask_probability)
        if verbose:
            print(
                f"    ✅ Completed | Mean importance: {importance_map.mean():.4f}, "
                f"Max: {importance_map.max():.4f}"
            )
        return RiseResult(importance_map, np.asarray(S_db), baseline_pred, y, S)

    # -- top-window export --------------------------------------------------

    def _save_windows_for_group(
        self,
        y: np.ndarray,
        S,
        patch_importances: List[dict],
        top_n: int,
        base_save_dir: Path,
        file_name: str,
        group_name: str,
        sort_reverse: bool,
        save_audio: bool = True,
    ):
        """Rank and export windows for one group; identical filenames and
        metadata JSON to the reference (src/spectrogram_explainability.py:
        413-513)."""
        import json

        save_dir = base_save_dir / group_name
        save_dir.mkdir(parents=True, exist_ok=True)

        sorted_patches = sorted(
            patch_importances, key=lambda p: abs(p["importance"]), reverse=sort_reverse
        )
        top_patches = sorted_patches[:top_n]

        metadata = {
            "file_name": file_name,
            "group": group_name,
            "top_n": int(len(top_patches)),
            "windows": [],
        }

        # batched inversion of the masked-S windows (when needed): sliced +
        # PCM16-quantized ON DEVICE — each row only keeps ~patch_t·hop of
        # the full-track resynthesis, and shipping the full [rows, n] f32
        # over the tunnel was ~20 s/file (sweep6 'Exporting top windows')
        inverted = None
        if not self.use_original_audio and save_audio and top_patches:
            pf = top_patches[0]["f_end"] - top_patches[0]["f_start"]
            pt = top_patches[0]["t_end"] - top_patches[0]["t_start"]
            uniform = all(
                (p["f_end"] - p["f_start"], p["t_end"] - p["t_start"]) == (pf, pt)
                for p in top_patches
            )
            if uniform:
                starts = np.asarray(
                    [(p["t_start"], p["f_start"]) for p in top_patches], np.int32
                )
                slice_starts = np.asarray(
                    [max(0, int(p["t_start"] * self.hop_length)) for p in top_patches],
                    np.int32,
                )
                inverted = self.engine.keep_patch_audio_pcm16_slices(
                    S, starts, pf, pt, len(y),
                    slice_starts, max(1, pt * self.hop_length),
                )

        for rank, p in enumerate(top_patches, 1):
            t_start, t_end = p["t_start"], p["t_end"]
            f_start, f_end = p["f_start"], p["f_end"]
            importance = float(p["importance"])
            abs_importance = float(abs(importance))

            window_frames = t_end - t_start
            window_samples = max(1, window_frames * self.hop_length)

            y_window = None
            if self.use_original_audio:
                start_sample = int(t_start * self.hop_length)
                end_sample = min(int(start_sample + window_samples), len(y))
                y_window = y[start_sample:end_sample]
                if len(y_window) < window_samples:
                    y_window = np.pad(y_window, (0, window_samples - len(y_window)))
            elif save_audio:
                start_sample = max(0, int(t_start * self.hop_length))
                end_sample = min(int(start_sample + window_samples), len(y))
                keep = max(0, end_sample - start_sample)
                if inverted is not None:
                    # device rows are [slice_len] int16 starting at this
                    # window's start_sample; trim the zero tail past len(y)
                    y_window = inverted[rank - 1][:keep]
                else:
                    # non-uniform window (clamped edge patch): same device
                    # slice+quantize path, one row
                    y_window = self.engine.keep_patch_audio_pcm16_slices(
                        S,
                        np.asarray([(t_start, f_start)], np.int32),
                        f_end - f_start,
                        t_end - t_start,
                        len(y),
                        np.asarray([start_sample], np.int32),
                        int(window_samples),
                    )[0][:keep]

            importance_type = _importance_type(importance)
            if save_audio and y_window is not None:
                out_path = save_dir / (
                    f"{file_name}__{group_name}{rank}_patch_{importance_type}_"
                    f"{abs_importance:.3f}_t{t_start}-{t_end}_f{f_start}-{f_end}.wav"
                )
                write_wav(out_path, y_window, self.sr)

            metadata["windows"].append(
                {
                    "rank": int(rank),
                    "t_start": int(t_start),
                    "t_end": int(t_end),
                    "f_start": int(f_start),
                    "f_end": int(f_end),
                    "start_time_sec": float(t_start * self.hop_length / self.sr),
                    "end_time_sec": float(t_end * self.hop_length / self.sr),
                    "importance": importance,
                    "abs_importance": abs_importance,
                    "type": importance_type,
                }
            )

        meta_path = save_dir / f"{file_name}__{group_name}_occlusion_patches_from_list.json"
        with open(meta_path, "w", encoding="utf-8") as f:
            json.dump(metadata, f, indent=2, ensure_ascii=False)

    def _save_top_occlusion_patches_from_list(
        self,
        y: np.ndarray,
        S,
        patch_importances: List[dict],
        top_n: int,
        save_dir: Path | str,
        file_name: str,
    ):
        """Groups: all (metadata only), best, worst, most_influential
        (reference: src/spectrogram_explainability.py:515-587)."""
        base_save_dir = Path(save_dir)
        base_save_dir.mkdir(parents=True, exist_ok=True)

        self._save_windows_for_group(
            y, S, patch_importances, len(patch_importances), base_save_dir,
            file_name, "all", sort_reverse=True, save_audio=False,
        )
        self._save_windows_for_group(
            y, S, patch_importances, top_n, base_save_dir, file_name,
            "best", sort_reverse=True, save_audio=True,
        )
        self._save_windows_for_group(
            y, S, patch_importances, top_n, base_save_dir, file_name,
            "worst", sort_reverse=False, save_audio=True,
        )
        positives = [p for p in patch_importances if p["importance"] > 0]
        negatives = [p for p in patch_importances if p["importance"] < 0]
        top_pos = sorted(positives, key=lambda p: p["importance"], reverse=True)[:top_n]
        top_neg = sorted(negatives, key=lambda p: p["importance"])[:top_n]
        most_influential = top_pos + top_neg
        self._save_windows_for_group(
            y, S, most_influential, len(most_influential), base_save_dir,
            file_name, "most_influential", sort_reverse=False, save_audio=True,
        )

    # -- per-file / experiment drivers --------------------------------------

    def process_audio_file(
        self,
        audio_path: str,
        output_dir: Path,
        baseline_threshold: float = 0.3,
        folder_name: str = "",
        precomputed: Optional[tuple] = None,
    ) -> Optional[Dict[str, Any]]:
        """``precomputed=(y, S, S_db, baseline)`` comes from run_experiment's
        track-folded analyze precompute; only trusted on the first attempt."""
        if self.profiler:
            self.profiler.reset_sample()
            # the engine is shared process-wide (cached_engine); reclaim its
            # profiler in case another explainer was constructed since
            self.engine.profiler = self.profiler
        file_name = Path(audio_path).stem

        if self.checkpoint:
            processed = self.checkpoint.load_processed_files()
            if str(audio_path) in processed:
                print("    ⏭️  Already processed, skipping...")
                return None

        if self.method == "rise":
            result = self._compute_rise_map(
                audio_path, baseline_threshold, verbose=True, pre=precomputed
            )
        else:
            result = self._compute_occlusion_map(
                audio_path, baseline_threshold=baseline_threshold, verbose=True,
                pre=precomputed,
            )

        if result.importance_map is None:
            if self.checkpoint:
                self.checkpoint.mark_as_processed(str(audio_path))
            return None

        model_output_dir = Path(output_dir) / folder_name if folder_name else Path(output_dir)
        track_output_dir = model_output_dir / file_name
        track_output_dir.mkdir(parents=True, exist_ok=True)

        output_path = track_output_dir / f"saliency_{file_name}.png"
        method_name = "RISE" if self.method == "rise" else "Occlusion"
        _t_render = time.time()
        visualize_spectrogram_saliency(
            importance_map=result.importance_map,
            spectrogram_db=result.spectrogram_db,
            output_path=str(output_path),
            title=f"{file_name} | {method_name} | Pred: {result.baseline_pred:.3f}",
            sr=self.sr,
            # the reference omits hop_length here, silently mislabeling the
            # time axis for any non-default hop — deviate where broken
            hop_length=self.hop_length,
            highlight_percent=self.highlight_percent,
            abs_threshold=self.abs_threshold,
            spec_type=self.spec_type,
        )
        if self.profiler:
            self.profiler.record("Rendering saliency figure", time.time() - _t_render)

        if self.method == "occlusion" and result.patch_importances is not None:
            windows_dir = track_output_dir / "top_windows"
            windows_dir.mkdir(exist_ok=True)
            _t_win = time.time()
            self._save_top_occlusion_patches_from_list(
                y=result.y,
                S=result.S,
                patch_importances=result.patch_importances,
                top_n=self.top_n_windows,
                save_dir=windows_dir,
                file_name=file_name,
            )
            if self.profiler:
                self.profiler.record("Exporting top windows", time.time() - _t_win)

        if self.checkpoint:
            self.checkpoint.mark_as_processed(str(audio_path))
        if self.profiler:
            self.profiler.print_sample_summary()

        return {
            "file_path": str(audio_path),
            "file_name": file_name,
            "folder": folder_name,
            "method": self.method,
            **per_file_stats(result.importance_map, result.baseline_pred),
        }

    def _precompute_group(self, audio_paths) -> Dict[str, tuple]:
        """Fold several files' analyze+baseline into batched device programs
        (``engine.analyze_and_baseline_multi``) — the underfilled stage of
        the sweep (the occlusion/RISE sweep itself already saturates the
        chip; VERDICT r3 item 2 / explain_tracks A/B: analyze 2.9×).
        Returns ``{path: (y, S_row, S_db_row, baseline)}``; groups form per
        waveform length, failures fall back to the serial per-file path."""
        loaded: Dict[str, "np.ndarray"] = {}
        for p in audio_paths:
            try:
                y, _ = load_audio(p, sr=self.sr, duration=self.duration, mono=True)
                loaded[str(p)] = y
            except Exception as e:  # noqa: BLE001 — serial loop retries it
                print(f"    ⚠️ group precompute: failed to load {p} "
                      f"({type(e).__name__}: {e}); it will run serially")
        from adx_tpu.batching import equal_length_chunks

        out: Dict[str, tuple] = {}
        tb = max(1, int(self.track_batch or 1))
        for sel in equal_length_chunks(loaded, tb):
            # singleton tails still go through the (B=1) multi program,
            # NOT the serial analyze path: the vmapped and serial
            # programs differ by the documented multi-program reduction
            # noise, so a tail file's numerics must not change just
            # because an unrelated file joins its group (same
            # consistency rule as extract_all_features_batch B=1)
            try:
                S_m, S_db_m, base_m = self.engine.analyze_and_baseline_multi(
                    [loaded[p] for p in sel], track_batch=tb
                )
            except KeyboardInterrupt:
                raise
            except Exception as e:  # noqa: BLE001 — serial loop retries sel
                # contain the failure to THIS equal-length chunk: earlier
                # chunks' batched results must survive (their numerics come
                # from the multi program and must not silently re-run
                # through the serial path just because an unrelated chunk
                # hit a transient error — same rule as _precompute_lime_group)
                print(f"    ⚠️ group precompute: analyze failed for "
                      f"{len(sel)} file(s) ({type(e).__name__}: {e}); "
                      f"they will run serially")
                continue
            for k, p in enumerate(sel):
                out[p] = (loaded[p], S_m[k], S_db_m[k], float(base_m[k]))
        return out

    def run_experiment(
        self,
        base_path: str | Path,
        output_dir: str | Path,
        models_to_process: Optional[list] = None,
        max_samples_per_model: Optional[int] = None,
        baseline_threshold: float = 0.3,
        resume: bool = True,
        results_path: Optional[str | Path] = None,
        shard_index: int = 0,
        num_shards: int = 1,
    ) -> pd.DataFrame:
        base_path = Path(base_path)
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        if results_path is None:
            results_path = output_dir / "spectrogram_explainability_results.json"
        results_path = Path(results_path)

        saliency_dir = output_dir / "saliency_maps"
        saliency_dir.mkdir(parents=True, exist_ok=True)

        print("\n" + "=" * 70)
        print("🔬 Spectrogram Occlusion Explainability Experiment")
        print("=" * 70)
        print(f"📁 Dataset: {base_path}")
        print(f"📊 Output: {output_dir}")
        print(f"🗺️  Saliency maps: {saliency_dir}")
        print(f"🔧 Method: {self.method.upper()}")
        print(f"💾 Checkpoint: {'Enabled' if self.checkpoint else 'Disabled'}")
        print("=" * 70 + "\n")

        tmp_file = output_dir / "spectrogram_results_progress.csv"
        prev_results = []
        if os.path.exists(tmp_file):
            prev_results = pd.read_csv(tmp_file).to_dict("records")
        results = prev_results
        tmp_save_freq = 1

        try:
            for folder in sorted(base_path.iterdir()):
                if not folder.is_dir():
                    continue
                if models_to_process and folder.name not in models_to_process:
                    continue
                print(f"\n📁 Processing folder: {folder.name}")
                audio_files = sorted(list(folder.glob("*.mp3")) + list(folder.glob("*.wav")))
                if max_samples_per_model:
                    audio_files = audio_files[:max_samples_per_model]
                if num_shards > 1:
                    # track-level DP across hosts (SURVEY §2.6(c))
                    audio_files = host_shard(audio_files, shard_index, num_shards)
                    print(f"   Shard {shard_index}/{num_shards}: {len(audio_files)} files")
                print(f"   Found {len(audio_files)} files")

                # track-folded analyze+baseline, JUST-IN-TIME per
                # track_batch group: an upfront whole-folder precompute
                # would pin every file's device-resident S/S_db (~127 MB
                # per 120 s file) for the whole sweep — linear HBM growth
                # and a v5e crash at ~50 files. Entries pop as consumed.
                pre: Dict[str, tuple] = {}
                groups: Dict[str, list] = {}
                if self.track_batch and int(self.track_batch) > 1:
                    todo_paths = [str(f) for f in audio_files]
                    if self.checkpoint:
                        done = self.checkpoint.load_processed_files()
                        todo_paths = [p for p in todo_paths if p not in done]
                    tb = int(self.track_batch)
                    for j in range(0, len(todo_paths), tb):
                        g = todo_paths[j : j + tb]
                        for p in g:
                            groups[p] = g

                for idx, audio_file in enumerate(audio_files, 1):
                    print(f"\n  🎵 [{idx}/{len(audio_files)}] {audio_file.name}")
                    key = str(audio_file)
                    if key not in pre and key in groups:
                        try:
                            pre.update(self._precompute_group(groups[key]))
                        except KeyboardInterrupt:
                            raise
                        except Exception as e:  # noqa: BLE001 — serial fallback
                            print(f"   ⚠️ group precompute failed "
                                  f"({type(e).__name__}: {e}); running serially")
                        for p in groups[key]:
                            groups.pop(p, None)
                    try:
                        result = self.process_audio_file(
                            audio_path=key,
                            output_dir=saliency_dir,
                            baseline_threshold=baseline_threshold,
                            folder_name=folder.name,
                            precomputed=pre.pop(key, None),
                        )
                    except KeyboardInterrupt:
                        raise
                    except Exception as e:  # noqa: BLE001 — per-file
                        # reference resilience (spectrogram_explainability
                        # .py:355-361 swallows predictor crashes and moves
                        # on): one transient tunnel/backend failure must
                        # not abort the remaining dataset sweep — the file
                        # stays unmarked, so a resumed run retries it
                        print(f"    ❌ Error processing {audio_file.name}: "
                              f"{e} — skipping (resume will retry)")
                        result = None
                    if result:
                        results.append(result)
                        if results_path:
                            append_update_results(
                                {result["folder"]: {result["file_name"]: result}},
                                results_path,
                            )
                        if len(results) % tmp_save_freq == 0:
                            pd.DataFrame(results).to_csv(tmp_file, index=False)
                            print(f"🔄 Auto-saved progress to {tmp_file}")

            if not results:
                print("\n⚠️  No results to save!")
                return pd.DataFrame()

            df = pd.DataFrame(results)
            csv_path = output_dir / f"spectrogram_results_{datetime.now().strftime('%Y%m%d_%H%M%S')}.csv"
            df.to_csv(csv_path, index=False)

            print("\n" + "=" * 70)
            print("✅ Experiment completed!")
            print("=" * 70)
            print(f"📊 Processed files: {len(df)}")
            print(f"📄 Results saved: {csv_path}")
            print(f"🗺️  Saliency maps: {saliency_dir}")
            print("=" * 70 + "\n")
            if self.profiler:
                self.profiler.print_global_summary()
            return df

        except Exception as e:
            print(f"\n\n❌ Critical error: {type(e).__name__}: {e}")
            import traceback

            traceback.print_exc()
            if results:
                pd.DataFrame(results).to_csv(tmp_file, index=False)
                print(f"⚠️  Crash! Progress auto-saved to {tmp_file}")
            raise
