"""Frequency Band Perturbation (FBP) explainer — batched TPU engine.

Capability-equivalent to the reference's ``FrequencyBandPerturbation``
(src/dsp_band_ops.py:303-1133): same constructor surface, band presets,
transition math, output tree (``bands/<model>/<track>/<component>/``),
metadata JSON schema, saliency PNGs, results JSON/CSV, and checkpoint
semantics. The hot loop is re-architected: the reference runs one
mask→ISTFT→forward round trip per band serially (src/dsp_band_ops.py:
573-653); here all bands become one ``[B, F]`` gain matrix evaluated by a
single compiled mask→batched-ISTFT→batched-forward program on the device
mesh (``PerturbationEngine.fbp_probs``).
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from datetime import datetime
from pathlib import Path
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import numpy as np
import pandas as pd

from adx_tpu.io.audio_io import load_audio, write_wav
from adx_tpu.io.results import append_update_results
from adx_tpu.io.results import importance_type as _importance_type
from adx_tpu.ops.masks import band_gain_matrix
from adx_tpu.ops.mel import fft_frequencies
from adx_tpu.parallel.host_shard import host_shard
from adx_tpu.runtime.checkpoint import ExperimentCheckpoint
from adx_tpu.runtime.engine import PerturbationEngine, cached_engine
from adx_tpu.runtime.profiler import TimeAggregator, timed
from adx_tpu.viz.saliency import (
    visualize_fbp_saliency,
    visualize_file_bands,
    visualize_orig_vs_masked_spectrogram,
)

# Preset frequency bands in Hz (reference: src/dsp_band_ops.py:212-226)
FREQUENCY_BAND_PRESETS: Dict[str, List[Tuple[int, int]]] = {
    "default": [
        (20, 100), (100, 250), (250, 2000),
        (2000, 4000), (4000, 8000), (8000, 16000),
    ],
    "detailed_voice": [
        (20, 60), (60, 250), (250, 500), (500, 2000),
        (2000, 4000), (4000, 6000), (6000, 12000), (12000, 21000),
    ],
    "high_resolution": [
        (20, 60), (60, 100), (100, 250), (250, 500), (500, 1000), (1000, 2000),
        (2000, 4000), (4000, 6000), (6000, 8000), (8000, 10000), (10000, 12000),
        (12000, 16000), (16000, 21000),
    ],
}


class FBDResult(NamedTuple):
    importance_map: Optional[np.ndarray]
    spectrogram_db: np.ndarray
    baseline_pred: float
    y: np.ndarray
    batch_importances: Optional[List[dict]]
    component: str


class FrequencyBandPerturbation:
    def __init__(
        self,
        predictor,
        preset: str = "default",
        presets: Optional[Dict[str, List[Tuple[int, int]]]] = None,
        attenuation: float = 0.0,
        transition_mode: str = "rel",
        transition_hz: float = 0.0,
        transition_rel: float = 0.0,
        transition_min_hz: float = 0.0,
        transition_max_hz: float = 0.0,
        sr: int = 44100,
        duration: int = 120,
        n_mels: int = 128,
        n_fft: int = 2048,
        hop_length: int = 512,
        win_length: int = 2048,
        n_iter: int = 256,
        spec_type: str = "stft",
        fmax: Optional[float] = None,
        use_original_audio: bool = False,
        use_separation: bool = False,
        separation_model: str = "spleeter:2stems",
        separation_targets: Tuple[str, ...] = ("vocals0", "accompaniment0"),
        normalize_loudness: bool = True,
        lufs: Optional[float] = None,
        checkpoint_dir: Optional[str | Path] = None,
        save_perturbed_audio_only: bool = False,
        save_reversed_perturbed_audio_only: bool = False,
        engine: Optional[PerturbationEngine] = None,
        track_batch: Optional[int] = None,
    ):
        self.predictor = predictor
        self.preset = preset
        self.presets = presets
        if self.presets is not None:
            self.bands = self.presets.get(self.preset, FREQUENCY_BAND_PRESETS["default"])
        else:
            self.bands = FREQUENCY_BAND_PRESETS.get(self.preset, FREQUENCY_BAND_PRESETS["default"])

        self.attenuation = attenuation
        self.transition_mode = transition_mode
        self.transition_hz = transition_hz
        self.transition_rel = transition_rel
        self.transition_min_hz = transition_min_hz
        self.transition_max_hz = transition_max_hz

        self.sr = sr
        self.duration = duration
        self.n_mels = n_mels
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length
        self.n_iter = n_iter

        self.spec_type = spec_type.lower()
        if self.spec_type not in ("stft",):
            raise ValueError("FrequencyBandPerturbation currently supports only spec_type='stft'")

        self.fmax = fmax if fmax is not None else sr // 2
        self.use_original_audio = use_original_audio
        self.use_separation = use_separation
        self.separation_model = separation_model
        self.separation_targets = separation_targets
        self.normalize_loudness = normalize_loudness
        self.lufs = lufs

        self.profiler = TimeAggregator()
        self.checkpoint = ExperimentCheckpoint(checkpoint_dir) if checkpoint_dir else None

        self.save_perturbed_audio_only = save_perturbed_audio_only
        self.save_reversed_perturbed_audio_only = save_reversed_perturbed_audio_only
        # fold this many files' (file, component) signals into each batched
        # device program (engine *_multi paths); None/1 = per-file dispatch
        self.track_batch = track_batch

        if predictor is None and engine is None:
            # host-side-only instance (--visualize-only): aggregate plotting
            # (visualize_results / expand_band_level_results) needs no chip,
            # and building an engine here would pay the minutes-long TPU
            # boot — or fail outright during a tunnel outage — for pure
            # matplotlib work. Any compute method will fail loudly on None.
            self.engine = None
        else:
            self.engine = engine or cached_engine(
                predictor, sr=sr, duration=duration, n_fft=n_fft,
                hop_length=hop_length, win_length=win_length, spec_type=self.spec_type,
                n_mels=n_mels, fmax=fmax, n_iter=n_iter, profiler=self.profiler,
            )

        # precomputed mask matrices (band order == self.bands order).
        # band_gain_matrix returns a jax array, so np.asarray is a D2H that
        # initializes the backend — skipped in host-side-only mode, where it
        # would stall behind another process's TPU grant (or a tunnel
        # outage) for work that never uses the gains.
        if self.engine is None:
            self._freqs = None
            self._gains = None
        else:
            self._freqs = fft_frequencies(sr=sr, n_fft=n_fft)
            self._gains = np.asarray(
                band_gain_matrix(
                    self._freqs, self.bands, attenuation=self.attenuation,
                    transition_mode=self.transition_mode, transition_hz=self.transition_hz,
                    transition_rel=self.transition_rel,
                    transition_min_hz=self.transition_min_hz,
                    transition_max_hz=self.transition_max_hz,
                )
            )

    def _require_engine(self) -> None:
        """Fail loudly when a host-only instance hits a compute path.

        ``predictor=None`` deliberately builds a visualization-only instance
        (no TPU boot for pure matplotlib work); without this guard a later
        explain/synthesize call died with an opaque ``AttributeError`` on
        ``None.fbp_probs``."""
        if self.engine is None:
            raise RuntimeError(
                "host-only FrequencyBandPerturbation (predictor=None) — only "
                "visualization methods (visualize_results / "
                "expand_band_level_results) are available; pass a predictor "
                "or engine for compute paths"
            )

    # -- separation hook ----------------------------------------------------

    @timed("Separating sources")
    def _separate_sources(self, audio: np.ndarray) -> Dict[str, np.ndarray]:
        """Optional source separation; graceful mixture fallback
        (reference: src/dsp_band_ops.py:447-463)."""
        if not self.use_separation:
            return {"mixture": audio}
        try:
            from adx_tpu.explainers.separation import separate

            return separate(audio, self.sr, model_name=self.separation_model)
        except Exception as e:  # noqa: BLE001 — mixture fallback by contract
            print(f"[Warning] Separation unavailable ({type(e).__name__}: {e}), falling back to mixture.")
            return {"mixture": audio}

    # -- core ---------------------------------------------------------------

    @timed("Computing importance for single component")
    def _compute_component_importance(
        self,
        sig: np.ndarray,
        component_name: str,
        audio_path: str,
        audio_root: Optional[Path] = None,
        file_name: Optional[str] = None,
        pre: Optional[tuple] = None,
    ) -> Optional[FBDResult]:
        """All bands of one component in a single batched program.

        ``pre=(S, S_db, orig_prob, probs)`` skips the device dispatches —
        used by the multi-track grouped path, which computed them in
        batched programs across several files' components."""
        self._require_engine()
        eng = self.engine
        if pre is not None:
            S, S_db, orig_prob, probs = pre
        else:
            # spectrogram + baseline forward fused into one program; S and
            # S_db stay device-resident (S_db only pulled for the figures)
            S, S_db, orig_prob = eng.analyze_and_baseline(sig)
            probs = eng.fbp_probs(S, sig, self._gains, self.normalize_loudness)
        deltas = [float(orig_prob - p) for p in probs]

        batch_importances: List[dict] = []
        importance_map = np.zeros(S_db.shape, dtype=float)
        for (low, high), delta in zip(self.bands, deltas):
            batch_importances.append(
                {
                    "component": component_name,
                    "low": float(low),
                    "high": float(high),
                    "importance": float(delta),
                }
            )
            band_mask = (self._freqs >= low) & (self._freqs <= high)
            importance_map[band_mask, :] += delta

        if (self.save_perturbed_audio_only or self.save_reversed_perturbed_audio_only) and audio_root is not None:
            self._export_band_audio(
                S, sig, deltas, component_name, audio_root, file_name, np.asarray(S_db)
            )
            print(
                f"\n[Audio saved only mode] Completed importance computation for "
                f"{component_name} of {audio_path} without returning results."
            )
            return None

        return FBDResult(
            importance_map=importance_map,
            spectrogram_db=np.asarray(S_db),
            baseline_pred=orig_prob,
            y=sig,
            batch_importances=batch_importances,
            component=component_name,
        )

    def _export_band_audio(self, S, sig, deltas, component_name, audio_root, file_name, S_db):
        """Save band-isolated (separated) or band-removed (reversed) WAVs,
        filenames bit-matching the reference (src/dsp_band_ops.py:608-641)."""
        comp_dir = Path(audio_root) / component_name
        if self.save_perturbed_audio_only:
            separated_dir = comp_dir / "separated_bands"
        else:
            separated_dir = comp_dir / "reversed_separated_bands"
        audio_dir = separated_dir / "freq_batches"
        audio_dir.mkdir(parents=True, exist_ok=True)

        # the sweep's precomputed gain matrix IS the per-band keep mask
        # (band_gain_matrix row b == keep_b + att·(1−keep_b), same params)
        # — re-deriving it here duplicated the formula and risked drift
        # between the exported audio and the deltas in the filenames
        rows = (1.0 - self._gains if self.save_perturbed_audio_only
                else self._gains)

        # synthesis + peak-normalization + int16 quantization all on device:
        # the f32 [B, 5.3M] batch was 127 MB of ~15 MB/s tunnel D2H per
        # file. (The RMS match under normalize_loudness cancels exactly in
        # the subsequent per-band peak normalization — same samples out.)
        y_batch = self.engine.synthesize_masked_pcm16(S, rows, n_out=len(sig))
        masked_dbs = self.engine.masked_db(S, rows)

        for (low, high), delta, y_out, Sdb_masked in zip(self.bands, deltas, y_batch, masked_dbs):
            importance_type = _importance_type(delta)
            out_name = (
                f"{file_name}__{component_name}__{int(low)}-{int(high)}Hz_"
                f"{importance_type}_{delta:+.3f}.wav"
            )
            write_wav(audio_dir / out_name, y_out, self.sr)
            visualize_orig_vs_masked_spectrogram(
                S_db, Sdb_masked, file_name, separated_dir, component_name,
                low, high, delta, sr=self.sr, hop_length=self.hop_length,
            )

    def _save_frequency_band_importances(
        self, batch_importances: List[dict], file_name: str, save_dir: Path
    ):
        """Band metadata JSON (reference schema, src/dsp_band_ops.py:476-527)."""
        import json

        save_dir.mkdir(parents=True, exist_ok=True)
        metadata = {"file_name": file_name, "bands": []}
        for p in batch_importances:
            importance = p["importance"]
            importance_type = _importance_type(importance)
            metadata["bands"].append(
                {
                    "component": p.get("component", "mixture"),
                    "low": p["low"],
                    "high": p["high"],
                    "importance": importance,
                    "abs_importance": abs(importance),
                    "type": importance_type,
                }
            )
        with open(save_dir / f"{file_name}_bands_metadata.json", "w", encoding="utf-8") as f:
            json.dump(metadata, f, indent=2, ensure_ascii=False)

    def _precompute_group(self, audio_paths: List[str]) -> Dict[str, Dict[str, tuple]]:
        """Fold several files' (file, component) signals into batched device
        programs (engine ``*_multi``): ONE analyze+baseline dispatch and a
        track-grouped band sweep for the whole group, instead of two
        dispatches per component. Returns
        ``{path: {component: (sig, S, S_db, baseline, band_probs)}}`` with
        S/S_db left device-resident (S_db is pulled per file at figure
        time, same D2H volume as the serial path)."""
        self._require_engine()
        eng = self.engine
        sigs: List[np.ndarray] = []
        owners: List[Tuple[str, str]] = []
        for p in audio_paths:
            y, _ = load_audio(p, sr=self.sr, duration=self.duration, mono=True)
            components = self._separate_sources(y)
            names = [nm for nm in components if nm in self.separation_targets]
            if not names:
                names = list(components.keys())
            for nm in names:
                sigs.append(components[nm])
                owners.append((p, nm))
        ys = eng.stack_waves(sigs)  # ship H2D once, reuse for both programs
        S_m, Sdb_m, base_m = eng.analyze_and_baseline_multi(ys)
        probs_m = eng.fbp_probs_multi(
            S_m, ys, self._gains, self.normalize_loudness,
            track_batch=self.track_batch,
        )
        out: Dict[str, Dict[str, tuple]] = {p: {} for p in audio_paths}
        for i, (p, nm) in enumerate(owners):
            out[p][nm] = (sigs[i], S_m[i], Sdb_m[i], float(base_m[i]), probs_m[i])
        return out

    @timed("Processing audio file")
    def process_audio_file(
        self,
        audio_path: str,
        output_dir: Path,
        folder_name: str = "",
        retry_on_error: bool = True,
        max_file_retries: int = 5,
        precomputed: Optional[Dict[str, tuple]] = None,
    ) -> Optional[Dict[str, Any]]:
        """``precomputed`` maps component name → ``(sig, S, S_db, prob,
        band_probs)`` from the grouped multi-track path; it is only trusted
        on the first attempt (retries recompute serially from the file)."""
        self._require_engine()
        if self.profiler:
            self.profiler.reset_sample()
            # the engine is shared process-wide (cached_engine); reclaim its
            # profiler in case another explainer was constructed since
            self.engine.profiler = self.profiler
        file_name = Path(audio_path).stem

        if self.checkpoint:
            processed = self.checkpoint.load_processed_files()
            if (
                str(audio_path) in processed
                and not self.save_perturbed_audio_only
                and not self.save_reversed_perturbed_audio_only
            ):
                print("    ⏭️  Already processed, skipping...")
                return None

        for file_attempt in range(max_file_retries):
            try:
                model_output_dir = Path(output_dir) / folder_name if folder_name else Path(output_dir)
                track_output_dir = model_output_dir / file_name
                track_output_dir.mkdir(parents=True, exist_ok=True)

                if precomputed is not None and file_attempt == 0:
                    components = {nm: tup[0] for nm, tup in precomputed.items()}
                    pres = {nm: tup[1:] for nm, tup in precomputed.items()}
                else:
                    y, _ = load_audio(audio_path, sr=self.sr, duration=self.duration, mono=True)
                    components = self._separate_sources(y)
                    pres = {}
                target_names = [nm for nm in components if nm in self.separation_targets]
                if not target_names:
                    target_names = list(components.keys())

                result_list: List[FBDResult] = []
                for name in target_names:
                    comp_result = self._compute_component_importance(
                        sig=components[name],
                        component_name=name,
                        pre=pres.get(name),
                        audio_path=audio_path,
                        audio_root=track_output_dir
                        if self.save_perturbed_audio_only or self.save_reversed_perturbed_audio_only
                        else None,
                        file_name=file_name,
                    )
                    if comp_result is not None:
                        result_list.append(comp_result)

                if self.save_perturbed_audio_only or self.save_reversed_perturbed_audio_only:
                    print(f"    💾 Saved perturbed audio for {audio_path} in {track_output_dir}")
                    return None

                if not result_list:
                    if self.checkpoint:
                        self.checkpoint.mark_as_processed(
                            audio_path, success=False, error_msg="No importance values computed"
                        )
                    return None

                comp_importance_maps: Dict[str, List[np.ndarray]] = defaultdict(list)
                comp_baselines: Dict[str, List[float]] = defaultdict(list)
                comp_bands: Dict[str, List[dict]] = defaultdict(list)

                for comp_result in result_list:
                    component = comp_result.component
                    comp_baselines[component].append(comp_result.baseline_pred)
                    comp_importance_maps[component].append(comp_result.importance_map)
                    comp_bands[component].extend(comp_result.batch_importances or [])

                    comp_output_dir = track_output_dir / component
                    comp_output_dir.mkdir(parents=True, exist_ok=True)
                    self._save_frequency_band_importances(
                        comp_result.batch_importances or [], file_name, comp_output_dir
                    )
                    _t_render = time.time()
                    visualize_fbp_saliency(
                        importance_map=comp_result.importance_map,
                        spectrogram_db=comp_result.spectrogram_db,
                        output_path=str(comp_output_dir / f"fbp_saliency_{file_name}.png"),
                        title=f"{file_name} | FBP | Pred: {comp_result.baseline_pred:.3f}",
                        sr=self.sr,
                        hop_length=self.hop_length,
                        highlight_percent=20.0,
                        abs_threshold=None,
                    )
                    if self.profiler:
                        self.profiler.record("Rendering saliency figure",
                                             time.time() - _t_render)

                all_batch_importances = [b for bands in comp_bands.values() for b in bands]
                visualize_file_bands(
                    bands=all_batch_importances,
                    file_name=file_name,
                    folder=folder_name,
                    output_dir=track_output_dir,
                )

                if self.checkpoint:
                    self.checkpoint.mark_as_processed(audio_path, success=True)
                if self.profiler:
                    self.profiler.print_sample_summary()

                components_summary = {}
                for comp, maps in comp_importance_maps.items():
                    imp_sum = np.sum(maps, axis=0)
                    components_summary[comp] = {
                        "baseline_pred_mean": float(np.mean(comp_baselines[comp])),
                        "mean_importance": float(imp_sum.mean()),
                        "max_importance": float(imp_sum.max()),
                        "min_importance": float(imp_sum.min()),
                        "std_importance": float(imp_sum.std()),
                    }

                global_map = np.sum(
                    [np.sum(maps, axis=0) for maps in comp_importance_maps.values()], axis=0
                )
                return {
                    "file_path": str(audio_path),
                    "file_name": file_name,
                    "folder": folder_name,
                    "components": components_summary,
                    "global_mean_importance": float(global_map.mean()),
                    "global_max_importance": float(global_map.max()),
                    "global_min_importance": float(global_map.min()),
                    "global_std_importance": float(global_map.std()),
                }

            except Exception as e:  # noqa: BLE001 — file-level retry by contract
                import traceback

                print("\n--- FULL TRACEBACK ---")
                traceback.print_exc()
                print("--- END TRACEBACK ---\n")
                error_msg = f"{type(e).__name__}: {str(e)}"
                print(f"[Error] Failed to process {audio_path}: {error_msg}")
                if file_attempt < max_file_retries - 1 and retry_on_error:
                    print(f"[Info] Retrying entire file (attempt {file_attempt + 2}/{max_file_retries})")
                    time.sleep(1.0)
                    continue
                if self.checkpoint:
                    self.checkpoint.mark_as_processed(audio_path, success=False, error_msg=error_msg)
                return None
        return None

    # -- experiment driver --------------------------------------------------

    def run_experiment(
        self,
        base_path: str | Path,
        output_dir: str | Path,
        models_to_process: Optional[list] = None,
        max_samples_per_model: Optional[int] = None,
        results_path: Optional[str | Path] = None,
        shard_index: int = 0,
        num_shards: int = 1,
    ) -> pd.DataFrame:
        base_path = Path(base_path)
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        if results_path is None:
            # Default casing matches reference src/dsp_band_ops.py:898; the CLI
            # runner (and the downstream vis loader) use lowercase
            # "fbp_results.json" and always pass results_path explicitly.
            results_path = output_dir / "FBP_results.json"
        results_path = Path(results_path)

        bands_dir = output_dir / "bands"
        bands_dir.mkdir(parents=True, exist_ok=True)

        print("\n" + "=" * 70)
        print("🔬 Frequency Band Perturbation Experiment")
        print("=" * 70)
        print(f"📁 Dataset: {base_path}")
        print(f"📊 Output: {output_dir}")
        print(f"🎛️  Bands: {bands_dir}")
        print(f"💾 Checkpoint: {'Enabled' if self.checkpoint else 'Disabled'}")

        tmp_file = output_dir / "FBP_results_progress.csv"
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
                    # track-level DP across hosts (SURVEY §2.6(c)): each host
                    # takes a disjoint round-robin slice of the capped list
                    audio_files = host_shard(audio_files, shard_index, num_shards)
                    print(f"   Shard {shard_index}/{num_shards}: {len(audio_files)} files")
                print(f"   Found {len(audio_files)} files")

                # clamp, don't just step-guard: a negative value made every
                # slice empty and the sweep exited "No results!" with no hint
                tb = max(1, int(self.track_batch or 1))
                groups = [
                    audio_files[lo : lo + tb]
                    for lo in range(0, len(audio_files), tb)
                ]
                idx = 0
                for grp in groups:
                    pre_map: Dict[str, Dict[str, tuple]] = {}
                    if tb > 1:
                        processed = (
                            self.checkpoint.load_processed_files()
                            if self.checkpoint else set()
                        )
                        audio_only = (
                            self.save_perturbed_audio_only
                            or self.save_reversed_perturbed_audio_only
                        )
                        todo = [
                            f for f in grp
                            if audio_only or str(f) not in processed
                        ]
                        if len(todo) > 1:
                            try:
                                pre_map = self._precompute_group(
                                    [str(f) for f in todo]
                                )
                            except Exception as e:  # noqa: BLE001 — serial fallback
                                print(
                                    f"[Warning] Grouped precompute failed "
                                    f"({type(e).__name__}: {e}); per-file fallback."
                                )
                    for audio_file in grp:
                        idx += 1
                        print(f"\n  🎵 [{idx}/{len(audio_files)}] {audio_file.name}")
                        result = self.process_audio_file(
                            audio_path=str(audio_file),
                            output_dir=bands_dir,
                            folder_name=folder.name,
                            retry_on_error=True,
                            max_file_retries=5,
                            precomputed=pre_map.get(str(audio_file)),
                        )
                        if self.save_perturbed_audio_only or self.save_reversed_perturbed_audio_only:
                            print(f"    [Audio saved only mode] Skipping result saving for {audio_file.name}")
                            continue
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

            if self.save_perturbed_audio_only or self.save_reversed_perturbed_audio_only:
                print("\n[Audio saved only mode] Experiment completed without computing final results.")
                return pd.DataFrame()
            if not results:
                print("\n⚠️  No results to return!")
                return pd.DataFrame()

            df = pd.DataFrame(results)
            csv_path = output_dir / f"fbp_results_{datetime.now().strftime('%Y%m%d_%H%M%S')}.csv"
            df.to_csv(csv_path, index=False)

            print("\n" + "=" * 70)
            print("✅ Experiment completed!")
            print("=" * 70)
            print(f"📊 Processed files: {len(df)}")
            print(f"📄 Results saved: {csv_path}")
            print(f"🎛️  Bands: {bands_dir}")
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

    # -- aggregate analysis -------------------------------------------------

    def expand_band_level_results(self, results_df: pd.DataFrame) -> pd.DataFrame:
        """Flatten per-file 'bands' lists into one row per band
        (reference: src/dsp_band_ops.py:1010-1032)."""
        rows = []
        for _, row in results_df.iterrows():
            bands = row.get("bands", None)
            if not bands:
                continue
            for b in bands:
                low, high = float(b["low"]), float(b["high"])
                rows.append(
                    {
                        "file_path": row["file_path"],
                        "file_name": row["file_name"],
                        "folder": row["folder"],
                        "component": b.get("component", "mixture"),
                        "low": low,
                        "high": high,
                        "band": f"{int(low)}-{int(high)}Hz",
                        "delta": float(b["importance"]),
                    }
                )
        return pd.DataFrame(rows) if rows else pd.DataFrame()

    def visualize_results(self, results_df: pd.DataFrame, output_dir: str | Path = "fbp_results") -> None:
        """Aggregate heatmaps / barplots / boxplots
        (reference: src/dsp_band_ops.py:1034-1104)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import seaborn as sns

        out = Path(output_dir)
        out.mkdir(parents=True, exist_ok=True)

        band_df = self.expand_band_level_results(results_df)
        if band_df.empty:
            print("⚠️ No bands data")
            return
        band_order = sorted(band_df["band"].unique(), key=lambda x: int(str(x).split("-")[0]))

        pivot_model_band = band_df.pivot_table(
            index="folder", columns="band", values="delta", aggfunc="mean"
        ).reindex(columns=band_order)
        plt.figure(figsize=(14, 8))
        sns.heatmap(
            pivot_model_band, annot=True, fmt=".3f", cmap="coolwarm", center=0,
            linewidths=0.5, cbar_kws={"label": "Mean Δ"},
        )
        plt.title("Average prediction change (Δ) per model and band", fontsize=14, fontweight="bold")
        plt.xlabel("Band (Hz)", fontsize=12)
        plt.ylabel("Model", fontsize=12)
        plt.tight_layout()
        plt.savefig(out / "heatmap_model_x_band.png", dpi=300, bbox_inches="tight")
        plt.close()

        pivot_comp_band = band_df.pivot_table(
            index="component", columns="band", values="delta", aggfunc="mean"
        ).reindex(columns=band_order)
        plt.figure(figsize=(12, 8))
        sns.heatmap(
            pivot_comp_band, annot=True, fmt=".3f", cmap="coolwarm", center=0,
            linewidths=0.5, cbar_kws={"label": "Mean Δ"},
        )
        plt.title("Average Δ per component and band", fontsize=14, fontweight="bold")
        plt.xlabel("Band (Hz)")
        plt.ylabel("Component")
        plt.tight_layout()
        plt.savefig(out / "heatmap_component_x_band.png", dpi=300, bbox_inches="tight")
        plt.close()

        band_df["abs_delta"] = band_df["delta"].abs()
        plt.figure(figsize=(14, 8))
        sns.barplot(data=band_df, x="folder", y="abs_delta", hue="band")
        plt.title("Average |Δ| per model and band")
        plt.xlabel("Model")
        plt.ylabel("|Prediction change|")
        plt.legend(title="Band (Hz)", bbox_to_anchor=(1.05, 1), loc="upper left")
        plt.tight_layout()
        plt.savefig(out / "all_bands_horizontal.png", dpi=300)
        plt.close()

        plt.figure(figsize=(16, 8))
        sns.boxplot(data=band_df, x="band", y="delta", hue="component")
        plt.title("Distribution of Δ per band and component", fontsize=14, fontweight="bold")
        plt.xticks(rotation=45)
        plt.legend(title="Component", bbox_to_anchor=(1.05, 1), loc="upper left")
        plt.tight_layout()
        plt.savefig(out / "boxplot_delta_per_band_component.png", dpi=300, bbox_inches="tight")
        plt.close()

        if "global_mean_importance" in results_df.columns:
            global_mean = results_df.groupby("folder")["global_mean_importance"].mean().sort_values()
            plt.figure(figsize=(10, 6))
            global_mean.plot(kind="bar", color="steelblue", alpha=0.8)
            plt.title("Average global importance per model")
            plt.ylabel("Global mean importance")
            plt.xticks(rotation=45)
            plt.grid(axis="y", alpha=0.3)
            plt.tight_layout()
            plt.savefig(out / "global_importance_per_model.png", dpi=300, bbox_inches="tight")
            plt.close()

        print(f"✅ {len(list(out.glob('*.png')))} plots save in {out}")
