"""AudioLIME experiment drivers.

Flow-, schema- and checkpoint-compatible with the reference's
``src/lime_explainer.py`` (explain_predictions_separate :303-482,
explain_predictions_segmented :131-218, run_lime_experiment_safe :484-673),
with the 500-recombination hot loop replaced by the batched engine and the
TF graph-scope retry machinery deleted (no TF in the process — the failure
class it worked around does not exist here, SURVEY.md §5.2).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from adx_tpu.explainers.audiolime import LimeAudioExplainer, SpleeterFactorization
from adx_tpu.io.audio_io import load_audio, write_wav
from adx_tpu.io.results import (
    append_update_explanations,
    load_existing_explanations,
    safe_stem,
)
from adx_tpu.parallel.host_shard import host_shard
from adx_tpu.predict import predict_batch_from_files
from adx_tpu.runtime.checkpoint import LIMEExperimentCheckpoint
from adx_tpu.runtime.engine import PerturbationEngine
from adx_tpu.viz.lime_viz import (
    plot_stacked_rms_area_components,
    plot_waveforms_overlay_with_influences,
)


def _get_engine(predictor, sr: int = 44100) -> Optional[PerturbationEngine]:
    """Batched engine for LocalSonics; None for remote predictors (their
    path falls back to predict_fn batching)."""
    if hasattr(predictor, "forward_device"):
        from adx_tpu.runtime.engine import cached_engine

        return cached_engine(predictor, sr=sr, duration=getattr(predictor.cfg.audio, "duration", 120.0))
    return None


def predict_fn_unified(waveforms, predictor):
    """Batch predict → [N, 2] (real, fake) (reference: src/lime_explainer.py:283-301)."""
    waveforms = np.asarray(waveforms)
    if waveforms.ndim == 1:
        waveforms = waveforms[np.newaxis, :]
    if hasattr(predictor, "predict_batch"):
        fake = np.asarray(predictor.predict_batch(waveforms, sr=44100))
    else:
        fake = np.asarray([predictor.predict(w, sr=44100) for w in waveforms])
    return np.stack([1.0 - fake, fake], axis=1)


def _precompute_lime_group(
    idxs,
    audio_files,
    model_time: float,
    engine: PerturbationEngine,
    num_samples_lime: int,
    separation_model: str,
    random_seed: int = 0,
    track_batch: int = 4,
    preloaded_waves: Optional[Dict[int, np.ndarray]] = None,
) -> Dict[int, tuple]:
    """Fold several tracks' LIME sweeps into batched device programs
    (``engine.stem_mix_probs_multi``) — the FBP ``_precompute_group``
    pattern applied to the LIME dataset walker (VERDICT r3 item 2).

    Returns ``{sample index: (waveform, factorization, design rows,
    probs)}``. The design rows come from the SAME
    ``lime_mask_batch(key(random_seed), …)`` draw the serial
    ``explain_instance`` makes, so per-track values match the serial path
    up to the documented multi-program bf16 reduction-order noise. Groups
    are formed per waveform length (a short tail file folds with its own
    length class). Any failure here falls back to the serial per-sample
    path — error containment stays per sample."""
    import jax
    import jax.numpy as jnp

    from adx_tpu.ops.masks import lime_mask_batch

    out: Dict[int, tuple] = {}
    loaded: Dict[int, tuple] = {}
    t_load = time.time()
    for i in idxs:
        try:
            if preloaded_waves is not None and i in preloaded_waves:
                # decoded once already, by the predictions phase (identical
                # load_audio parameters — see run_lime_experiment_safe)
                w = preloaded_waves[i]
            else:
                w, _ = load_audio(audio_files[i], sr=44100, mono=True,
                                  offset=0, duration=model_time)
            w = w[0] if w.ndim > 1 else w
            loaded[i] = w
        except Exception as e:  # noqa: BLE001 — the serial loop retries it
            print(f"⚠️ group precompute: failed to load sample {i+1} "
                  f"({type(e).__name__}: {e}); it will run serially")
    t_load = time.time() - t_load
    t_sep = t_sweep = 0.0
    from adx_tpu.batching import equal_length_chunks

    data = None
    for sel in equal_length_chunks(loaded, track_batch):
        # contain failures PER SUB-BATCH: a transient error in one
        # length class's sweep must not discard the sub-batches already
        # computed into `out` (the caller would re-separate and re-sweep
        # every track of the group serially)
        try:
            t0 = time.time()
            facts = []
            for i in sel:
                facts.append(SpleeterFactorization(
                    input=jnp.asarray(loaded[i]), target_sr=44100,
                    temporal_segmentation_params=1, composition_fn=None,
                    model_name=separation_model,
                ))
            if len({f.get_number_components() for f in facts}) != 1:
                continue  # heterogeneous stems — serial path handles
            n_comp = facts[0].get_number_components()
            if data is None or data.shape[1] != n_comp:
                data = lime_mask_batch(
                    jax.random.key(random_seed), num_samples_lime, n_comp
                )
            n = len(loaded[sel[0]])
            stems_stack = jnp.stack([
                jnp.stack([c[:n] for c in f.components]) for f in facts
            ])
            t_sep += time.time() - t0
            t0 = time.time()
            probs_list = engine.stem_mix_probs_multi(
                stems_stack, [np.asarray(data)] * len(sel),
                track_batch=track_batch,
            )
            t_sweep += time.time() - t0
            for i, fact, probs in zip(sel, facts, probs_list):
                out[i] = (loaded[i], fact, np.asarray(data),
                          np.asarray(probs))
        except Exception as e:  # noqa: BLE001 — serial loop retries sel
            print(f"⚠️ group precompute: sub-batch "
                  f"{[i + 1 for i in sel]} failed "
                  f"({type(e).__name__}: {e}); those samples run serially")
    print(f"⏱️ group precompute [{len(out)}/{len(idxs)} tracks]: "
          f"load {t_load:.1f}s, separate {t_sep:.1f}s, sweep {t_sweep:.1f}s")
    return out


def _lazy_lime_groups(eligible, track_batch: int) -> Dict[int, list]:
    """Order-chunked group assignment for the just-in-time precompute:
    sample index → its group's indices. Groups of ``track_batch`` in sweep
    order (sweeps crop to one duration, so order-chunking loses nothing);
    mixed lengths inside a chunk still fold per-length inside
    ``_precompute_lime_group``."""
    groups: Dict[int, list] = {}
    for j in range(0, len(eligible), track_batch):
        g = eligible[j : j + track_batch]
        for i in g:
            groups[i] = g
    return groups


def explain_predictions_separate(
    audio_files,
    predictor,
    model_time,
    max_samples=5,
    original_predictions=None,
    num_samples_lime=500,
    ids_to_explain=(0, 1, 2, 3, 4, 5, 6, 7, 8, 9),
    checkpoint: Optional[LIMEExperimentCheckpoint] = None,
    folder_name: str = "",
    explanations_path: Optional[str] = None,
    features_output_dir: Optional[str] = None,
    model_name: Optional[str] = None,
    engine: Optional[PerturbationEngine] = None,
    separation_model: str = "spleeter:4stems",
    track_batch: Optional[int] = 4,
    preloaded_waves: Optional[Dict[int, np.ndarray]] = None,
):
    """LIME-explain a set of audio files (full-track mode).

    ``preloaded_waves`` maps sample index → waveform already decoded with
    the SAME parameters this function would use (sr=44100, offset 0,
    duration=``model_time``) — the experiment driver passes the waves its
    predictions phase just decoded so each WAV is decoded once per run.

    ``track_batch`` > 1 folds that many tracks' stem-mix sweeps into
    batched device programs before the per-sample loop (the underfilled
    LIME stage measured 1.3×, analyze 2.9× in the explain_tracks A/B);
    ``track_batch=None``/1 keeps the serial per-file dispatch."""
    print(f"Starting explanation for {min(len(audio_files), max_samples)} samples...")

    n_samples = min(len(audio_files), max_samples)
    processed_samples = set()
    if checkpoint:
        processed_samples = checkpoint.load_processed_samples().get(folder_name, set())

    sample_info: Dict[str, dict] = {}
    if explanations_path and Path(explanations_path).exists():
        try:
            import json

            with open(explanations_path, "r", encoding="utf-8") as f:
                sample_info = json.load(f)
        except Exception:
            print(f"⚠️ Warning: Cannot load existing explanations from {explanations_path}")

    if engine is None:
        engine = _get_engine(predictor)

    # track-folded precompute, JUST-IN-TIME per track_batch group: an
    # upfront whole-folder precompute would pin every track's 4 device-
    # resident full-length stems (~85 MB per 120 s track) for the whole
    # sweep — linear HBM growth and a v5e crash at ~50 tracks. Entries pop
    # as consumed; any track missing from `pre` runs the serial path.
    pre: Dict[int, tuple] = {}
    groups: Dict[int, list] = {}
    if engine is not None and track_batch and int(track_batch) > 1:
        eligible = [
            i for i in range(n_samples)
            if i in ids_to_explain and i not in processed_samples
        ]
        # singletons included: a lone eligible file still folds through the
        # (B=1) multi program so its numerics don't depend on how many
        # unprocessed peers happen to share the folder (same consistency
        # rule as the occlusion precompute / extract_all_features_batch)
        if eligible:
            groups = _lazy_lime_groups(eligible, int(track_batch))

    for i in range(n_samples):
        if i not in ids_to_explain:
            continue
        if i in processed_samples:
            print(f"⏭️  Sample {i+1} already processed, skipping...")
            continue
        if i not in pre and i in groups:
            try:
                pre.update(_precompute_lime_group(
                    groups[i], audio_files, model_time, engine,
                    num_samples_lime, separation_model,
                    track_batch=int(track_batch),
                    preloaded_waves=preloaded_waves,
                ))
            except Exception as e:  # noqa: BLE001 — serial fallback
                print(f"⚠️ group precompute failed "
                      f"({type(e).__name__}: {e}); running serially")
            for j in groups[i]:
                groups.pop(j, None)
        print(f"\n🔍 Processing sample {i+1}/{n_samples}...")
        _t_sample = time.time()
        # Pop the precomputed entry BEFORE the try: a per-sample failure
        # below (e.g. a null model_prediction) must not strand the entry —
        # each one pins ~85 MB of device-resident stems, and leaking them
        # across a sweep is the linear HBM growth the just-in-time
        # precompute exists to avoid.
        pre_entry = pre.pop(i, None)
        try:
            fake_prob = None
            if original_predictions is not None and i < len(original_predictions):
                fake_prob = original_predictions[i]
            if fake_prob is not None:
                print(f"🔮 Model prediction: {fake_prob:.4f} ({'Fake' if fake_prob > 0.5 else 'Real'})")

            explainer = LimeAudioExplainer(kernel_width=0.25)
            if pre_entry is not None:
                waveform_mono, factorization, data, probs = pre_entry
                explanation = explainer.fit(
                    data, probs, factorization._components_names, top_labels=1
                )
            else:
                # decode AFTER the skip checks (a fully-checkpointed folder
                # used to decode every 120 s WAV up front only to skip them
                # all) and INSIDE the per-sample try: one truncated WAV must
                # not abort the remaining dataset, same contract as the
                # occlusion sweep
                if preloaded_waves is not None and i in preloaded_waves:
                    waveform = preloaded_waves[i]
                else:
                    waveform, _ = load_audio(
                        audio_files[i], sr=44100, mono=True, offset=0, duration=model_time
                    )
                waveform_mono = waveform[0] if waveform.ndim > 1 else waveform

                fact_input = waveform_mono
                if engine is not None:
                    # device-resident factorization: the 85 MB of stems feed
                    # the engine sweep directly instead of a D2H+H2D tunnel
                    # round trip
                    import jax.numpy as jnp

                    fact_input = jnp.asarray(waveform_mono)
                factorization = SpleeterFactorization(
                    input=fact_input,
                    target_sr=44100,
                    temporal_segmentation_params=1,
                    composition_fn=None,
                    model_name=separation_model,
                )
                explanation = explainer.explain_instance(
                    factorization=factorization,
                    predict_fn=lambda x: predict_fn_unified(x, predictor),
                    num_samples=num_samples_lime,
                    top_labels=1,
                    engine=engine,
                )
            weights = explanation.local_exp[explanation.top_labels[0]]
            influences = {
                component: weight[1]
                for component, weight in zip(factorization._components_names, weights)
            }
            predicted_class = None if fake_prob is None else ("Fake" if fake_prob > 0.5 else "Real")

            sample_key = safe_stem(audio_files[i])
            sample_info[sample_key] = {
                "file_path": str(audio_files[i]),
                "model_prediction": fake_prob,
                "predicted_class": predicted_class,
                "component_influences": influences,
            }
            safe_name = sample_key

            if features_output_dir:
                features_audio_output_dir = Path(features_output_dir or "") / folder_name / safe_name
                features_audio_output_dir.mkdir(parents=True, exist_ok=True)
                components_host = [np.asarray(c) for c in factorization.components]
                plot_waveforms_overlay_with_influences(
                    original_audio=waveform_mono,
                    components=components_host,
                    component_names=factorization._components_names,
                    influences=influences,
                    sr=44100,
                    output_path=features_audio_output_dir,
                    prefix=safe_name,
                )
                plot_stacked_rms_area_components(
                    components=components_host,
                    component_names=factorization._components_names,
                    influences=influences,
                    sr=44100,
                    output_path=features_audio_output_dir,
                    prefix=safe_name,
                )

            print(f"✅ Finished processing sample {i+1} "
                  f"({time.time() - _t_sample:.1f}s).")
            print("📊 Components influence:")
            for component, weight in influences.items():
                print(f"  {component}: {weight:.4f}")

            if explanations_path and model_name:
                new_explanations = {
                    model_name: {
                        safe_name: {
                            "track_id": i,
                            "type": "full_track",
                            "segment_id": None,
                            "explanations": sample_info[sample_key],
                        }
                    }
                }
                append_update_explanations(new_explanations, Path(explanations_path))
                print(f"💾 Saved explanation for sample {i+1} to {explanations_path}")

            if checkpoint:
                checkpoint.mark_as_processed(folder_name, i)

        except Exception as e:  # noqa: BLE001 — per-sample resilience by contract
            print(f"❌ Error processing sample {i+1}: {e}")

    return sample_info


def explain_predictions_segmented(
    audio_path: str,
    predictor,
    segment_duration: float = 10.0,
    model_time: float = 10.0,
    num_samples_lime: int = 500,
    features_output_dir: Optional[str] = None,
    max_samples: int = 5,
    ids_to_explain: Optional[List[int]] = None,
    model_name: Optional[str] = None,
    audio_file_stem: Optional[str] = None,
    max_duration: Optional[float] = None,
    checkpoint_segmented: Optional[LIMEExperimentCheckpoint] = None,
    processed_segments: Optional[List[int]] = None,
    engine: Optional[PerturbationEngine] = None,
    separation_model: str = "spleeter:4stems",
):
    """Segmented LIME: split into segment_duration chunks, per-segment WAV
    export + per-segment explanation (reference: src/lime_explainer.py:131-218)."""
    if ids_to_explain is None:
        ids_to_explain = list(range(1000))

    y, sr = load_audio(audio_path, sr=44100, mono=True, duration=max_duration)
    total_duration = min(len(y) / sr, model_time)
    segment_samples = int(segment_duration * sr)
    n_segments = int(np.ceil(total_duration / segment_duration))

    print(f"Audio File Stem: {audio_file_stem}")
    print(f"total_duration: {total_duration}")
    print(f"segment_samples: {segment_samples}")
    print(f"n_segments: {n_segments}")

    results = {}
    for seg_i in range(n_segments):
        if processed_segments and seg_i in processed_segments:
            print(f"⏭️ Skipping already processed segment {seg_i}")
            continue

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

        segment_audio_files = [segment_wav_path] if segment_wav_path else []
        segment_explanations = explain_predictions_separate(
            audio_files=segment_audio_files,
            predictor=predictor,
            model_time=model_time,
            max_samples=max_samples,
            original_predictions=None,
            num_samples_lime=num_samples_lime,
            ids_to_explain=ids_to_explain,
            checkpoint=None,
            folder_name=segment_dir_name,
            explanations_path=None,
            features_output_dir=Path(features_output_dir) / model_name / audio_file_stem
            if features_output_dir
            else None,
            engine=engine,
            separation_model=separation_model,
        )
        results[segment_dir_name] = segment_explanations

        if checkpoint_segmented:
            checkpoint_segmented.mark_segment_as_processed(model_name, audio_file_stem, seg_i)

    return results


def run_lime_experiment_safe(
    predictor,
    model_time=120,
    explain=False,
    max_samples_explain=5,
    dataset_path="../../Data/FakeRealMusic",
    num_samples_lime=500,
    models_to_explain=("ElevenLabs", "REAL", "SUNO", "SUNO_PRO", "UDIO"),
    ids_to_explain=(0, 1, 2, 3, 4, 5, 6, 7, 8, 9),
    checkpoint_dir: Optional[str | Path] = None,
    explanations_path: Optional[str] = None,
    features_output_dir_full: Optional[str] = None,
    features_output_dir_segmented: Optional[str] = None,
    full_track_explanations: bool = True,
    segmented_explanations: bool = False,
    segment_duration: float = 10.0,
    segmented_explanations_path: Optional[str] = None,
    save_separated_audio_only: Optional[bool] = None,
    save_reversed_separated_audio_only: Optional[bool] = None,
    separation_model: str = "spleeter:4stems",
    shard_index: int = 0,
    num_shards: int = 1,
    track_batch: Optional[int] = 4,
):
    """Run the LIME experiment for fake song detection."""
    checkpoint = None
    checkpoint_segmented = None
    if checkpoint_dir and explain:
        checkpoint = LIMEExperimentCheckpoint(checkpoint_dir)
    if checkpoint_dir and segmented_explanations and explain:
        checkpoint_segmented = LIMEExperimentCheckpoint(str(checkpoint_dir) + "_segmented")
    results = {}

    merged_explanations = {}
    if explanations_path:
        # loaded only to print the folder count — reference console parity
        # (ref lime_explainer.py:517-518 does the same; its later consumer
        # was the buggy segmented write we replaced)
        merged_explanations = load_existing_explanations(Path(explanations_path))
        print(
            f"Loaded existing explanations for {len(merged_explanations)} folders "
            f"from {explanations_path}"
        )
    merged_segmented_explanations = (
        load_existing_explanations(Path(segmented_explanations_path))
        if segmented_explanations and segmented_explanations_path
        else {}
    )

    engine = _get_engine(predictor)

    for folder in Path(dataset_path).iterdir():
        if not folder.is_dir() or folder.name not in models_to_explain:
            continue
        print(f"\n🔊 Processing folder: {folder.name}")
        all_audio = sorted(list(folder.glob("*.mp3")) + list(folder.glob("*.wav")))[:max_samples_explain]
        if num_shards > 1:
            # track-level DP across hosts (SURVEY §2.6(c)); with sharding,
            # ids_to_explain indexes this host's slice
            all_audio = host_shard(all_audio, shard_index, num_shards)
            print(f"   Shard {shard_index}/{num_shards}: {len(all_audio)} files")
        if not all_audio:
            print("   No audio files found, skipping...")
            continue

        original_probs = None
        # decode-once: collect the predictions phase's decoded waves for the
        # explain phase below (same load_audio parameters there), capped so a
        # huge folder can't pin GBs of host RAM (16 × 120 s f32 ≈ 340 MB).
        # RemoteSonics ignores waves_out (it posts files) → dict stays empty
        # and the explain phase decodes as before.
        folder_waves: Optional[Dict[int, np.ndarray]] = (
            {} if explain and full_track_explanations and len(all_audio) <= 16
            else None
        )
        if not save_separated_audio_only and not save_reversed_separated_audio_only:
            print(f"   Getting predictions for {len(all_audio)} files...")
            _t_pred = time.time()
            original_probs = predict_batch_from_files(
                predictor, all_audio, verbose=True, sr=44100,
                duration=model_time,
                **({"waves_out": folder_waves} if folder_waves is not None else {}),
            )
            print(f"   ⏱️ predictions phase: {time.time() - _t_pred:.1f}s")
            results[folder.name] = [prob > 0.5 for prob in original_probs]

        if explain:
            if full_track_explanations:
                if save_separated_audio_only or save_reversed_separated_audio_only:
                    for fpath in all_audio:
                        y, _ = load_audio(fpath, sr=44100, mono=True, offset=0, duration=model_time)
                        factorization = SpleeterFactorization(
                            input=y, target_sr=44100, temporal_segmentation_params=1,
                            composition_fn=None, model_name=separation_model,
                        )
                        for name, separated_audio in zip(
                            factorization._components_names, factorization.components
                        ):
                            safe_name = safe_stem(fpath)
                            if save_separated_audio_only:
                                out = (
                                    Path(features_output_dir_full or "") / folder.name / safe_name
                                    / "separated_components" / f"{name}.wav"
                                )
                                write_wav(out, separated_audio, 44100)
                                print(f"   Saved separated component audio: {out}")
                            else:
                                out = (
                                    Path(features_output_dir_full or "") / folder.name / safe_name
                                    / "reversed_separated_components" / f"{name}.wav"
                                )
                                write_wav(out, y - separated_audio[: len(y)], 44100)
                                print(f"   Saved reversed separated component audio: {out}")
                    continue

                explain_predictions_separate(
                    audio_files=all_audio,
                    predictor=predictor,
                    model_time=model_time,
                    max_samples=max_samples_explain,
                    original_predictions=original_probs,
                    num_samples_lime=num_samples_lime,
                    ids_to_explain=ids_to_explain,
                    checkpoint=checkpoint,
                    folder_name=folder.name,
                    explanations_path=explanations_path,
                    features_output_dir=features_output_dir_full,
                    model_name=folder.name,
                    engine=engine,
                    separation_model=separation_model,
                    track_batch=track_batch,
                    preloaded_waves=folder_waves or None,
                )
                folder_waves = None  # release before the next folder

            if segmented_explanations:
                print(f"\n🔊 Processing segmented explanations for folder: {folder.name}")
                processed_segments = (
                    checkpoint_segmented.load_processed_segments() if checkpoint_segmented else {}
                )
                merged_segmented_explanations.setdefault(folder.name, {})

                for audio_file in all_audio:
                    audio_stem = Path(audio_file).stem
                    segment_explanations = explain_predictions_segmented(
                        audio_path=str(audio_file),
                        predictor=predictor,
                        segment_duration=segment_duration,
                        model_time=model_time,
                        num_samples_lime=num_samples_lime,
                        features_output_dir=features_output_dir_segmented,
                        max_samples=max_samples_explain,
                        model_name=folder.name,
                        audio_file_stem=audio_stem,
                        max_duration=model_time,
                        checkpoint_segmented=checkpoint_segmented,
                        processed_segments=processed_segments.get(folder.name, {}).get(audio_stem, []),
                        engine=engine,
                        separation_model=separation_model,
                    )
                    entry = merged_segmented_explanations[folder.name].setdefault(
                        audio_stem, {"type": "segment", "segments": {}}
                    )
                    for segment_id, explanations_data in segment_explanations.items():
                        entry["segments"][str(segment_id)] = {"explanations": explanations_data}
                    if segmented_explanations_path:
                        append_update_explanations(
                            merged_segmented_explanations, Path(segmented_explanations_path)
                        )

    if save_separated_audio_only or save_reversed_separated_audio_only:
        print("\n✅ Experiment completed with separated audio saved. No explanations generated.")
        return None, None

    # dict-of-Series: model folders with different file counts NaN-pad
    # instead of crashing (the reference's bare pd.DataFrame(results)
    # raises 'All arrays must be of the same length' after all the
    # prediction/explanation work is done — deviate where broken)
    df = pd.DataFrame({k: pd.Series(v) for k, v in results.items()})
    print("\n📊 Results DataFrame (True = Fake):")
    print(df)

    if explain:
        if explanations_path and Path(explanations_path).exists():
            return df, load_existing_explanations(Path(explanations_path))
        return df, {}
    return df
