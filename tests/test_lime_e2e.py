"""AudioLIME tests: separation partition property, native LIME surrogate
faithfulness, and the end-to-end experiment driver."""

import json

import numpy as np
import pytest

from adx_tpu.explainers.audiolime import LimeAudioExplainer, SpleeterFactorization
from adx_tpu.explainers.lime_explainer import run_lime_experiment_safe
from adx_tpu.explainers.separation import mask_separate, separate
from adx_tpu.io.audio_io import write_wav
from adx_tpu.predict import LocalSonics

SR = 8000


@pytest.fixture(scope="module")
def predictor():
    return LocalSonics.from_pretrained("tiny", max_batch=8)


@pytest.fixture(scope="module")
def mixture():
    rng = np.random.default_rng(1234)
    n = SR  # 1 s
    t = np.arange(n) / SR
    return (
        0.3 * np.sin(2 * np.pi * 330 * t)
        + 0.2 * np.sin(2 * np.pi * 110 * t)
        + 0.1 * rng.standard_normal(n)
    ).astype(np.float32)


def test_mask_separation_partitions_mixture(mixture):
    for model in ["spleeter:2stems", "spleeter:4stems", "spleeter:5stems"]:
        stems = mask_separate(mixture, SR, model_name=model)
        total = np.sum(list(stems.values()), axis=0)
        # stems must partition the mixture up to ISTFT round-trip error
        np.testing.assert_allclose(total[2048:-2048], mixture[2048:-2048], atol=1e-3)


def test_separation_stem_names(mixture):
    stems = separate(mixture, SR, model_name="spleeter:4stems")
    assert list(stems.keys()) == ["vocals0", "drums0", "bass0", "other0"]
    stems2 = separate(mixture, SR, model_name="spleeter:2stems")
    assert list(stems2.keys()) == ["vocals0", "accompaniment0"]


def test_lime_recovers_known_linear_model(mixture):
    """If the predictor IS linear in the stems, LIME must recover its
    coefficients (the canonical LIME sanity check)."""
    fact = SpleeterFactorization(mixture, target_sr=SR, model_name="spleeter:4stems")
    # replace the real stems with orthogonal tones so the linear ground
    # truth is exactly representable (real stems share phase and correlate)
    n = len(mixture)
    t = np.arange(n) / SR
    fact.components = [
        np.sin(2 * np.pi * f * t).astype(np.float32) for f in (110, 220, 440, 880)
    ]
    stems = np.stack([c[:n] for c in fact.components])
    true_w = np.array([0.5, -0.3, 0.2, 0.1])

    def predict_fn(waves):
        # project each wave onto the (nearly orthogonal) stems
        coeffs = (waves @ stems.T) / (np.sum(stems**2, axis=1) + 1e-12)
        fake = 0.5 + coeffs @ true_w * 0.5
        return np.stack([1 - fake, fake], axis=1)

    expl = LimeAudioExplainer(kernel_width=0.25).explain_instance(
        fact, predict_fn=predict_fn, num_samples=200, top_labels=1
    )
    label = expl.top_labels[0]
    got = np.array([w for _, w in expl.local_exp[label]])
    want = 0.5 * true_w if label == 1 else -0.5 * true_w
    # sign pattern and ordering must match; magnitudes approximately
    np.testing.assert_allclose(got, want, atol=0.1)
    # weights are in feature order, so the reference's positional zip works
    assert [i for i, _ in expl.local_exp[label]] == [0, 1, 2, 3]


def test_lime_engine_path_matches_predictfn_path(predictor, mixture):
    from adx_tpu.runtime.engine import PerturbationEngine

    fact = SpleeterFactorization(mixture, target_sr=SR, model_name="spleeter:4stems")
    engine = PerturbationEngine(predictor, sr=SR, duration=predictor.cfg.audio.duration, chunk=8)

    def predict_fn(waves):
        fake = predictor.predict_batch(waves, sr=SR)
        return np.stack([1 - fake, fake], axis=1)

    e1 = LimeAudioExplainer().explain_instance(fact, predict_fn=predict_fn, num_samples=64)
    e2 = LimeAudioExplainer().explain_instance(fact, engine=engine, num_samples=64)
    w1 = np.array([w for _, w in e1.local_exp[e1.top_labels[0]]])
    w2 = np.array([w for _, w in e2.local_exp[e2.top_labels[0]]])
    np.testing.assert_allclose(w1, w2, atol=2e-3)


def test_device_factorization_matches_host(predictor, mixture):
    """A jax-array mixture keeps stems device-resident end-to-end; the
    explanation must match the host-numpy factorization path."""
    import jax
    import jax.numpy as jnp

    from adx_tpu.runtime.engine import PerturbationEngine

    engine = PerturbationEngine(predictor, sr=SR, duration=predictor.cfg.audio.duration, chunk=8)
    f_host = SpleeterFactorization(mixture, target_sr=SR, model_name="spleeter:4stems")
    f_dev = SpleeterFactorization(jnp.asarray(mixture), target_sr=SR, model_name="spleeter:4stems")
    assert f_dev.on_device and not f_host.on_device
    assert all(isinstance(c, jax.Array) for c in f_dev.components)
    for ch, cd in zip(f_host.components, f_dev.components):
        np.testing.assert_allclose(ch, np.asarray(cd), atol=1e-6)
    e1 = LimeAudioExplainer().explain_instance(f_host, engine=engine, num_samples=64)
    e2 = LimeAudioExplainer().explain_instance(f_dev, engine=engine, num_samples=64)
    w1 = np.array([w for _, w in e1.local_exp[e1.top_labels[0]]])
    w2 = np.array([w for _, w in e2.local_exp[e2.top_labels[0]]])
    np.testing.assert_allclose(w1, w2, atol=1e-6)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    rng = np.random.default_rng(1234)
    root = tmp_path_factory.mktemp("LimeMini")
    n = SR
    t = np.arange(n) / SR
    for model in ["REAL", "SUNO"]:
        for i in range(2):
            y = 0.3 * np.sin(2 * np.pi * (200 + 120 * i) * t) + 0.05 * rng.standard_normal(n)
            write_wav(root / model / f"clip_{i}.wav", y.astype(np.float32), SR)
    return root


def test_lime_experiment_end_to_end(predictor, dataset, tmp_path):
    out = tmp_path / "lime_out"
    expl_path = out / "full_track" / "explanations.json"
    df, explanations = run_lime_experiment_safe(
        predictor=predictor,
        model_time=1.0,
        explain=True,
        max_samples_explain=2,
        dataset_path=dataset,
        num_samples_lime=32,
        models_to_explain=["REAL", "SUNO"],
        ids_to_explain=[0, 1],
        checkpoint_dir=tmp_path / "ckpt",
        explanations_path=str(expl_path),
        features_output_dir_full=str(out / "full_track"),
    )
    assert set(df.columns) == {"REAL", "SUNO"}

    data = json.loads(expl_path.read_text())
    assert set(data) == {"REAL", "SUNO"}
    entry = data["REAL"]["clip_0"]
    assert entry["type"] == "full_track"
    expl = entry["explanations"]
    assert set(expl) == {"file_path", "model_prediction", "predicted_class", "component_influences"}
    assert set(expl["component_influences"]) == {"vocals0", "drums0", "bass0", "other0"}

    # per-sample figures written under full_track/<model>/<stem>/
    sample_dir = out / "full_track" / "REAL" / "clip_0"
    assert (sample_dir / "clip_0_waveforms_overlay_influences.png").exists()
    assert (sample_dir / "clip_0_stacked_rms_area_components.png").exists()

    # checkpoint: second run skips all samples but keeps explanations
    df2, expl2 = run_lime_experiment_safe(
        predictor=predictor,
        model_time=1.0,
        explain=True,
        max_samples_explain=2,
        dataset_path=dataset,
        num_samples_lime=32,
        models_to_explain=["REAL", "SUNO"],
        ids_to_explain=[0, 1],
        checkpoint_dir=tmp_path / "ckpt",
        explanations_path=str(expl_path),
    )
    assert set(expl2) == {"REAL", "SUNO"}


def test_lime_save_separated_modes(predictor, dataset, tmp_path):
    out = tmp_path / "sep_out"
    result = run_lime_experiment_safe(
        predictor=predictor,
        model_time=1.0,
        explain=True,
        max_samples_explain=1,
        dataset_path=dataset,
        models_to_explain=["REAL"],
        features_output_dir_full=str(out),
        save_separated_audio_only=True,
    )
    assert result == (None, None)
    comp_dir = out / "REAL" / "clip_0" / "separated_components"
    assert sorted(p.name for p in comp_dir.glob("*.wav")) == [
        "bass0.wav", "drums0.wav", "other0.wav", "vocals0.wav",
    ]


def test_lime_visualizations(dataset, tmp_path):
    explanations = {
        "REAL": {
            f"t{i}": {
                "type": "full_track",
                "explanations": {
                    "model_prediction": 0.2 + 0.1 * i,
                    "predicted_class": "Real",
                    "component_influences": {
                        "vocals0": 0.1 * i, "drums0": -0.05, "bass0": 0.02, "other0": 0.0,
                    },
                },
            }
            for i in range(4)
        },
        "SUNO": {
            f"t{i}": {
                "type": "full_track",
                "explanations": {
                    "model_prediction": 0.7 + 0.05 * i,
                    "predicted_class": "Fake",
                    "component_influences": {
                        "vocals0": 0.2, "drums0": 0.1 * i, "bass0": -0.02, "other0": 0.01,
                    },
                },
            }
            for i in range(4)
        },
    }
    from adx_tpu.viz.lime_viz import (
        visualize_explanations,
        visualize_explanations_by_model,
        visualize_per_sample_explanations,
    )

    out = tmp_path / "viz"
    visualize_explanations(explanations, output_dir=str(out / "overall"))
    for name in [
        "average_component_influence.png", "influence_distributions.png",
        "influence_vs_probability.png", "correlation_r_influence_probability.png",
    ]:
        assert (out / "overall" / name).exists()

    visualize_explanations_by_model(explanations, output_dir=str(out / "per_model"))
    for name in ["all_models_comparison.png", "influence_heatmap.png",
                 "probability_vs_influence.png", "correlation_r_per_model.png"]:
        assert (out / "per_model" / name).exists()

    visualize_per_sample_explanations(explanations, features_outputdir_full=str(out / "samples"),
                                      max_samples_per_model=1)
    assert (out / "samples" / "REAL" / "t0" / "t0_bar_influences.png").exists()
    assert (out / "samples" / "REAL" / "t0" / "t0_radar_influences.png").exists()


def test_lime_segmented_mode(predictor, dataset, tmp_path):
    """Segmented LIME: per-segment WAV export, per-segment explanations,
    segment-level checkpoint (reference: src/lime_explainer.py:131-218)."""
    out = tmp_path / "seg_out"
    seg_path = out / "segmented" / "segmented_explanations.json"
    df, _ = run_lime_experiment_safe(
        predictor=predictor,
        model_time=1.0,
        explain=True,
        max_samples_explain=1,
        dataset_path=dataset,
        num_samples_lime=16,
        models_to_explain=["REAL"],
        ids_to_explain=[0],
        checkpoint_dir=tmp_path / "segckpt",
        explanations_path=str(out / "full_track" / "explanations.json"),
        features_output_dir_full=str(out / "full_track"),
        features_output_dir_segmented=str(out / "segmented"),
        full_track_explanations=False,
        segmented_explanations=True,
        segment_duration=0.5,
        segmented_explanations_path=str(seg_path),
    )
    data = json.loads(seg_path.read_text())
    entry = data["REAL"]["clip_0"]
    assert entry["type"] == "segment"
    segs = entry["segments"]
    assert len(segs) == 2  # 1 s track / 0.5 s segments
    seg_name = sorted(segs)[0]
    assert seg_name.startswith("segment_0_")
    # per-segment WAV exported
    assert (out / "segmented" / "REAL" / "clip_0" / seg_name / "segment_0.wav").exists()
    # segment explanations carry component influences
    seg_expl = segs[seg_name]["explanations"]
    inner = next(iter(seg_expl.values()))
    assert set(inner["component_influences"]) == {"vocals0", "drums0", "bass0", "other0"}
    # segment-level checkpoint recorded
    from adx_tpu.runtime.checkpoint import LIMEExperimentCheckpoint

    ck = LIMEExperimentCheckpoint(str(tmp_path / "segckpt") + "_segmented")
    done = ck.load_processed_segments()
    assert set(done["REAL"]["clip_0"]) == {0, 1}


def test_lime_corrupt_file_contained_per_sample(predictor, tmp_path):
    """One truncated WAV must not abort the remaining dataset: the decode
    now sits INSIDE the per-sample try (same contract as occlusion)."""
    root = tmp_path / "CorruptMini"
    rng = np.random.default_rng(7)
    t = np.arange(SR) / SR
    for i in range(2):
        y = 0.3 * np.sin(2 * np.pi * (220 + 100 * i) * t) + 0.03 * rng.standard_normal(SR)
        write_wav(root / "REAL" / f"ok_{i}.wav", y.astype(np.float32), SR)
    bad = root / "REAL" / "ok_0.wav"
    bad.write_bytes(bad.read_bytes()[:40])  # truncate mid-header

    expl_path = tmp_path / "expl" / "explanations.json"
    df, explanations = run_lime_experiment_safe(
        predictor=predictor,
        model_time=1.0,
        explain=True,
        max_samples_explain=2,
        dataset_path=root,
        num_samples_lime=16,
        models_to_explain=["REAL"],
        ids_to_explain=[0, 1],
        explanations_path=str(expl_path),
    )
    data = json.loads(expl_path.read_text())
    assert "ok_1" in data["REAL"] and "ok_0" not in data["REAL"]


def test_per_sample_viz_tolerates_null_model_prediction(tmp_path):
    """explanations.json written without original predictions stores
    model_prediction: null — the bar plot must not crash formatting it."""
    from adx_tpu.viz.lime_viz import visualize_per_sample_explanations

    expl = {"REAL": {"s0": {"type": "full_track", "explanations": {
        "file_path": "x.wav", "model_prediction": None,
        "predicted_class": "Real",
        "component_influences": {"vocals0": 0.2, "drums0": -0.1,
                                 "bass0": 0.05, "other0": 0.0},
    }}}}
    visualize_per_sample_explanations(expl, str(tmp_path / "viz"))
    assert (tmp_path / "viz" / "REAL" / "s0").exists()


def test_lime_null_prediction_does_not_drop_sample(predictor, dataset, tmp_path):
    """original_predictions entries can be None (the reference's segmented
    writer emits model_prediction: null) — such a sample must still be
    explained, not fail formatting inside the try and silently leak its
    precomputed device stems."""
    from adx_tpu.explainers.lime_explainer import explain_predictions_separate

    files = sorted((dataset / "REAL").glob("*.wav"))
    info = explain_predictions_separate(
        files, predictor, model_time=1.0, max_samples=2,
        original_predictions=[None, 0.7], num_samples_lime=16,
        ids_to_explain=[0, 1], track_batch=2,
    )
    stems = {p.stem for p in files}
    assert set(info) == stems
    by_stem = {k: v for k, v in info.items()}
    none_entry = by_stem[files[0].stem]
    assert none_entry["model_prediction"] is None
    assert none_entry["predicted_class"] is None
    assert set(none_entry["component_influences"]) == {
        "vocals0", "drums0", "bass0", "other0"}


def test_lime_track_fold_matches_serial(predictor, dataset, tmp_path):
    """run_lime_experiment_safe with the track-folded stem-mix precompute
    (track_batch=4) must reproduce the serial explain_instance path
    (track_batch=1) within the documented multi-program noise."""
    import json as _json

    outs = {}
    for label, tb in (("serial", 1), ("folded", 4)):
        out = tmp_path / label
        expl_path = out / "full_track" / "explanations.json"
        run_lime_experiment_safe(
            predictor=predictor,
            model_time=1.0,
            explain=True,
            max_samples_explain=2,
            dataset_path=dataset,
            num_samples_lime=32,
            models_to_explain=["REAL", "SUNO"],
            ids_to_explain=[0, 1],
            checkpoint_dir=None,
            explanations_path=str(expl_path),
            track_batch=tb,
        )
        outs[label] = _json.loads(expl_path.read_text())
    assert set(outs["serial"]) == set(outs["folded"]) == {"REAL", "SUNO"}
    for model in outs["serial"]:
        for track, entry in outs["serial"][model].items():
            inf_s = entry["explanations"]["component_influences"]
            inf_g = outs["folded"][model][track]["explanations"]["component_influences"]
            assert set(inf_s) == set(inf_g)
            for comp in inf_s:
                np.testing.assert_allclose(inf_s[comp], inf_g[comp], atol=5e-5,
                                           err_msg=f"{model}/{track}/{comp}")


def test_lime_decode_once_matches_and_skips_second_decode(predictor, dataset, tmp_path, monkeypatch):
    """The experiment driver hands the predictions phase's decoded waves to
    the explain phase (decode-once): each WAV must be load_audio'd exactly
    once per run, and the explanations must be IDENTICAL to a run without
    the preload (same array feeds both paths)."""
    import adx_tpu.explainers.lime_explainer as lx
    import adx_tpu.predict as predict_mod
    from adx_tpu.io import audio_io

    real_load = audio_io.load_audio
    counts = {}

    def counting_load(path, *a, **kw):
        counts[str(path)] = counts.get(str(path), 0) + 1
        return real_load(path, *a, **kw)

    # both modules import load_audio by name
    monkeypatch.setattr(lx, "load_audio", counting_load)
    monkeypatch.setattr(predict_mod, "load_audio", counting_load)

    def run(out):
        expl = out / "full_track" / "explanations.json"
        run_lime_experiment_safe(
            predictor=predictor, model_time=1.0, explain=True,
            max_samples_explain=2, dataset_path=dataset,
            num_samples_lime=16, models_to_explain=["REAL", "SUNO"],
            ids_to_explain=[0, 1], explanations_path=str(expl),
            track_batch=2,
        )
        return json.loads(expl.read_text())

    counts.clear()
    got = run(tmp_path / "once")
    assert counts and all(c == 1 for c in counts.values()), counts

    # disable the preload (cap excluded by a 0-size dict? simplest: huge
    # folder threshold bypass via monkeypatching the explain entry to drop
    # the kwarg) — compare against the double-decode baseline
    real_explain = lx.explain_predictions_separate

    def no_preload(*a, **kw):
        kw["preloaded_waves"] = None
        return real_explain(*a, **kw)

    monkeypatch.setattr(lx, "explain_predictions_separate", no_preload)
    counts.clear()
    base = run(tmp_path / "twice")
    assert any(c == 2 for c in counts.values()), counts

    assert got == base  # bit-identical JSON: same decoded array in both paths
