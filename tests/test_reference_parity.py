"""Parity against the REFERENCE IMPLEMENTATION'S OWN CODE.

The reference's pure-numpy primitives need no librosa/torch, so they are
extracted from /root/reference source at test time (AST segment → exec —
nothing is copied into this repo) and executed next to the adx_tpu
versions:

* ``smooth_band_keep_mask`` / ``match_rms``   (src/dsp_band_ops.py:228-259)
* ``FREQUENCY_BAND_PRESETS``                  (src/dsp_band_ops.py:210-226)
* the occlusion patch-grid arithmetic        (src/spectrogram_explainability.py:620-648)

Skipped when /root/reference is not mounted.
"""

import ast
import sys
import textwrap
from pathlib import Path
from types import SimpleNamespace
from typing import Dict, List, Optional, Tuple

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REF_SRC = Path("/root/reference/src")

pytestmark = pytest.mark.skipif(
    not REF_SRC.exists(), reason="reference checkout not available"
)


def _load_reference_defs(path: Path, names, extra=None):
    """Exec only the named top-level defs/assignments from a reference file."""
    src = path.read_text()
    ns = {
        "np": np,
        "Dict": Dict,
        "List": List,
        "Tuple": Tuple,
        "Optional": Optional,
    }
    ns.update(extra or {})
    for node in ast.parse(src).body:
        hit = (
            isinstance(node, ast.FunctionDef) and node.name in names
        ) or (
            isinstance(node, (ast.Assign, ast.AnnAssign))
            and any(
                getattr(t, "id", None) in names
                for t in (node.targets if isinstance(node, ast.Assign) else [node.target])
            )
        )
        if hit:
            seg = ast.get_source_segment(src, node)
            exec(compile(seg, str(path), "exec"), ns)
    missing = [n for n in names if n not in ns]
    assert not missing, f"could not extract {missing} from {path}"
    return ns


def _extract_patch_grid_block() -> str:
    """The inline patch-grid arithmetic of SpectrogramExplainability."""
    lines = (REF_SRC / "spectrogram_explainability.py").read_text().splitlines()
    start = next(i for i, l in enumerate(lines) if "t_patch = self.patch_time_frames" in l)
    end = next(i for i, l in enumerate(lines) if "patch_positions.append" in l)
    return textwrap.dedent("\n".join(lines[start : end + 1]))


@pytest.fixture(scope="module")
def ref_band_ops():
    return _load_reference_defs(
        REF_SRC / "dsp_band_ops.py",
        ["match_rms", "smooth_band_keep_mask", "FREQUENCY_BAND_PRESETS"],
    )


def test_smooth_band_keep_mask_parity(ref_band_ops):
    from adx_tpu.ops.masks import smooth_band_keep_mask

    freqs = np.fft.rfftfreq(2048, 1.0 / 16000).astype(np.float32)
    cases = [
        (100.0, 250.0, 200.0),
        (20.0, 100.0, 200.0),   # transition clipped below 0 Hz
        (4000.0, 8000.0, 0.0),  # no transition
        (6000.0, 12000.0, 500.0),
        (12000.0, 21000.0, 200.0),  # band beyond Nyquist
    ]
    for low, high, trans in cases:
        want = ref_band_ops["smooth_band_keep_mask"](freqs, low, high, trans)
        got = np.asarray(smooth_band_keep_mask(freqs, low, high, trans))
        assert np.abs(want - got).max() < 1e-6, (low, high, trans)


def test_match_rms_parity(ref_band_ops):
    from adx_tpu.ops.audio import match_rms

    rng = np.random.default_rng(3)
    for scale in (1.0, 0.01, 37.5):
        ref_sig = rng.standard_normal(4096).astype(np.float32)
        x = (rng.standard_normal(4096) * scale).astype(np.float32)
        want = ref_band_ops["match_rms"](ref_sig, x)
        got = np.asarray(match_rms(ref_sig, x))
        assert np.abs(want - got).max() < 1e-5 * max(1.0, np.abs(want).max())
    # all-zero perturbed signal: scale from the eps'd RMS ratio, not a NaN
    zeros = np.zeros(1024, np.float32)
    want = ref_band_ops["match_rms"](ref_sig[:1024], zeros)
    got = np.asarray(match_rms(ref_sig[:1024], zeros))
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_band_presets_parity(ref_band_ops):
    from adx_tpu.explainers.fbp import FREQUENCY_BAND_PRESETS

    want = ref_band_ops["FREQUENCY_BAND_PRESETS"]
    assert set(want) == set(FREQUENCY_BAND_PRESETS)
    for preset, bands in want.items():
        assert [tuple(b) for b in FREQUENCY_BAND_PRESETS[preset]] == [
            tuple(b) for b in bands
        ], preset


@pytest.mark.parametrize(
    "n_freq,n_time,t_patch,t_stride,f_pct,f_stride_pct",
    [
        (1025, 3751, 64, 32, 8.0, 4.0),   # 120 s / 16 kHz production shape
        (1025, 3751, 128, 128, 10.0, 10.0),
        (101, 53, 7, 3, 12.3, 7.7),       # awkward rounding
        (5, 4, 8, 8, 50.0, 50.0),         # patch larger than the spec
        (513, 938, 16, 16, 25.0, 12.5),
    ],
)
def test_patch_grid_parity(n_freq, n_time, t_patch, t_stride, f_pct, f_stride_pct):
    from adx_tpu.ops.masks import occlusion_patch_grid

    block = _extract_patch_grid_block()
    ns = {
        "self": SimpleNamespace(
            patch_time_frames=t_patch,
            stride_time_frames=t_stride,
            patch_freq_percent=f_pct,
            stride_freq_percent=f_stride_pct,
        ),
        "n_freq": n_freq,
        "n_time": n_time,
        "verbose": False,
        "np": np,
    }
    exec(compile(block, "reference_patch_grid", "exec"), ns)

    starts, pf, pt = occlusion_patch_grid(
        n_freq, n_time, t_patch, t_stride, f_pct, f_stride_pct
    )
    # our grid bakes the reference's per-patch truncation
    # (t_end = min(t_start + t_patch, n_time), :666-667) into the returned
    # patch sizes (the engine's fixed-size slices need it up front), so
    # compare the EFFECTIVE occluded regions, not the raw loop variables
    assert pf == min(ns["patch_freq"], n_freq)
    assert pt == min(ns["t_patch"], n_time)
    want = np.asarray(ns["patch_positions"], dtype=np.int32)
    assert starts.shape == want.shape
    np.testing.assert_array_equal(starts, want)
    assert len(starts) == ns["t_patches"] * ns["f_patches"]
    for (t0, f0) in np.asarray(starts):
        # effective region equals the reference's truncated patch
        assert min(t0 + ns["t_patch"], n_time) == t0 + min(pt, n_time - t0)
        assert min(f0 + ns["patch_freq"], n_freq) == f0 + min(pf, n_freq - f0)


# ---- explanations-JSON merge: BYTE parity with the reference writer ---------

REF_SCRIPTS = Path("/root/reference/scripts")


@pytest.fixture(scope="module")
def ref_lime():
    import json as _json

    return _load_reference_defs(
        REF_SRC / "lime_explainer.py",
        ["append_update_explanations", "convert_to_native", "to_native_dict"],
        extra={"json": _json, "Path": Path},
    )


def _merge_sequence():
    """A merge history covering every branch of the policy: fresh model,
    non-empty entry that must survive, empty entry that must be replaced,
    segment-grain merges, numpy scalars needing native conversion."""
    step1 = {
        "SUNO": {
            "t0": {"type": "full_track",
                   "explanations": {"component_influences": {"vocals0": np.float32(0.25)}}},
            "t1": {"type": "full_track",
                   "explanations": {"component_influences": {}}},
            "t2": {"type": "segment",
                   "segments": {"0": {"explanations": {"component_influences": {"bass0": 0.1}}}}},
        }
    }
    step2 = {
        "SUNO": {
            # t0 non-empty exists → must NOT overwrite
            "t0": {"type": "full_track",
                   "explanations": {"component_influences": {"vocals0": -9.0}}},
            # t1 empty exists → must overwrite
            "t1": {"type": "full_track",
                   "explanations": {"component_influences": {"drums0": np.float64(0.5)}}},
            # t2: new segment id merges in, existing one survives
            "t2": {"type": "segment",
                   "segments": {"0": {"explanations": {"component_influences": {"bass0": -1.0}}},
                                "1": {"explanations": {"component_influences": {"other0": 0.3}}}}},
        },
        "REAL": {"r0": {"type": "full_track",
                        "explanations": {"component_influences": {"vocals0": 0.0}}}},
    }
    return [step1, step2]


def test_append_update_explanations_byte_parity(ref_lime, tmp_path):
    from adx_tpu.io.results import append_update_explanations

    ref_path = tmp_path / "ref" / "explanations.json"
    our_path = tmp_path / "ours" / "explanations.json"
    for step in _merge_sequence():
        ref_lime["append_update_explanations"](step, ref_path)
        append_update_explanations(step, our_path)
    assert ref_path.read_bytes() == our_path.read_bytes()
    merged = __import__("json").loads(our_path.read_text())
    assert merged["SUNO"]["t0"]["explanations"]["component_influences"] == {"vocals0": 0.25}
    assert merged["SUNO"]["t1"]["explanations"]["component_influences"] == {"drums0": 0.5}
    assert set(merged["SUNO"]["t2"]["segments"]) == {"0", "1"}


def test_append_update_features_byte_parity(tmp_path):
    """Same merge-policy byte parity for the FEATURES writer (reference
    src/feature_calculate.py:20-77 — keyed on 'features', with the
    empty-entry policy evaluated per segment)."""
    import json as _json

    from adx_tpu.io.results import append_update_features

    ref = _load_reference_defs(
        REF_SRC / "feature_calculate.py",
        ["append_update_features", "convert_to_native"],
        extra={"json": _json, "Path": Path},
    )
    step1 = {
        "SUNO": {
            "t0": {"type": "full_track", "features": {"jitter": np.float32(0.25)}},
            "t1": {"type": "full_track", "features": {}},
            "t2": {"type": "segment",
                   "segments": {"0": {"features": {"hnr": 3.0}},
                                "1": {"features": {}}}},
        }
    }
    step2 = {
        "SUNO": {
            # non-empty full_track survives; empty one is replaced
            "t0": {"type": "full_track", "features": {"jitter": -9.0}},
            "t1": {"type": "full_track", "features": {"shimmer": np.float64(0.5)}},
            # segment 0 non-empty survives, empty 1 is replaced, 2 merges in
            "t2": {"type": "segment",
                   "segments": {"0": {"features": {"hnr": -1.0}},
                                "1": {"features": {"rhythm": 0.7}},
                                "2": {"features": {"f0": 220.0}}}},
        },
        "REAL": {"r0": {"type": "full_track", "features": {"jitter": 0.0}}},
    }
    ref_path = tmp_path / "ref" / "features.json"
    our_path = tmp_path / "ours" / "features.json"
    for step in (step1, step2):
        ref["append_update_features"](step, ref_path)
        append_update_features(step, our_path)
    assert ref_path.read_bytes() == our_path.read_bytes()
    merged = _json.loads(our_path.read_text())
    assert merged["SUNO"]["t0"]["features"] == {"jitter": 0.25}
    assert merged["SUNO"]["t1"]["features"] == {"shimmer": 0.5}
    segs = merged["SUNO"]["t2"]["segments"]
    assert segs["0"]["features"] == {"hnr": 3.0}
    assert segs["1"]["features"] == {"rhythm": 0.7}
    assert segs["2"]["features"] == {"f0": 220.0}


def test_convert_to_native_parity(ref_lime):
    from adx_tpu.io.results import convert_to_native, to_native_dict

    nested = {
        "a": np.float32(1.5),
        "b": [np.int64(3), np.asarray([1.0, 2.0]), {"c": np.float64(0.25)}],
        "e": None,
    }
    want = ref_lime["convert_to_native"](nested)
    got = convert_to_native(nested)
    assert got == want
    # deliberate hardening over the reference: it leaves tuples (and the
    # numpy scalars inside them) untouched, which would crash json.dump;
    # ours converts them to JSON lists
    assert convert_to_native({"d": ("x", np.int32(7))}) == {"d": ["x", 7]}
    ref_tup = ref_lime["convert_to_native"]({"d": ("x", np.int32(7))})
    assert isinstance(ref_tup["d"], tuple)
    flat = {"x": np.float32(2.0), "y": "s", "z": 3}
    assert to_native_dict(flat) == ref_lime["to_native_dict"](flat)


# ---- run-label taxonomy: parity with the runs-comparison scripts ------------

def test_extract_run_label_parity():
    from adx_tpu.viz.runs_compare import extract_run_label

    paths = []
    for lufs in ("minus14", "minus23", ""):
        for arm in ("base", "mp3_192", "noise_snr30", "resample22k", "reverb_room", ""):
            parts = [p for p in ("runs", lufs, arm, "SUNO") if p]
            paths.append("/".join(parts) + "/track_01.json")
    paths += [
        "MINUS14/Base/x.json",                      # case-insensitivity
        "minus14/minus23/base/x.json",              # both LUFS tags present
        "minus23/mp3_192/base_mix/x.json",          # two arm substrings
        "plain/folder/file.json",                   # no tags → parent name
        "file_with_a_very_long_stem_name_here.json",  # '.' parent → stem[:20]
        "minus14/unknown_arm/x.json",               # LUFS tag, no arm
    ]
    # all four reference scripts carry the same copy; hold each to parity
    for script in (
        "compare_predictions_across_runs.py",
        "compare_fbp_results_across_runs.py",
        "compare_occlusion_results_across_runs.py",
        "compare_audiolime_results_across_runs.py",
    ):
        ns = _load_reference_defs(
            REF_SCRIPTS / "runs_comparision" / script, ["extract_run_label"],
            extra={"Path": Path},
        )
        for p in paths:
            assert ns["extract_run_label"](p) == extract_run_label(p), (script, p)


# ---- jitter family: numeric parity on a shared f0 track ---------------------

def test_jitter_extended_parity():
    from adx_tpu.features.extraction import compute_jitter, compute_jitter_extended

    ns = _load_reference_defs(
        REF_SRC / "feature_extraction.py", ["compute_jitter", "compute_jitter_extended"]
    )
    rng = np.random.default_rng(0)
    f0 = 220.0 * (1.0 + 0.02 * rng.standard_normal(400))
    f0[::17] = np.nan  # unvoiced gaps
    want = ns["compute_jitter_extended"](None, 22050, f0=f0.copy())
    got = compute_jitter_extended(None, 22050, f0=f0.copy())
    assert set(want) == set(got)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-9, err_msg=k)
    np.testing.assert_allclose(
        compute_jitter(None, 22050, f0=f0.copy()),
        ns["compute_jitter"](None, 22050, f0=f0.copy()),
        rtol=1e-9,
    )
    # degenerate: fewer than 2 voiced frames
    short = np.array([np.nan, 180.0, np.nan])
    want_s = ns["compute_jitter_extended"](None, 22050, f0=short.copy())
    got_s = compute_jitter_extended(None, 22050, f0=short.copy())
    assert set(want_s) == set(got_s)
    assert all(np.isnan(v) for v in got_s.values())


# ---------------------------------------------------------------------------
# round-3 additions (VERDICT r2 item 7): shimmer/APQ, breath/voice-break
# counting, RISE normalization + min-max, occlusion per-file stats,
# expand_band_level_results
# ---------------------------------------------------------------------------


def _fake_librosa():
    """Minimal librosa namespace for exec'ing reference feature code: rms
    (center-padded windowed RMS, librosa semantics — the identical envelope
    adx_tpu computes) and frames_to_time. Checking the DOWNSTREAM math is
    the point; the envelope itself is covered by tests/test_features.py."""
    from adx_tpu.features.extraction import _rms_envelope_np

    class _Feature:
        @staticmethod
        def rms(y=None, frame_length=2048, hop_length=512):
            return _rms_envelope_np(
                np.asarray(y, np.float32), frame_length, hop_length
            )[None, :]

    class _Librosa:
        feature = _Feature()

        @staticmethod
        def frames_to_time(frames, sr=22050, hop_length=512):
            return np.asarray(frames) * hop_length / sr

    return _Librosa()


@pytest.fixture(scope="module")
def ref_features():
    return _load_reference_defs(
        REF_SRC / "feature_extraction.py",
        ["compute_shimmer", "compute_shimmer_extended", "detect_breaths",
         "detect_voice_breaks"],
        extra={"librosa": _fake_librosa()},
    )


def _feature_signals():
    sr = 22050
    rng = np.random.default_rng(5)
    t = np.arange(2 * sr) / sr
    am_tone = ((0.4 + 0.2 * np.sin(2 * np.pi * 3.0 * t))
               * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    gapped = am_tone.copy()
    gapped[sr // 3: sr // 2] = 0.0
    gapped[sr: sr + sr // 4] = 0.0
    noise = (0.1 * rng.standard_normal(2 * sr)).astype(np.float32)
    tiny = am_tone[: 128]  # shorter than one frame → NaN branch
    return sr, [am_tone, gapped, noise, tiny]


def test_shimmer_extended_parity(ref_features):
    from adx_tpu.features.extraction import compute_shimmer, compute_shimmer_extended

    sr, signals = _feature_signals()
    for y in signals:
        want = ref_features["compute_shimmer"](y, sr)
        got = compute_shimmer(y, sr)
        np.testing.assert_allclose(got, want, rtol=1e-6, equal_nan=True)
        want_ext = ref_features["compute_shimmer_extended"](y, sr)
        got_ext = compute_shimmer_extended(y, sr)
        assert set(got_ext) == set(want_ext)
        for k in want_ext:
            np.testing.assert_allclose(
                got_ext[k], want_ext[k], rtol=1e-5, equal_nan=True,
                err_msg=f"shimmer key {k}",
            )


def test_breath_and_voice_break_parity(ref_features):
    from adx_tpu.features.extraction import detect_breaths, detect_voice_breaks

    sr, signals = _feature_signals()
    for y in signals:
        assert detect_breaths(y, sr) == ref_features["detect_breaths"](y, sr)
        assert detect_voice_breaks(y, sr) == ref_features["detect_voice_breaks"](y, sr)
    # threshold edge: run ending exactly at the signal tail counts once
    y = np.zeros(sr, np.float32)
    y[: sr // 4] = 0.5
    assert detect_voice_breaks(y, sr) == ref_features["detect_voice_breaks"](y, sr)


def _extract_ref_lines(path: Path, first_marker: str, last_marker: str) -> str:
    lines = path.read_text().splitlines()
    start = next(i for i, l in enumerate(lines) if first_marker in l)
    end = next(i for i, l in enumerate(lines[start:], start) if last_marker in l)
    return textwrap.dedent("\n".join(lines[start : end + 1]))


def test_rise_normalization_parity():
    """Exec the reference's own normalize + min-max lines
    (src/spectrogram_explainability.py:795-801) on a random accumulated
    map and compare with adx_tpu's rise_normalize."""
    from adx_tpu.explainers.occlusion import rise_normalize

    block = _extract_ref_lines(
        REF_SRC / "spectrogram_explainability.py",
        "importance_map = importance_map / (self.n_masks",
        "importance_map.max() - importance_map.min()",
    )
    rng = np.random.default_rng(11)
    for n_masks, prob in [(200, 0.5), (50, 0.25), (1, 1.0)]:
        imp = rng.random((17, 23)) * n_masks * prob
        ns = {
            "np": np,
            "self": SimpleNamespace(n_masks=n_masks, mask_probability=prob),
            "importance_map": imp.copy(),
        }
        exec(compile(block, "ref_rise_norm", "exec"), ns)
        got = rise_normalize(imp, n_masks, prob)
        np.testing.assert_allclose(got, ns["importance_map"], atol=1e-12)


def test_occlusion_per_file_stats_parity():
    """The per-file stats dict (src/spectrogram_explainability.py:904-916):
    exec the reference's return-dict expression with a fake result and
    compare with adx_tpu's per_file_stats."""
    src_text = (REF_SRC / "spectrogram_explainability.py").read_text()
    tree = ast.parse(src_text)
    dict_node = None
    for node in ast.walk(tree):
        if isinstance(node, ast.Return) and isinstance(node.value, ast.Dict):
            keys = [getattr(k, "value", None) for k in node.value.keys]
            if "p90_importance" in keys:
                dict_node = node.value
                break
    assert dict_node is not None
    expr = ast.get_source_segment(src_text, dict_node)

    rng = np.random.default_rng(4)
    imp = rng.standard_normal((31, 47)).astype(np.float32)
    ns = {
        "np": np,
        "self": SimpleNamespace(method="occlusion"),
        "audio_path": Path("/x/a.wav"),
        "file_name": "a.wav",
        "folder_name": "SUNO",
        "result": SimpleNamespace(importance_map=imp, baseline_pred=0.7321),
    }
    want = eval(compile(expr, "ref_stats", "eval"), ns)

    from adx_tpu.explainers.occlusion import per_file_stats

    got = per_file_stats(imp, 0.7321)
    for k, v in got.items():
        np.testing.assert_allclose(v, want[k], rtol=1e-7, err_msg=k)
    # and the non-numeric keys exist in the reference row schema
    assert {"file_path", "file_name", "folder", "method"} <= set(want)


def _load_reference_method(path: Path, class_name: str, method: str, extra=None):
    src = path.read_text()
    for node in ast.parse(src).body:
        if isinstance(node, ast.ClassDef) and node.name == class_name:
            for sub in node.body:
                if isinstance(sub, ast.FunctionDef) and sub.name == method:
                    seg = textwrap.dedent(ast.get_source_segment(src, sub))
                    ns = {"np": np, "Dict": Dict, "List": List,
                          "Tuple": Tuple, "Optional": Optional}
                    ns.update(extra or {})
                    exec(compile(seg, str(path), "exec"), ns)
                    return ns[method]
    raise AssertionError(f"{class_name}.{method} not found in {path}")


def test_expand_band_level_results_parity():
    import pandas as pd

    ref_fn = _load_reference_method(
        REF_SRC / "dsp_band_ops.py", "FrequencyBandPerturbation",
        "expand_band_level_results", extra={"pd": pd},
    )
    from adx_tpu.explainers.fbp import FrequencyBandPerturbation

    df = pd.DataFrame([
        {
            "file_path": "/d/REAL/t0.wav", "file_name": "t0.wav",
            "folder": "REAL",
            "bands": [
                {"low": 20.0, "high": 250.0, "importance": 0.031,
                 "component": "vocals"},
                {"low": 250.0, "high": 4000.0, "importance": -0.002},
            ],
        },
        {"file_path": "/d/SUNO/t1.wav", "file_name": "t1.wav",
         "folder": "SUNO", "bands": []},   # skipped (falsy)
        {"file_path": "/d/SUNO/t2.wav", "file_name": "t2.wav",
         "folder": "SUNO",
         "bands": [{"low": 4000.0, "high": 16000.5, "importance": 0.5}]},
    ])
    want = ref_fn(SimpleNamespace(), df)
    got = FrequencyBandPerturbation.expand_band_level_results(
        SimpleNamespace(), df
    )
    pd.testing.assert_frame_equal(got, want)

    empty_want = ref_fn(SimpleNamespace(), df.iloc[1:2])
    empty_got = FrequencyBandPerturbation.expand_band_level_results(
        SimpleNamespace(), df.iloc[1:2]
    )
    assert empty_got.empty and empty_want.empty


# ---------------------------------------------------------------------------
# Notebook cell 7 (dataprep) pure-numpy surfaces
# ---------------------------------------------------------------------------

REF_NB = Path("/root/reference/Notebooks/0. AnalyzeSongs/analyzesongs.ipynb")


def _load_notebook_defs(names, extra=None):
    """AST-extract named defs from the dataprep notebook's code cells."""
    import json as _json

    nb = _json.loads(REF_NB.read_text())
    src = "\n\n".join(
        "".join(c["source"]) for c in nb["cells"] if c["cell_type"] == "code"
    )
    ns = {"np": np, "Dict": Dict, "List": List, "Tuple": Tuple,
          "Optional": Optional}
    ns.update(extra or {})
    seen = set()
    for node in ast.parse(src).body:
        if isinstance(node, ast.FunctionDef) and node.name in names \
                and node.name not in seen:
            seen.add(node.name)
            exec(compile(ast.get_source_segment(src, node), "nb", "exec"), ns)
    missing = [n for n in names if n not in ns]
    assert not missing, f"could not extract {missing} from notebook"
    return ns


@pytest.mark.skipif(not REF_NB.exists(), reason="reference notebook absent")
def test_sanitize_stem_parity():
    from adx_tpu.dataprep.pipeline import sanitize_stem

    ref = _load_notebook_defs(["sanitize_stem_windows"])["sanitize_stem_windows"]
    cases = [
        "plain_name",
        'bad<>:"/\\|?*chars',
        "  spaced  . ",
        "uniçøde—name",
        "tab\there",
        "x" * 300,
        "mixed  <weird>/name." + "y" * 250,
    ]
    for s in cases:
        assert sanitize_stem(s) == ref(s), s
    for n in (179, 180, 181, 200):
        s = "a" * n
        assert sanitize_stem(s) == ref(s), n


@pytest.mark.skipif(not REF_NB.exists(), reason="reference notebook absent")
def test_degrade_reverb_parity():
    from adx_tpu.dataprep.degrade import degrade_reverb_synthetic

    import scipy.signal as _sig

    ref = _load_notebook_defs(
        ["degrade_reverb_synthetic"], extra={"sig": _sig}
    )["degrade_reverb_synthetic"]
    rng = np.random.default_rng(3)
    sr = 22050
    y = (0.3 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)
         + 0.05 * rng.standard_normal(sr)).astype(np.float32)
    np.testing.assert_array_equal(degrade_reverb_synthetic(y, sr), ref(y, sr))
    ys = np.stack([y, 0.5 * y])
    np.testing.assert_array_equal(degrade_reverb_synthetic(ys, sr), ref(ys, sr))


@pytest.mark.skipif(not REF_NB.exists(), reason="reference notebook absent")
def test_degrade_add_noise_parity():
    """Bit parity under a shared seeded rng (the notebook draws its own
    unseeded default_rng; pin it in the exec namespace)."""
    from adx_tpu.dataprep.degrade import degrade_add_noise

    class _PinnedNp:
        def __getattr__(self, k):
            return getattr(np, k)

        @property
        def random(self):
            class R:
                @staticmethod
                def default_rng(*a):
                    return np.random.default_rng(1234)
            return R()

    ref = _load_notebook_defs(["degrade_add_noise"], extra={"np": _PinnedNp()})[
        "degrade_add_noise"
    ]
    rng = np.random.default_rng(7)
    sr = 22050
    y = (0.2 * np.sin(2 * np.pi * 330 * np.arange(sr) / sr)
         + 0.02 * rng.standard_normal(sr)).astype(np.float32)
    want = ref(y, 30)
    got = degrade_add_noise(y, 30, rng=np.random.default_rng(1234))
    np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not REF_NB.exists(), reason="reference notebook absent")
def test_apply_gain_and_soft_limiter_parity():
    from adx_tpu.dataprep.loudness import apply_gain, soft_limiter

    ns = _load_notebook_defs(["apply_gain", "soft_limiter"])
    rng = np.random.default_rng(3)
    y = (rng.standard_normal(4096) * 1.4).astype(np.float64)
    np.testing.assert_array_equal(apply_gain(y, -3.7), ns["apply_gain"](y, -3.7))
    for ceiling, knee in ((-1.0, 1.0), (-0.5, 2.0)):
        np.testing.assert_array_equal(
            soft_limiter(y, ceiling_dbfs=ceiling, knee_db=knee),
            ns["soft_limiter"](y, ceiling_dbfs=ceiling, knee_db=knee),
        )


@pytest.mark.skipif(not REF_NB.exists(), reason="reference notebook absent")
def test_tpdf_dither_parity():
    from adx_tpu.dataprep.loudness import tpdf_dither

    ref = _load_notebook_defs(["tpdf_dither"])["tpdf_dither"]
    y = np.linspace(-0.9, 0.9, 2048).astype(np.float64)
    for depth in (16, 24, 32):
        np.random.seed(99)
        want = ref(y, bit_depth=depth)
        np.random.seed(99)
        got = tpdf_dither(y, bit_depth=depth)
        np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not REF_NB.exists(), reason="reference notebook absent")
def test_infer_group_from_path_parity():
    from adx_tpu.dataprep.pipeline import KNOWN_GROUPS, infer_group_from_path

    ref_ns = _load_notebook_defs(
        ["infer_group_from_path"],
        extra={"KNOWN_GROUPS": list(KNOWN_GROUPS), "Path": Path},
    )
    ref = ref_ns["infer_group_from_path"]
    cases = [
        "/data/REAL/a/b.wav", "/data/real/x.wav", "/d/SUNO_PRO/t.wav",
        "/d/SUNO/t.wav", r"C:\music\UDIO\y.wav", "/d/ElevenLabs/z.wav",
        "/d/elevenlabs/z.wav", "/d/unrelated/z.wav", "/d/SUNOx/z.wav",
    ]
    for c in cases:
        assert infer_group_from_path(Path(c)) == ref(Path(c)), c
    # SUNO_PRO must win over its SUNO substring (list order contract)
    assert infer_group_from_path(Path("/d/SUNO_PRO/s.wav")) == "SUNO_PRO"


@pytest.mark.skipif(not REF_NB.exists(), reason="reference notebook absent")
def test_true_peak_dbtp_parity():
    """Formula parity modulo the resampler: the notebook's librosa
    kaiser_best upsample is stubbed with our polyphase resampler on BOTH
    sides, so max/abs/log math and the channel reduction must agree
    bit-for-bit."""
    from types import SimpleNamespace

    from adx_tpu.dataprep.loudness import true_peak_dbtp
    from adx_tpu.ops.audio import resample_poly

    fake_librosa = SimpleNamespace(
        resample=lambda x, orig_sr, target_sr, res_type=None: resample_poly(
            np.asarray(x, np.float32), orig_sr, target_sr
        )
    )
    ref = _load_notebook_defs(
        ["true_peak_dbtp"], extra={"librosa": fake_librosa}
    )["true_peak_dbtp"]
    sr = 22050
    t = np.arange(sr) / sr
    mono = (0.7 * np.sin(2 * np.pi * 997 * t)).astype(np.float32)
    stereo = np.stack([mono, 0.5 * mono])
    for y in (mono, stereo):
        assert true_peak_dbtp(y, sr) == ref(y, sr)
    assert ref(np.zeros(1024, np.float32), sr) == -np.inf
    assert true_peak_dbtp(np.zeros(1024, np.float32), sr) == -np.inf


@pytest.mark.skipif(not REF_NB.exists(), reason="reference notebook absent")
def test_normalize_to_lufs_with_tp_parity():
    """Control-flow parity of the LUFS+TP normalize loop: the reference
    logic is exec'd with OUR meter/TP/limiter primitives injected, so any
    divergence isolates to the orchestration (gain math, limit decisions,
    ±trim threshold, telemetry dict)."""
    from typing import Any

    from adx_tpu.dataprep import loudness as L

    ns = _load_notebook_defs(
        ["normalize_to_lufs_with_tp", "apply_gain", "soft_limiter"],
        extra={
            "Any": Any,
            "integrated_lufs": L.integrated_lufs,
            "to_mono": L.to_mono,
            "true_peak_dbtp": L.true_peak_dbtp,
        },
    )
    ref = ns["normalize_to_lufs_with_tp"]
    sr = 44100
    rng = np.random.default_rng(11)
    t = np.arange(3 * sr) / sr
    # loud near-full-scale content → triggers the limiter branch
    loud = (0.95 * np.sin(2 * np.pi * 220 * t)
            + 0.05 * rng.standard_normal(3 * sr)).astype(np.float64)
    # quiet content → pure-gain branch (+ possible trim)
    quiet = (0.01 * np.sin(2 * np.pi * 330 * t)).astype(np.float64)
    for y, target in ((loud, -14.0), (quiet, -14.0), (loud, -23.0)):
        want_y, want_info = ref(y, sr, target)
        got_y, got_info = L.normalize_to_lufs_with_tp(y, sr, target)
        np.testing.assert_array_equal(got_y, want_y)
        assert set(want_info) <= set(got_info)
        for k in want_info:
            np.testing.assert_allclose(got_info[k], want_info[k], rtol=0,
                                       atol=0)


# ---------------------------------------------------------------------------
# VERDICT r4: the last exec-the-reference numpy/pandas surfaces — the
# predictions-vis metrics table, the occlusion aggregate summary CSV, and the
# compare-across-runs common-key intersection.


def _extract_block(path: Path, start_marker: str, end_marker: str) -> str:
    lines = path.read_text().splitlines()
    start = next(i for i, l in enumerate(lines) if start_marker in l)
    end = next(i for i, l in enumerate(lines[start:], start) if end_marker in l)
    return textwrap.dedent("\n".join(lines[start : end + 1]))


def test_predictions_metrics_table_parity():
    """The performance-table cell values (incl. ':.3f' formatting) against
    the reference's own loop (scripts/run_sonics_pred_vis.py:158-172)."""
    import pandas as pd
    from sklearn.metrics import (
        accuracy_score,
        f1_score,
        precision_score,
        recall_score,
    )

    from adx_tpu.viz.predictions_viz import metrics_table_data

    rng = np.random.default_rng(5)
    rows = []
    for model in ("REAL", "SUNO", "UDIO"):
        for _ in range(13):
            tb = int(rng.integers(-1, 2))  # includes the -1 sentinel rows
            pb = int(rng.integers(-1, 2))
            rows.append({"model": model, "true_binary": tb, "pred_binary": pb})
    df = pd.DataFrame(rows)
    models = ["REAL", "SUNO", "UDIO"]

    block = _extract_block(
        Path("/root/reference/scripts/run_sonics_pred_vis.py"),
        "metrics_data = []",
        "if not metrics_data",
    )
    block = "\n".join(block.splitlines()[:-1])  # drop the trailing `if`
    ns = {
        "df": df, "models": models, "pd": pd,
        "accuracy_score": accuracy_score, "precision_score": precision_score,
        "recall_score": recall_score, "f1_score": f1_score,
    }
    exec(compile(block, "ref_metrics_block", "exec"), ns)
    assert ns["metrics_data"] == metrics_table_data(df, models)


def test_summary_statistics_csv_parity(tmp_path):
    """summary_statistics.csv bytes against the reference's groupby block
    (src/spectrogram_explainability.py:1127-1134)."""
    import pandas as pd

    from adx_tpu.viz.saliency import visualize_aggregate_results

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "folder": ["REAL"] * 5 + ["SUNO"] * 4,
        "mean_importance": rng.normal(0.01, 0.02, 9),
        "max_importance": rng.normal(0.2, 0.05, 9),
        "min_importance": rng.normal(-0.1, 0.05, 9),
        "std_importance": np.abs(rng.normal(0.05, 0.01, 9)),
        "baseline_pred": rng.uniform(0.3, 0.9, 9),
    })
    block = _extract_block(
        REF_SRC / "spectrogram_explainability.py",
        "summary = results_df.groupby",
        ").round(4)",
    )
    ns = {"results_df": df, "pd": pd}
    exec(compile(block, "ref_summary_block", "exec"), ns)
    ns["summary"].to_csv(tmp_path / "want.csv")

    visualize_aggregate_results(df, tmp_path / "out")
    got = (tmp_path / "out" / "summary_statistics.csv").read_text()
    assert got == (tmp_path / "want.csv").read_text()


def _fbp_fixture_tree(root: Path) -> None:
    """Two runs × two models; run B misses one (track, component) so the
    intersection must drop it from BOTH runs."""
    import json as _json

    bands = lambda seed: [
        {"component": "mixture", "low": float(lo), "high": float(hi),
         "importance": round(0.01 * (seed + k), 4),
         "abs_importance": abs(round(0.01 * (seed + k), 4)),
         "type": "POSITIVE" if seed + k >= 0 else "NEGATIVE"}
        for k, (lo, hi) in enumerate([(0, 250), (250, 4000), (4000, 8000)])
    ]
    layout = {
        "minus14/base": {"REAL": ["t1", "t2"], "SUNO": ["t1"]},
        "minus14/resample22k": {"REAL": ["t1"], "SUNO": ["t1"]},
    }
    for run, models in layout.items():
        for m, tracks in models.items():
            for i, tr in enumerate(tracks):
                d = root / run / "FBP" / "bands" / m / tr / "mixture"
                d.mkdir(parents=True)
                (d / f"{tr}_bands_metadata.json").write_text(
                    _json.dumps({"bands": bands(i - 1)})
                )


def test_fbp_runs_intersection_parity(tmp_path):
    """Common-key intersection + run labels of the FBP runs comparison
    against the reference's own loaders
    (scripts/runs_comparision/compare_fbp_results_across_runs.py:60-205)."""
    import json as _json
    import re as _re

    import pandas as pd

    from adx_tpu.viz import runs_compare as rc

    _fbp_fixture_tree(tmp_path)
    roots = [str(tmp_path / "minus14" / "base" / "FBP"),
             str(tmp_path / "minus14" / "resample22k" / "FBP")]

    ns = _load_reference_defs(
        Path("/root/reference/scripts/runs_comparision/"
             "compare_fbp_results_across_runs.py"),
        ["try_num", "extract_run_label", "load_single_fbp_root",
         "load_fbp_bands_for_runs"],
        extra={"pd": pd, "json": _json, "re": _re, "Path": Path,
               "Sequence": list},
    )
    want_df, want_label = ns["load_fbp_bands_for_runs"](roots)
    got_df, got_label = rc.load_fbp_bands_for_runs(roots)

    assert got_label == want_label
    # the intersection dropped REAL/t2 (present only in run A)
    assert "t2" not in set(want_df["track_stem"])
    cols = sorted(set(want_df.columns) & set(got_df.columns))
    want_rows = sorted(map(tuple, want_df[cols].itertuples(index=False)))
    got_rows = sorted(map(tuple, got_df[cols].itertuples(index=False)))
    assert want_rows == got_rows
