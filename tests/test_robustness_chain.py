"""Degradation-robustness chain test (scripts/run_robustness_chain.py):
dataprep → per-run sweeps → the four cross-run comparisons, in one process
on the CPU mesh with the tiny model.

This is the reference's systemic sanity-check workflow (SURVEY.md §4.2);
the chain driver exercises the REAL CLI runners and the run-label path
taxonomy end-to-end (compare_*_across_runs.py common-key intersections).
"""

import json
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_robustness_chain_end_to_end(tmp_path, monkeypatch):
    sys.path.insert(0, str(ROOT / "scripts"))
    import importlib

    mod = importlib.import_module("run_robustness_chain")
    out = tmp_path / "chain"
    monkeypatch.setattr(sys, "argv", [
        "run_robustness_chain.py",
        "--out-root", str(out),
        "--models", "REAL", "SUNO",
        "--tracks-per-model", "1",
        "--track-seconds", "2.0",
        "--sr", "22050",
        "--local-model", "tiny",
        "--arms", "resample22k",
        "--lufs", "14",
        "--num-samples-lime", "40",
        "--patch-time-frames", "16",
    ])
    mod.main()  # exits non-zero (SystemExit) on any missing artifact

    # the two runs (base + resample22k) produced all four result families
    for arm in ("base", "resample22k"):
        preds = json.loads(
            (out / "results" / "Predictions" / "minus14" / arm /
             "Sonics_predictions" / "full_track" / "predictions.json").read_text()
        )
        assert set(preds) == {"REAL", "SUNO"}
        fbp = json.loads(
            (out / "results" / "FBP" / "minus14" / arm / "FBP_chain" /
             "fbp_results.json").read_text()
        )
        assert set(fbp) == {"REAL", "SUNO"}
        lime = json.loads(
            (out / "results" / "AudioLIME" / "minus14" / arm / "LIME_chain" /
             "full_track" / "explanations.json").read_text()
        )
        # records nest the per-sample payload under "explanations"
        # (io/results.py merge schema)
        assert all(
            rec["explanations"]["component_influences"]
            for model in lime.values() for rec in model.values()
        )

    # every comparison family rendered at least one plot, under a dir named
    # by the joined run labels. NOTE the reference's asymmetric label quirk:
    # the resample22k arm's label is "m14_resample_22k" (underscore), see
    # compare_fbp_results_across_runs.py run-label parsing.
    for fam in ("Predictions", "FBP", "Occlusion", "AudioLIME"):
        pngs = list((out / "comparison" / fam).rglob("*.png"))
        assert pngs, fam
        assert any("m14_base" in str(p) and "m14_resample_22k" in str(p)
                   for p in pngs), (fam, pngs[:3])


def _chain_argv(out, **overrides):
    argv = [
        "run_robustness_chain.py",
        "--out-root", str(out),
        "--models", "REAL", "SUNO",
        "--tracks-per-model", "2",
        "--track-seconds", "1.0",
        "--sr", "22050",
        "--arms", "resample22k",
        "--lufs", "14",
    ]
    for flag, vals in overrides.items():
        argv += [flag, *map(str, vals)]
    return argv


def _run_chain(monkeypatch, argv):
    sys.path.insert(0, str(ROOT / "scripts"))
    import importlib

    mod = importlib.import_module("run_robustness_chain")
    monkeypatch.setattr(sys, "argv", argv)
    mod.main()


def test_chain_fails_fast_on_unknown_model_even_with_dataset(tmp_path, monkeypatch):
    """dataprep re-buckets EVERY input via infer_group_from_path, so an
    unknown --models entry vanishes from the sweeps even when the dataset
    is user-supplied — the guard must not be bypassed by --dataset."""
    argv = _chain_argv(tmp_path / "chain", **{"--dataset": [tmp_path / "ds"]})
    argv[argv.index("SUNO")] = "MYGEN"
    with pytest.raises(SystemExit) as ei:
        _run_chain(monkeypatch, argv)
    assert ei.value.code == 2


def test_chain_fails_fast_on_group_keyword_in_out_root(tmp_path, monkeypatch):
    """Group keywords match substrings of the FULL path (reference parity),
    so /…/real/… in the out-root re-buckets every track to REAL."""
    with pytest.raises(SystemExit) as ei:
        _run_chain(monkeypatch, _chain_argv(tmp_path / "real" / "robust"))
    assert ei.value.code == 2


def test_chain_fails_fast_on_group_keyword_in_dataset_path(tmp_path, monkeypatch):
    """dataprep buckets by SOURCE path — a keyword in a user --dataset path
    (e.g. /mnt/real/music) silently re-buckets every track, even when the
    out-root itself is clean (ADVICE r3 medium)."""
    ds = tmp_path / "real" / "music"
    (ds / "REAL").mkdir(parents=True)
    (ds / "SUNO").mkdir(parents=True)
    argv = _chain_argv(tmp_path / "chain", **{"--dataset": [ds]})
    with pytest.raises(SystemExit) as ei:
        _run_chain(monkeypatch, argv)
    assert ei.value.code == 2


def test_chain_fails_fast_on_partial_source_dataset(tmp_path, monkeypatch):
    """A chain killed mid-synthesis leaves a partial source tree; a rerun
    must not silently sweep the incomplete dataset (2 models × 2 tracks
    expected, only 1 WAV present)."""
    out = tmp_path / "chain"
    src = out / "source_dataset" / "REAL"
    src.mkdir(parents=True)
    (src / "track_0.wav").write_bytes(b"RIFF")
    with pytest.raises(SystemExit) as ei:
        _run_chain(monkeypatch, _chain_argv(out))
    assert ei.value.code == 2
