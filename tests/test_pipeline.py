"""One-process pipeline orchestrator test: two stages chained in-process
share one predictor (scripts/run_full_pipeline.py).

The reference chains separate CLI processes (readme.md:60-126); on
tunneled TPU runtimes each process pays minutes of backend boot, so the
orchestrator exists to run the same stage scripts in one process."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

from adx_tpu.io.audio_io import write_wav

SR = 8000
ROOT = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("PipelineMini")
    rng = np.random.default_rng(0)
    n = SR // 2
    t = np.arange(n) / SR
    for model in ["REAL", "SUNO"]:
        for i in range(2):
            y = 0.4 * np.sin(2 * np.pi * (300 + 200 * i) * t) + 0.05 * rng.standard_normal(n)
            write_wav(root / model / f"track_{i}.wav", y.astype(np.float32), SR)
    return root


def test_pipeline_two_stages_share_predictor(dataset, tmp_path, monkeypatch):
    model_cfg = {"local": True, "local_model": "tiny", "max_batch": 8}
    pred_cfg = {
        "dataset": {"dataset_path": str(dataset), "sample_rate": SR},
        "model": model_cfg,
        "output": {"result_path": str(tmp_path / "preds"), "experiment_name": "P"},
    }
    fbp_cfg = {
        "dataset": {
            "base_path": str(dataset),
            "models_to_process": ["REAL", "SUNO"],
            "max_samples_per_model": 2,
        },
        "model": model_cfg,
        "bands": {
            "preset": "default",
            "attenuation": 0.25,
            "transition": {"mode": "abs", "hz": 50.0},
            "presets": {"default": [[100, 500], [500, 1500], [1500, 3000]]},
        },
        "spectrogram": {
            "sr": SR, "duration": 1, "n_fft": 256, "hop_length": 128,
            "win_length": 256, "spec_type": "stft",
        },
        "explainability": {"use_separation": False, "normalize_loudness": False},
        "output": {"result_path": str(tmp_path / "fbp"), "experiment_name": "F"},
        "checkpoint": {"enabled": False},
    }
    (tmp_path / "pred.yaml").write_text(yaml.safe_dump(pred_cfg))
    (tmp_path / "fbp.yaml").write_text(yaml.safe_dump(fbp_cfg))
    pipeline = {
        "stages": [
            {"name": "predictions", "script": "scripts/run_sonics_predictions.py",
             "config": str(tmp_path / "pred.yaml")},
            {"name": "fbp", "script": "scripts/experiments/run_FBP_experiment.py",
             "config": str(tmp_path / "fbp.yaml"), "args": ["--no-checkpoint"]},
        ]
    }
    (tmp_path / "pipeline.yaml").write_text(yaml.safe_dump(pipeline))

    import adx_tpu.io.config as ioc

    builds = []
    real_from_pretrained = None
    from adx_tpu.predict import LocalSonics

    real_from_pretrained = LocalSonics.from_pretrained.__func__

    def counting(cls, *a, **k):
        builds.append(a)
        return real_from_pretrained(cls, *a, **k)

    monkeypatch.setattr(LocalSonics, "from_pretrained", classmethod(counting))
    monkeypatch.setattr(ioc, "_PREDICTOR_CACHE", {})

    sys.path.insert(0, str(ROOT / "scripts"))
    import importlib

    mod = importlib.import_module("run_full_pipeline")
    monkeypatch.setattr(
        sys, "argv", ["run_full_pipeline.py", "--config", str(tmp_path / "pipeline.yaml")]
    )
    mod.main()

    # both stages produced their reference-schema outputs
    preds = json.loads(
        next((tmp_path / "preds" / "P").rglob("predictions.json")).read_text()
    )
    assert set(preds) == {"REAL", "SUNO"}
    results = json.loads((tmp_path / "fbp" / "F" / "fbp_results.json").read_text())
    assert set(results) == {"REAL", "SUNO"}

    # the model was loaded ONCE and shared across stages
    assert len(builds) == 1

    # a typo'd --from-stage must error, not silently skip every stage
    monkeypatch.setattr(
        sys, "argv",
        ["run_full_pipeline.py", "--config", str(tmp_path / "pipeline.yaml"),
         "--from-stage", "no_such_stage"],
    )
    with pytest.raises(SystemExit) as ei:
        mod.main()
    assert ei.value.code == 1

    # a tolerated exit code with a missing expected artifact is a failure
    pipeline["stages"][1]["allow_exit_codes"] = [0, 1]
    pipeline["stages"][1]["expect_glob"] = str(tmp_path / "does_not_exist" / "*.wav")
    (tmp_path / "pipeline.yaml").write_text(yaml.safe_dump(pipeline))
    monkeypatch.setattr(
        sys, "argv", ["run_full_pipeline.py", "--config", str(tmp_path / "pipeline.yaml")]
    )
    with pytest.raises(SystemExit) as ei:
        mod.main()
    assert ei.value.code == 1


def test_pipeline_skip_vis_and_only_vis(tmp_path, monkeypatch):
    """--skip-vis runs only the results stages (VERDICT r2 item 4: the vis
    stages are pure post-processing, and matplotlib on the 1-core host is
    the measured largest cost of a sweep); --only-vis renders them later.
    Vis-ness comes from `kind: vis` or a 'vis' script-name fallback."""
    results_py = tmp_path / "make_results.py"
    results_py.write_text(
        "import pathlib, sys\n"
        f"pathlib.Path(r'{tmp_path}/results.json').write_text('{{}}')\n"
    )
    vis_py = tmp_path / "render_vis.py"  # 'vis' in the stem → inferred vis
    vis_py.write_text(
        "import pathlib\n"
        f"pathlib.Path(r'{tmp_path}/plot.png').write_text('png')\n"
    )
    tagged_py = tmp_path / "render_tagged.py"  # vis-ness only via kind:
    tagged_py.write_text(
        "import pathlib\n"
        f"pathlib.Path(r'{tmp_path}/tagged.png').write_text('png')\n"
    )
    pipeline = {
        "stages": [
            {"name": "results", "script": str(results_py)},
            {"name": "vis", "script": str(vis_py)},
            {"name": "tagged_vis", "script": str(tagged_py), "kind": "vis"},
        ]
    }
    cfg = tmp_path / "pipeline.yaml"
    cfg.write_text(yaml.safe_dump(pipeline))

    sys.path.insert(0, str(ROOT / "scripts"))
    import importlib

    mod = importlib.import_module("run_full_pipeline")

    monkeypatch.setattr(
        sys, "argv", ["run_full_pipeline.py", "--config", str(cfg), "--skip-vis"]
    )
    mod.main()
    assert (tmp_path / "results.json").exists()
    assert not (tmp_path / "plot.png").exists()
    assert not (tmp_path / "tagged.png").exists()

    (tmp_path / "results.json").unlink()
    monkeypatch.setattr(
        sys, "argv", ["run_full_pipeline.py", "--config", str(cfg), "--only-vis"]
    )
    mod.main()
    assert not (tmp_path / "results.json").exists()
    assert (tmp_path / "plot.png").exists()
    assert (tmp_path / "tagged.png").exists()

    monkeypatch.setattr(
        sys, "argv",
        ["run_full_pipeline.py", "--config", str(cfg), "--skip-vis", "--only-vis"],
    )
    with pytest.raises(SystemExit) as ei:
        mod.main()
    assert ei.value.code == 2


def _pipeline_mod():
    sys.path.insert(0, str(ROOT / "scripts"))
    import importlib

    return importlib.import_module("run_full_pipeline")


def test_run_stage_normalizes_keyboard_interrupt_to_130(tmp_path):
    """Most stage runners don't convert Ctrl+C themselves (and even the ones
    that do can be interrupted during predictor boot, outside their try):
    run_stage must normalize KeyboardInterrupt to rc=130 so the chain's
    interrupt-abort contract holds for every stage."""
    script = tmp_path / "boom.py"
    script.write_text("raise KeyboardInterrupt\n")
    rc, _secs = _pipeline_mod().run_stage(str(script), [])
    assert rc == 130


def test_run_stage_prints_string_systemexit_payload(tmp_path, capsys):
    """`raise SystemExit("msg")` exits 1 with the message on stderr under a
    normal interpreter; run_stage must not swallow the diagnostic."""
    script = tmp_path / "exit_msg.py"
    script.write_text("raise SystemExit('dataset tree is empty!')\n")
    rc, _secs = _pipeline_mod().run_stage(str(script), [])
    assert rc == 1
    assert "dataset tree is empty!" in capsys.readouterr().err


def test_expect_glob_resolves_against_cwd_and_warns_on_stale(tmp_path, monkeypatch, capsys):
    """Stage scripts mkdir their relative result_path against the CWD, so
    the expect_glob artifact check must look there too; and artifacts that
    all predate the stage start get a staleness warning (checkpoint resume
    makes them legitimate, so it is a warning, not a failure)."""
    import os
    import time as _time

    mod = _pipeline_mod()
    work = tmp_path / "work"
    work.mkdir()
    stage_py = tmp_path / "writes_relative.py"
    stage_py.write_text(
        "import pathlib\n"
        "pathlib.Path('out').mkdir(exist_ok=True)\n"
        "pathlib.Path('out/results.json').write_text('{}')\n"
    )
    noop_py = tmp_path / "noop.py"
    noop_py.write_text("pass\n")
    cfg = tmp_path / "pipeline.yaml"
    cfg.write_text(yaml.safe_dump({"stages": [
        {"name": "writes", "script": str(stage_py), "expect_glob": "out/*.json"},
    ]}))
    monkeypatch.chdir(work)
    monkeypatch.setattr(sys, "argv", ["run_full_pipeline.py", "--config", str(cfg)])
    mod.main()  # no SystemExit: the CWD-relative artifact was found
    assert (work / "out" / "results.json").exists()
    assert "predate" not in capsys.readouterr().out

    # second pipeline whose stage produces nothing — the stale artifact from
    # the first run still matches, and must be called out
    old = work / "out" / "results.json"
    past = _time.time() - 60
    os.utime(old, (past, past))
    cfg.write_text(yaml.safe_dump({"stages": [
        {"name": "noop", "script": str(noop_py), "expect_glob": "out/*.json"},
    ]}))
    mod.main()
    assert "predate" in capsys.readouterr().out
