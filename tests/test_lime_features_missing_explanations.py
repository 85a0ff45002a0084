"""run_lime_features.py with no explanations.json (the audio-save arm's
layout) must write importance: null / component_type UNKNOWN instead of
fabricating 0.0/POSITIVE rows indistinguishable from real zeros (ADVICE r3).
Reference: scripts/feature_extraction/run_lime_features.py (which requires
explanations and would crash — deviate where broken)."""

import json
import sys
from pathlib import Path

import numpy as np
import yaml

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / "scripts" / "feature_extraction"))


def test_missing_explanations_writes_null_importance(tmp_path, monkeypatch):
    from adx_tpu.io.audio_io import write_wav

    sr = 22050
    comp_dir = (tmp_path / "lime" / "full_track" / "REAL" / "t1"
                / "separated_components")
    comp_dir.mkdir(parents=True)
    t = np.arange(sr // 2) / sr
    write_wav(comp_dir / "vocals0.wav",
              (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)

    cfg = {
        "dataset": {"lime_result_path": str(tmp_path / "lime")},
        "output": {"result_path": str(tmp_path / "feat")},
        "audio": {"samplerate": sr},
        "lime_comp_features": {"components": ["vocals0"],
                               "version": "separated"},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    import importlib

    mod = importlib.import_module("run_lime_features")
    monkeypatch.setattr(sys, "argv",
                        ["run_lime_features.py", "--config", str(cfg_path)])
    mod.main()

    out = json.loads((tmp_path / "feat" / "separated_components"
                      / "audiolime_component_features.json").read_text())
    meta = out["REAL"]["t1"]["components"]["vocals0"]["component_meta"]
    assert meta["importance"] is None
    assert meta["abs_importance"] is None
    assert meta["component_type"] == "UNKNOWN"
    # the features block carries the same null (not a fabricated 0.0)
    assert out["REAL"]["t1"]["components"]["vocals0"]["features"]["importance"] is None
