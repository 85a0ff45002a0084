"""Track-level DP across hosts (SURVEY.md §2.6(c)): shard selection is
disjoint/covering, a sharded FBP sweep merges to the single-host result,
and the merge tool applies the right policy per result family."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from adx_tpu.explainers.fbp import FrequencyBandPerturbation
from adx_tpu.io.audio_io import write_wav
from adx_tpu.parallel.host_shard import host_shard
from adx_tpu.predict import LocalSonics

REPO = Path(__file__).resolve().parents[1]
SR = 8000


# ---- unit: shard arithmetic -------------------------------------------------

@pytest.mark.parametrize("n_items", [0, 1, 5, 8, 13])
@pytest.mark.parametrize("num_shards", [1, 2, 3, 5])
def test_shards_disjoint_and_covering(n_items, num_shards):
    items = [f"f{i}" for i in range(n_items)]
    shards = [host_shard(items, i, num_shards) for i in range(num_shards)]
    merged = [x for s in shards for x in s]
    assert sorted(merged) == sorted(items)
    assert len(merged) == len(set(merged)) == n_items
    # round-robin balance: sizes differ by at most 1
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1


def test_shard_validation():
    with pytest.raises(ValueError):
        host_shard([1], 0, 0)
    with pytest.raises(ValueError):
        host_shard([1], 2, 2)
    with pytest.raises(ValueError):
        host_shard([1], -1, 2)
    assert host_shard([1, 2], 0, 1) == [1, 2]


# ---- e2e: sharded FBP sweep == single-host sweep ----------------------------

@pytest.fixture(scope="module")
def predictor():
    return LocalSonics.from_pretrained("tiny", max_batch=8)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ShardMini")
    rng = np.random.default_rng(7)
    n = SR // 2
    t = np.arange(n) / SR
    for model in ["REAL", "SUNO"]:
        for i in range(3):
            y = 0.4 * np.sin(2 * np.pi * (250 + 150 * i) * t) + 0.05 * rng.standard_normal(n)
            write_wav(root / model / f"track_{i}.wav", y.astype(np.float32), SR)
    return root


def make_fbp(predictor, tmp):
    return FrequencyBandPerturbation(
        predictor=predictor,
        preset="default",
        presets={"default": [(100, 500), (500, 1500)]},
        attenuation=0.25,
        transition_mode="abs",
        transition_hz=50.0,
        sr=SR,
        duration=predictor.cfg.audio.duration,
        n_fft=256,
        hop_length=128,
        win_length=256,
        spec_type="stft",
        normalize_loudness=True,
        checkpoint_dir=tmp / "checkpoints",
    )


def test_sharded_fbp_merges_to_single_host_result(predictor, dataset, tmp_path):
    # single-host reference run
    single_out = tmp_path / "single"
    make_fbp(predictor, tmp_path / "cp_single").run_experiment(
        base_path=dataset, output_dir=single_out,
        results_path=single_out / "fbp_results.json",
    )
    single = json.loads((single_out / "fbp_results.json").read_text())

    # two-shard run: disjoint slices, separate output trees
    shard_files = []
    for shard in range(2):
        out = tmp_path / f"shard{shard}"
        df = make_fbp(predictor, tmp_path / f"cp{shard}").run_experiment(
            base_path=dataset, output_dir=out,
            results_path=out / "fbp_results.json",
            shard_index=shard, num_shards=2,
        )
        # round-robin over 3 files/folder: shard 0 gets 2 per folder, shard 1 gets 1
        assert len(df) == (4 if shard == 0 else 2)
        shard_files.append(out / "fbp_results.json")

    # shards are disjoint
    s0, s1 = (json.loads(p.read_text()) for p in shard_files)
    for model in single:
        assert not (set(s0.get(model, {})) & set(s1.get(model, {})))

    # merge via the CLI tool → identical dict to the single-host run
    merged_path = tmp_path / "merged.json"
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "merge_results.py"),
         str(merged_path)] + [str(p) for p in shard_files],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr
    assert "policy: results" in proc.stdout
    merged = json.loads(merged_path.read_text())
    assert merged == single


# ---- merge tool: policy inference + non-destructive explanations merge ------

def test_merge_tool_explanations_policy(tmp_path):
    full = {
        "SUNO": {
            "t0": {"type": "full_track",
                   "explanations": {"component_influences": {"vocals0": 0.4}}},
        }
    }
    empty = {
        "SUNO": {
            "t0": {"type": "full_track",
                   "explanations": {"component_influences": {}}},
            "t1": {"type": "full_track",
                   "explanations": {"component_influences": {"drums0": -0.2}}},
        }
    }
    a = tmp_path / "explanations_shard0.json"
    b = tmp_path / "explanations_shard1.json"
    a.write_text(json.dumps(full))
    b.write_text(json.dumps(empty))
    out = tmp_path / "explanations.json"
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "merge_results.py"),
         str(out), str(a), str(b)],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr
    assert "policy: explanations" in proc.stdout
    merged = json.loads(out.read_text())
    # non-empty entry from shard 0 survives the empty one from shard 1
    assert merged["SUNO"]["t0"]["explanations"]["component_influences"] == {"vocals0": 0.4}
    assert merged["SUNO"]["t1"]["explanations"]["component_influences"] == {"drums0": -0.2}
