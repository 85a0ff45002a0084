"""Driver-contract tests: entry() is jittable, dryrun_multichip executes a
real DP×TP train step on the 8-device CPU mesh."""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft


def test_dryrun_multichip_8(capsys):
    graft.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dryrun_multichip OK" in out
    assert "'data': 4" in out and "'model': 2" in out


def test_dryrun_multichip_odd_device_count():
    graft.dryrun_multichip(3)  # TP degenerates to 1; must still run


def test_entry_lowers_and_compiles():
    fn, args = graft.entry()
    compiled = jax.jit(fn).lower(*args).compile()
    out_info = compiled.out_info
    assert out_info.shape == (2,)
