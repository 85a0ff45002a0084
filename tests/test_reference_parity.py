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


def _load_reference_defs(path: Path, names):
    """Exec only the named top-level defs/assignments from a reference file."""
    src = path.read_text()
    ns = {
        "np": np,
        "Dict": Dict,
        "List": List,
        "Tuple": Tuple,
        "Optional": Optional,
    }
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
    assert pf == ns["patch_freq"]
    assert pt == ns["t_patch"]
    want = np.asarray(ns["patch_positions"], dtype=np.int32)
    assert starts.shape == want.shape
    np.testing.assert_array_equal(starts, want)
    assert len(starts) == ns["t_patches"] * ns["f_patches"]
