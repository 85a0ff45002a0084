"""Display-only column decimation (`viz/display.py::display_col_index`).

Wide spectrogram/saliency arrays are nearest-subsampled to the maximum
raster width before the O(cells) colormap pass; axes coordinates, stats
boxes, and masks must be unaffected (they are computed full-res at the
call sites). Opt-out: ADX_TPU_DISPLAY_MAX_COLS=0."""

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pytest

from adx_tpu.viz.display import display_col_index, specshow


def test_no_decimation_when_narrow():
    assert display_col_index(100) is None
    assert display_col_index(5400) is None


def test_decimation_when_wide():
    idx = display_col_index(10336)
    assert idx is not None
    assert len(idx) == 5400
    assert idx[0] >= 0 and idx[-1] <= 10335
    assert np.all(np.diff(idx) >= 1)  # strictly increasing (n < 2*max_cols)


def test_pixel_center_sampling_policy():
    # floor((i+0.5)*n/m): first pick is near the first output pixel's
    # center, not 0 — matches Agg's nearest policy
    idx = display_col_index(20000, max_cols=10)
    assert list(idx) == [int((i + 0.5) * 2000) for i in range(10)]


def test_env_optout(monkeypatch):
    monkeypatch.setenv("ADX_TPU_DISPLAY_MAX_COLS", "0")
    assert display_col_index(10336) is None


def test_env_override(monkeypatch):
    monkeypatch.setenv("ADX_TPU_DISPLAY_MAX_COLS", "100")
    idx = display_col_index(10336)
    assert len(idx) == 100


def test_explicit_max_cols_beats_env(monkeypatch):
    monkeypatch.setenv("ADX_TPU_DISPLAY_MAX_COLS", "0")
    assert len(display_col_index(10336, max_cols=64)) == 64


def test_specshow_decimates_but_keeps_time_extent(monkeypatch):
    monkeypatch.setenv("ADX_TPU_DISPLAY_MAX_COLS", "128")
    data = np.random.default_rng(0).standard_normal((17, 1000)).astype(np.float32)
    fig, ax = plt.subplots()
    img = specshow(data, sr=1000, hop_length=10, ax=ax)
    # shown array is decimated ...
    assert img.get_array().shape == (17, 128)
    # ... but the time extent still spans the ORIGINAL n_time frames
    assert img.get_extent()[1] == pytest.approx(1000 * 10 / 1000)
    plt.close(fig)


def test_specshow_decimates_2d_alpha_alongside(monkeypatch):
    monkeypatch.setenv("ADX_TPU_DISPLAY_MAX_COLS", "64")
    data = np.zeros((5, 500), np.float32)
    alpha = np.linspace(0, 1, 5 * 500).reshape(5, 500)
    fig, ax = plt.subplots()
    img = specshow(data, sr=100, hop_length=1, ax=ax, alpha=alpha)
    assert img.get_alpha().shape == (5, 64)
    plt.close(fig)


def test_specshow_log_axis_decimated_edges_span_tmax(monkeypatch):
    monkeypatch.setenv("ADX_TPU_DISPLAY_MAX_COLS", "64")
    data = np.zeros((9, 500), np.float32)
    fig, ax = plt.subplots()
    specshow(data, sr=100, hop_length=2, ax=ax, y_axis="log")
    assert ax.get_xlim()[1] == pytest.approx(500 * 2 / 100)
    plt.close(fig)


def test_fbp_saliency_stats_and_coords_are_full_res(tmp_path, monkeypatch):
    """The figure's stats box and axes coordinates come from the FULL map
    even when the displayed array is decimated."""
    from adx_tpu.viz.saliency import visualize_fbp_saliency

    rng = np.random.default_rng(1)
    imp = rng.standard_normal((33, 700)).astype(np.float32)
    sdb = rng.standard_normal((33, 700)).astype(np.float32) * 10 - 40

    texts = {}
    xlims = {}
    real_savefig = plt.savefig

    def capture(path, **kw):
        fig = plt.gcf()
        ax3 = fig.axes[-1] if not fig.axes[-1].get_label() else fig.axes[3]
        # grab the stats text + panel-2 x-limits before close
        texts[str(path)] = [t.get_text() for a in fig.axes for t in a.texts]
        xlims[str(path)] = fig.axes[1].get_xlim()
        real_savefig(path, **kw)

    monkeypatch.setattr(plt, "savefig", capture)
    monkeypatch.setenv("ADX_TPU_DISPLAY_MAX_COLS", "0")
    visualize_fbp_saliency(imp, sdb, str(tmp_path / "full.png"), "t",
                           sr=44100, hop_length=512, dpi=40)
    monkeypatch.setenv("ADX_TPU_DISPLAY_MAX_COLS", "96")
    visualize_fbp_saliency(imp, sdb, str(tmp_path / "dec.png"), "t",
                           sr=44100, hop_length=512, dpi=40)

    assert texts[str(tmp_path / "full.png")] == texts[str(tmp_path / "dec.png")]
    assert xlims[str(tmp_path / "full.png")] == pytest.approx(
        xlims[str(tmp_path / "dec.png")])
    assert (tmp_path / "dec.png").exists()
