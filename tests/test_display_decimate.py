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


class TestEnvelopeDecimate:
    def test_short_passthrough(self):
        from adx_tpu.viz.display import envelope_decimate
        t = np.arange(100) / 10.0
        v = np.sin(t)
        t2, v2 = envelope_decimate(t, v, max_bins=200)
        assert t2 is t and v2 is v

    def test_envelope_preserved(self):
        from adx_tpu.viz.display import envelope_decimate
        rng = np.random.default_rng(0)
        v = rng.standard_normal(1_000_000).astype(np.float32)
        t = np.arange(len(v)) / 44100.0
        t2, v2 = envelope_decimate(t, v, max_bins=1000)
        assert len(v2) == 2000 and len(t2) == 2000
        # global extremes survive exactly
        assert v2.min() == v.min() and v2.max() == v.max()
        # per-bin spans cover the true spans
        edges = np.floor(np.arange(1001) * (len(v) / 1000)).astype(int)
        edges[-1] = len(v)
        for k in [0, 1, 499, 999]:
            seg = v[edges[k]:edges[k + 1]]
            assert v2[2 * k] == seg.min() and v2[2 * k + 1] == seg.max()
        # times monotone non-decreasing
        assert np.all(np.diff(t2) >= 0)

    def test_env_disable(self, monkeypatch):
        from adx_tpu.viz.display import envelope_decimate
        monkeypatch.setenv("ADX_TPU_DISPLAY_MAX_COLS", "0")
        v = np.zeros(100_000); t = np.arange(len(v), dtype=float)
        t2, v2 = envelope_decimate(t, v)
        assert len(v2) == len(v)

    def test_mismatched_times_passthrough(self):
        from adx_tpu.viz.display import envelope_decimate
        v = np.zeros(100_000); t = np.arange(10, dtype=float)
        t2, v2 = envelope_decimate(t, v, max_bins=100)
        assert v2 is v  # defensive: never silently misalign

    def test_waveform_overlay_plot_fast_and_written(self, tmp_path):
        import time as _time
        from adx_tpu.viz.lime_viz import plot_waveforms_overlay_with_influences
        rng = np.random.default_rng(0)
        n = 44100 * 30
        audio = rng.standard_normal(n).astype(np.float32) * 0.1
        comps = [rng.standard_normal(n).astype(np.float32) * 0.05 for _ in range(4)]
        names = ["vocals0", "drums0", "bass0", "other0"]
        t0 = _time.time()
        plot_waveforms_overlay_with_influences(
            audio, comps, names, {c: 0.1 for c in names}, 44100, tmp_path, prefix="p")
        dt = _time.time() - t0
        assert (tmp_path / "p_waveforms_overlay_influences.png").exists()
        assert dt < 20, dt  # full-res was ~28 s for 120 s on this host
