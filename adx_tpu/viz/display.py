"""Spectrogram display primitives (librosa.display.specshow replacement).

librosa is not available in this environment, so the axis conventions the
reference relies on (``x_axis='time'``, ``y_axis='hz'|'mel'``) are
re-implemented on plain ``imshow``: identical data orientation
(origin='lower'), time in seconds from the hop length, linear-Hz or
mel-scaled frequency tick labeling.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from adx_tpu.ops.mel import hz_to_mel, mel_to_hz

# Column budget for DISPLAY-ONLY decimation of wide spectrogram/saliency
# arrays. 5400 = the widest figure in the repo (18 in) × the highest save
# dpi (300) — every axes raster is strictly narrower, so the Agg renderer
# was going to nearest-downsample past this anyway; pre-decimating just
# moves the (identical-policy) nearest pick before the O(cells) colormap
# pass. A 120 s track is 10,336 frames → ~1.9× fewer cells per panel,
# measured 3× on the FBP 4-panel figure. Values plotted are real data
# columns (subsampling, never averaging); stats/masks stay full-res at the
# call sites. Opt out with ADX_TPU_DISPLAY_MAX_COLS=0.
_DISPLAY_MAX_COLS_DEFAULT = 5400


def _max_cols(max_cols: Optional[int]) -> int:
    """Resolve the display column budget: explicit arg, else the
    ``ADX_TPU_DISPLAY_MAX_COLS`` env knob, else the raster-width default.
    Single owner so image and waveform decimation always read the same
    budget."""
    if max_cols is not None:
        return max_cols
    try:
        return int(os.environ.get("ADX_TPU_DISPLAY_MAX_COLS",
                                  _DISPLAY_MAX_COLS_DEFAULT))
    except ValueError:
        return _DISPLAY_MAX_COLS_DEFAULT


def display_col_index(n_time: int, max_cols: Optional[int] = None) -> Optional[np.ndarray]:
    """Column subsample index for display-only decimation, or ``None``.

    Returns ``None`` when no decimation is needed (``n_time`` within
    budget) or it is disabled (``ADX_TPU_DISPLAY_MAX_COLS=0``). The index
    samples at output-pixel centers (``floor((i+0.5)·n/m)``), the same
    nearest-neighbor policy Agg applies when rasterizing, so each rendered
    pixel still shows a real data column."""
    mc = _max_cols(max_cols)
    if mc <= 0 or n_time <= mc:
        return None
    idx = np.floor((np.arange(mc) + 0.5) * (n_time / mc)).astype(int)
    return np.minimum(idx, n_time - 1)


def envelope_decimate(times, values, max_bins: Optional[int] = None):
    """Min/max envelope decimation for waveform LINE plots.

    A line plot of N ≫ raster-width samples paints, per pixel column,
    exactly the vertical span [min, max] of the samples in that column —
    so emitting two points (bin-min, bin-max) per column reproduces the
    rendered envelope while cutting a 5.3M-point 120 s waveform to ~11k
    points (plot time seconds → milliseconds). Within-column stroke
    density under alpha blending differs slightly; same knob as the image
    decimation (``ADX_TPU_DISPLAY_MAX_COLS``, 0 disables).

    Returns ``(times', values')`` — the inputs unchanged when short
    enough or disabled."""
    values = np.asarray(values)
    times = np.asarray(times)
    n = values.shape[-1]
    mc = _max_cols(max_bins)
    if mc <= 0 or values.ndim != 1 or n <= 2 * mc or len(times) != n:
        return times, values
    edges = np.floor(np.arange(mc + 1) * (n / mc)).astype(int)
    edges[-1] = n
    starts = edges[:-1]
    vmin = np.minimum.reduceat(values, starts)
    vmax = np.maximum.reduceat(values, starts)
    # min first then max per bin: the polyline zig-zags through each
    # column's full span, exactly the ink a full-resolution plot leaves
    t_bin = times[np.minimum(starts + (np.diff(edges) // 2), n - 1)]
    out_t = np.repeat(t_bin, 2)
    out_v = np.empty(2 * mc, values.dtype)
    out_v[0::2] = vmin
    out_v[1::2] = vmax
    return out_t, out_v


def specshow(
    data: np.ndarray,
    sr: int = 44100,
    hop_length: int = 512,
    x_axis: Optional[str] = "time",
    y_axis: Optional[str] = "hz",
    ax=None,
    cmap: str = "viridis",
    vmin: Optional[float] = None,
    vmax: Optional[float] = None,
    alpha=None,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
):
    """imshow with librosa.specshow-compatible axes; returns the image."""
    import matplotlib.pyplot as plt

    if ax is None:
        ax = plt.gca()
    n_freq, n_time = data.shape
    # time extent from the ORIGINAL frame count — display decimation below
    # must not change the axes coordinates
    t_max = n_time * hop_length / sr
    dec = display_col_index(n_time)
    if dec is not None:
        data = np.asarray(data)[:, dec]
        if isinstance(alpha, np.ndarray) and alpha.ndim == 2:
            alpha = alpha[:, dec]
        n_time = data.shape[1]

    if y_axis == "log":
        # librosa's y_axis='log': linear bin frequencies on a base-2 symlog
        # scale (specshow decorates with scale='symlog', base=2,
        # linthresh=first positive bin) — pcolormesh handles the non-linear
        # cell heights
        freq_edges = np.linspace(0.0, sr / 2.0, n_freq + 1)
        time_edges = np.linspace(0.0, t_max, n_time + 1)
        img = ax.pcolormesh(time_edges, freq_edges, data, cmap=cmap,
                            vmin=vmin, vmax=vmax, alpha=alpha)
        ax.set_yscale("symlog", base=2,
                      linthresh=float(freq_edges[1]) if n_freq > 1 else 1.0)
        ax.set_ylim(0.0, sr / 2.0)
        if x_axis == "time":
            ax.set_xlabel("Time")
        return img

    extent = [0.0, t_max, 0.0, float(n_freq)]
    if y_axis == "hz":
        extent[3] = sr / 2.0
    img = ax.imshow(
        data,
        aspect="auto",
        origin="lower",
        cmap=cmap,
        vmin=vmin,
        vmax=vmax,
        alpha=alpha,
        extent=extent,
        interpolation="nearest",
    )
    if x_axis == "time":
        ax.set_xlabel("Time")
    if y_axis == "mel":
        # mel-spaced tick labels on the bin axis, like librosa's mel axis
        fmax = fmax if fmax is not None else sr / 2.0
        mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_freq)
        hz = mel_to_hz(mels)
        ticks_hz = [512, 1024, 2048, 4096, 8192, 16384]
        tick_bins = [float(np.argmin(np.abs(hz - f))) for f in ticks_hz if f < fmax]
        ax.set_yticks(tick_bins)
        ax.set_yticklabels([str(f) for f in ticks_hz if f < fmax])
    return img
