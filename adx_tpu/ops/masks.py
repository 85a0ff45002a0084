"""Mask construction for all explainer families.

The reference builds one mask at a time inside serial loops
(band loop: src/dsp_band_ops.py:573-653; patch loop:
src/spectrogram_explainability.py:665-703; RISE loop: :766-791; LIME's 500
masked recombinations inside audioLIME). Here each family produces the whole
mask *batch* up front:

* FBP      → ``[B, F]`` band gain rows (smooth raised-cosine edges),
* occlusion→ a static patch grid (coordinates; applied via
             ``dynamic_update_slice`` inside the engine so the ``[P, F, T]``
             tensor never materializes),
* RISE     → Bernoulli ``[M, F, T]`` masks from ``jax.random`` (chunked),
* LIME     → binary ``[N, S]`` stem on/off rows.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def smooth_band_keep_mask(
    freqs: jnp.ndarray, low: float, high: float, trans: float = 200.0
) -> jnp.ndarray:
    """Keep-mask: 1 outside ``[low, high]``, 0 inside, raised-cosine
    transitions of width ``trans`` Hz on both edges.

    Bit-matches the reference's ``smooth_band_keep_mask``
    (src/dsp_band_ops.py:236-259) on shared inputs.
    """
    f = jnp.asarray(freqs, dtype=jnp.float32)
    m = jnp.ones_like(f)
    core = (f >= low) & (f <= high)
    m = jnp.where(core, 0.0, m)
    if trans > 0:
        tl = (f >= (low - trans)) & (f < low)
        x_l = (f - (low - trans)) / trans
        m = jnp.where(tl, 0.5 * (1.0 + jnp.cos(jnp.pi * x_l)), m)
        th = (f > high) & (f <= (high + trans))
        x_h = (f - high) / trans
        m = jnp.where(th, 0.5 * (1.0 + jnp.cos(jnp.pi * (1.0 - x_h))), m)
    return jnp.clip(m, 0.0, 1.0)


def band_transition_width(
    low: float,
    high: float,
    mode: str = "rel",
    trans_hz: float = 0.0,
    trans_rel: float = 0.0,
    trans_min_hz: float = 0.0,
    trans_max_hz: float = 0.0,
) -> float:
    """Per-band transition width (reference: src/dsp_band_ops.py:428-435)."""
    if mode == "rel":
        return float(np.clip((high - low) * trans_rel, trans_min_hz, trans_max_hz))
    return float(trans_hz)


def band_gain_matrix(
    freqs: np.ndarray,
    bands: Sequence[Tuple[float, float]],
    attenuation: float = 0.0,
    transition_mode: str = "rel",
    transition_hz: float = 0.0,
    transition_rel: float = 0.0,
    transition_min_hz: float = 0.0,
    transition_max_hz: float = 0.0,
) -> jnp.ndarray:
    """Stacked per-band gain rows ``[B, F]``.

    Row b equals ``keep_b + attenuation * (1 - keep_b)`` — the gain the
    reference applies to the magnitude spectrogram one band at a time
    (src/dsp_band_ops.py:573-580). Multiplying ``gains[:, :, None] * mag``
    yields the full perturbation batch in one broadcast.
    """
    rows = []
    for low, high in bands:
        trans = band_transition_width(
            low, high, transition_mode, transition_hz, transition_rel,
            transition_min_hz, transition_max_hz,
        )
        keep = smooth_band_keep_mask(jnp.asarray(freqs), float(low), float(high), trans)
        rows.append(keep + attenuation * (1.0 - keep))
    return jnp.stack(rows, axis=0)


def occlusion_patch_grid(
    n_freq: int,
    n_time: int,
    patch_time_frames: int,
    stride_time_frames: int,
    patch_freq_percent: float,
    stride_freq_percent: float,
) -> Tuple[np.ndarray, int, int]:
    """Patch start coordinates for the occlusion sweep.

    Returns ``(starts[P, 2], patch_freq_bins, patch_time_frames)`` with
    ``starts[:, 0] = t_start`` and ``starts[:, 1] = f_start``, in the exact
    order of the reference's nested loop (outer time, inner frequency;
    src/spectrogram_explainability.py:645-648), including the percent→bins
    rounding (:628-631).
    """
    patch_freq = max(1, int(round(patch_freq_percent / 100.0 * n_freq)))
    stride_freq = max(1, int(round(stride_freq_percent / 100.0 * n_freq)))
    # clamp to the spectrogram: the reference truncates each patch with
    # t_end = min(t_start + t_patch, n_time) (:666-667), which only binds
    # when the patch exceeds the axis (e.g. a 10 s clip at the default
    # 2048-frame patch → ONE full-span patch). The engine's fixed-size
    # dynamic_slice needs the clamp up front or it fails at trace time.
    patch_freq = min(patch_freq, n_freq)
    t_patch = min(patch_time_frames, n_time)
    t_stride = stride_time_frames
    starts = [
        (t, f)
        for t in range(0, max(1, n_time - t_patch + 1), t_stride)
        for f in range(0, max(1, n_freq - patch_freq + 1), stride_freq)
    ]
    return np.asarray(starts, dtype=np.int32), patch_freq, t_patch


def occlusion_mask_batch(
    starts: np.ndarray,
    patch_freq: int,
    patch_time: int,
    n_freq: int,
    n_time: int,
    occlusion_value: float = 0.0,
) -> jnp.ndarray:
    """Materialized ``[P, F, T]`` occlusion multiplier masks.

    Only suitable for small spectrograms (tests / short clips) — the
    production path applies patches implicitly inside the engine.
    """
    f_idx = np.arange(n_freq)[None, :, None]
    t_idx = np.arange(n_time)[None, None, :]
    t0 = starts[:, 0][:, None, None]
    f0 = starts[:, 1][:, None, None]
    inside = (
        (f_idx >= f0)
        & (f_idx < np.minimum(f0 + patch_freq, n_freq))
        & (t_idx >= t0)
        & (t_idx < np.minimum(t0 + patch_time, n_time))
    )
    masks = np.where(inside, occlusion_value, 1.0).astype(np.float32)
    return jnp.asarray(masks)


def rise_mask_batch(
    key: jax.Array, n_masks: int, n_freq: int, n_time: int, mask_probability: float = 0.5
) -> jnp.ndarray:
    """``[M, F, T]`` Bernoulli keep-masks for RISE.

    The reference draws ``np.random.rand(F, T) > (1 - p)`` per mask
    (src/spectrogram_explainability.py:768); here the whole batch comes from
    a counter-based ``jax.random`` stream so runs are reproducible and
    shardable across devices.
    """
    u = jax.random.uniform(key, (n_masks, n_freq, n_time), dtype=jnp.float32)
    return (u > (1.0 - mask_probability)).astype(jnp.float32)


def lime_mask_batch(
    key: Optional[jax.Array], n_samples: int, n_components: int
) -> np.ndarray:
    """Binary ``[N, S]`` stem on/off design matrix for LIME.

    Row 0 is the all-ones (unperturbed) instance, matching the lime_base
    convention used by audioLIME's ``explain_instance``.
    """
    if key is None:
        key = jax.random.key(0)
    bits = jax.random.bernoulli(key, 0.5, (n_samples, n_components))
    data = np.asarray(bits, dtype=np.float32)
    data[0, :] = 1.0
    return data
