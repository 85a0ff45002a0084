"""Source separation for stem-level explainers.

The reference delegates separation to Spleeter (TF U-Nets) through the
external audioLIME package (reference: src/lime_explainer.py:386-392,
src/dsp_band_ops.py:447-463), with a dedicated retry decorator for TF
graph-scope crashes (src/dsp_band_ops.py:261-293). Here separation is
native:

* ``SpleeterUNet`` — the Spleeter 4/2/5-stem architecture in flax
  (per-stem magnitude-mask U-Nets on a 4096/1024 STFT), with a weight
  loader for converted checkpoints (``.npz`` trees produced by
  ``convert_spleeter_checkpoint`` on a machine with TF installed).
* ``mask_separate`` — a deterministic, weight-free fallback: HPSS-style
  median-filter masks combined with frequency-range gating. Its masks sum
  to exactly 1, so the returned stems *partition* the mixture
  (``Σ stems == mixture``) — the property LIME's masked recombinations
  rely on. Used automatically when no converted weights are available.

Stem naming follows audioLIME's ``SpleeterFactorization`` convention:
``vocals0/drums0/bass0/other0`` (4stems), ``vocals0/accompaniment0``
(2stems), ``+piano0`` (5stems).
"""

from __future__ import annotations

import functools
import os
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

import flax.linen as nn

from adx_tpu.ops.stft import istft, magphase, stft

_SEP_N_FFT = 4096
_SEP_HOP = 1024

STEM_NAMES = {
    "spleeter:2stems": ["vocals", "accompaniment"],
    "spleeter:4stems": ["vocals", "drums", "bass", "other"],
    "spleeter:5stems": ["vocals", "drums", "bass", "piano", "other"],
}


# ---------------------------------------------------------------------------
# Spleeter U-Net in flax
# ---------------------------------------------------------------------------


class SpleeterUNet(nn.Module):
    """One stem's magnitude-mask U-Net (Spleeter ``apply_unet`` graph).

    Input  ``[B, T, F, C]`` magnitude (F = 1024 kept bins, C = channels;
    the published Spleeter checkpoints are stereo, C = 2); output the
    sigmoid mask of the same shape. Faithful to Spleeter's graph quirks:

    * skip connections concatenate the **pre-BN** conv outputs, in
      ``[skip, decoder]`` order;
    * the bottleneck feeds ``conv6`` (pre-BN) into the first deconv —
      the 6th encoder BN exists in the checkpoint but is dead;
    * decoder stages are ConvTranspose → ReLU → BN → Dropout(first 3);
    * a final BN after the last deconv, then a 4×4 **dilation-2** conv
      (sigmoid) produces the mask;
    * Keras BatchNormalization semantics: ``epsilon = 1e-3``;
    * ``transpose_kernel=True`` so ConvTranspose matches Keras'
      gradient-of-conv semantics and the HWOI checkpoint kernel layout.

    Verified against a TF mirror forward in tests/test_separation_unet.py
    (reference separation entry: src/lime_explainer.py:386-392).
    """

    channels: int = 2
    deterministic: bool = True
    train: bool = False  # True = BN collects batch_stats (Keras training
    # semantics) for scripts/train_separation_unet.py; inference default
    # (False) is byte-identical to the original converted-checkpoint graph

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        filters = [16, 32, 64, 128, 256, 512]
        convs: List[jnp.ndarray] = []
        h = x
        for i, f in enumerate(filters):
            c = nn.Conv(f, (5, 5), strides=(2, 2), padding="SAME", name=f"conv{i}")(h)
            convs.append(c)
            b = nn.BatchNorm(use_running_average=not self.train,
                             epsilon=1e-3, name=f"bn{i}")(c)
            h = nn.leaky_relu(b, 0.2)

        h = convs[-1]  # Spleeter feeds conv6 pre-BN into the decoder
        for i, f in enumerate(reversed(filters[:-1])):
            h = nn.ConvTranspose(
                f, (5, 5), strides=(2, 2), padding="SAME",
                transpose_kernel=True, name=f"up{i}",
            )(h)
            h = nn.relu(h)
            h = nn.BatchNorm(use_running_average=not self.train,
                             epsilon=1e-3, name=f"upbn{i}")(h)
            if i < 3:
                h = nn.Dropout(0.5, deterministic=self.deterministic)(h)
            h = jnp.concatenate([convs[len(filters) - 2 - i], h], axis=-1)

        h = nn.ConvTranspose(
            1, (5, 5), strides=(2, 2), padding="SAME",
            transpose_kernel=True, name="up_final",
        )(h)
        h = nn.relu(h)
        h = nn.BatchNorm(use_running_average=not self.train,
                         epsilon=1e-3, name="bn_final")(h)
        mask = nn.Conv(
            self.channels, (4, 4), padding="SAME", kernel_dilation=(2, 2), name="logit"
        )(h)
        return nn.sigmoid(mask)


def unet_separate(
    audio: np.ndarray,
    sr: int,
    params_per_stem: Dict[str, Any],
    model_name: str = "spleeter:4stems",
    separation_exponent: float = 2.0,
    device: bool = False,
) -> Dict[str, np.ndarray]:
    """Separate with converted Spleeter weights (Wiener-style ratio masks).

    The published checkpoints are stereo (C=2): a mono mixture is
    duplicated across channels (what Spleeter's own waveform adapter does
    for mono input) and the two predicted mask channels are averaged.

    The whole chain (STFT → vmapped per-stem U-Net → extended Wiener
    masks → batched ISTFT) is ONE jitted program: all stems go through a
    single vmapped forward, and no complex array ever leaves the device
    (the axon tunnel cannot transfer complex64).
    """
    names = STEM_NAMES[model_name]
    stacked, n_ch = _stack_for_device(params_per_stem, names)
    return _unet_separate_stacked(
        audio, stacked, n_ch, names, separation_exponent, device
    )


def _stack_for_device(params_per_stem: Dict[str, Any], names) -> tuple:
    """Stack the per-stem host trees into one device tree (stem axis 0)."""
    first = params_per_stem[names[0]]
    n_ch = int(first["params"]["logit"]["bias"].shape[-1])
    stacked = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        *[params_per_stem[n] for n in names],
    )
    return stacked, n_ch


def _stack_for_host(params_per_stem: Dict[str, Any], names) -> tuple:
    """Host-side (numpy) variant of ``_stack_for_device``: the jitted call
    transfers the leaves per invocation, so nothing stays pinned on HBM."""
    first = params_per_stem[names[0]]
    n_ch = int(first["params"]["logit"]["bias"].shape[-1])
    stacked = jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]),
        *[params_per_stem[n] for n in names],
    )
    return stacked, n_ch


def _unet_separate_stacked(audio, stacked, n_ch, names,
                           separation_exponent=2.0, device=False):
    waves = _unet_separate_device(
        jnp.asarray(audio, jnp.float32), stacked, n_ch,
        float(separation_exponent), int(np.shape(audio)[-1]),
    )
    if device:
        return {f"{n}0": waves[i] for i, n in enumerate(names)}
    return {f"{n}0": np.asarray(w) for n, w in zip(names, waves)}


@functools.partial(jax.jit, static_argnames=("n_ch", "n_out"))
def _unet_separate_device(y, stacked_params, n_ch, separation_exponent, n_out):
    # f16-stored trees arrive raw from the separation cache (half the H2D
    # bytes); compute is always f32 — exact vs casting on the host
    stacked_params = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        stacked_params,
    )
    S = stft(y, n_fft=_SEP_N_FFT, hop_length=_SEP_HOP)
    mag, phase = magphase(S)
    T = mag.shape[-1]
    bins = _SEP_N_FFT // 4
    pad_t = (-T) % 512
    x = jnp.pad(mag[:bins, :], ((0, 0), (0, pad_t)))  # keep 1024 bins
    # Spleeter's native processing unit is a 512-frame segment (its
    # waveform adapter batches [n_seg, 512, 1024, C] through the net) —
    # and a whole-track [1, T', 1024, C] image vmapped over 4 stems OOMs
    # v5e HBM at 120 s (16.7 GB > 15.75 measured). Segments as the batch
    # axis + lax.map over stems caps live activations at one stem's
    # working set; clips ≤ 512 frames are bit-identical to the old path.
    x = jnp.repeat(x.T[:, :, None], n_ch, axis=-1)          # [T', 1024, C]
    x = x.reshape(-1, 512, bins, n_ch)                       # [n_seg, 512, 1024, C]

    unet = SpleeterUNet(channels=n_ch)
    m = jax.lax.map(lambda p: unet.apply(p, x), stacked_params)  # [S, n_seg, 512, 1024, C]
    n_seg = x.shape[0]
    masks = jnp.mean(m, axis=-1).reshape(-1, n_seg * 512, bins)
    masks = masks.transpose(0, 2, 1)[:, :, :T]               # [S, 1024, T]
    masks = masks ** separation_exponent
    # Spleeter's extended Wiener masks: eps/n in the numerator keeps the
    # masks summing to exactly 1 even where every net output underflows.
    eps = 1e-10
    n_stems = masks.shape[0]
    denom = jnp.sum(masks, axis=0, keepdims=True) + eps
    ratio = (masks + eps / n_stems) / denom
    full = jnp.concatenate(
        [ratio, jnp.zeros((n_stems, mag.shape[0] - _SEP_N_FFT // 4, T))], axis=1
    )
    stems_S = full * mag[None] * phase[None]
    return istft(stems_S, hop_length=_SEP_HOP, n_fft=_SEP_N_FFT, length=n_out)


# ---------------------------------------------------------------------------
# Weight-free fallback separator (partition masks)
# ---------------------------------------------------------------------------


def _rolling_median(x: jnp.ndarray, size: int, axis: int) -> jnp.ndarray:
    """Median over a centered window via stacked rolls (wrap edges)."""
    shifts = range(-(size // 2), size // 2 + 1)
    stacked = jnp.stack([jnp.roll(x, s, axis) for s in shifts], axis=0)
    return jnp.median(stacked, axis=0)


@functools.partial(jax.jit, static_argnames=("sr", "model_name", "n_out"))
def _mask_separate_device(y: jnp.ndarray, sr: int, model_name: str, n_out: int):
    S = stft(y, n_fft=_SEP_N_FFT, hop_length=_SEP_HOP)
    mag, phase = magphase(S)
    # HPSS-style soft masks: harmonic = smooth along time, percussive along freq
    H = _rolling_median(mag, 17, axis=-1)
    P = _rolling_median(mag, 17, axis=-2)
    p_mask = (P * P) / (H * H + P * P + 1e-10)
    h_mask = 1.0 - p_mask

    freqs = jnp.asarray(np.fft.rfftfreq(_SEP_N_FFT, 1.0 / sr), jnp.float32)[:, None]
    low = (freqs < 250.0).astype(jnp.float32)
    mid = ((freqs >= 250.0) & (freqs < 8000.0)).astype(jnp.float32)
    piano_band = ((freqs >= 250.0) & (freqs < 2000.0)).astype(jnp.float32)

    drums = p_mask
    bass = h_mask * low
    if model_name == "spleeter:2stems":
        vocals = h_mask * mid
        masks = [vocals, 1.0 - vocals]
    elif model_name == "spleeter:5stems":
        piano = h_mask * piano_band * 0.5
        vocals = h_mask * mid - piano
        other = 1.0 - (vocals + piano + drums + bass)
        masks = [vocals, drums, bass, piano, other]
    else:  # 4stems
        vocals = h_mask * mid
        other = 1.0 - (vocals + drums + bass)
        masks = [vocals, drums, bass, other]

    masks = jnp.clip(jnp.stack(masks), 0.0, 1.0)
    # renormalize so the masks partition the mixture exactly
    masks = masks / (jnp.sum(masks, axis=0, keepdims=True) + 1e-10)
    stems_S = masks * mag[None] * phase[None]
    return istft(stems_S, hop_length=_SEP_HOP, n_fft=_SEP_N_FFT, length=n_out)


def mask_separate(
    audio: np.ndarray, sr: int, model_name: str = "spleeter:4stems",
    device: bool = False,
) -> Dict[str, np.ndarray]:
    """Weight-free deterministic separation; stems partition the mixture.

    ``device=True`` returns device-resident jax arrays instead of numpy —
    a 120 s 4-stem result is 85 MB, and the axon tunnel moves ~15 MB/s,
    so keeping stems on device saves ~10 s per track when the consumer
    (the LIME engine sweep) runs on device anyway.
    """
    names = STEM_NAMES[model_name]
    waves = _mask_separate_device(
        jnp.asarray(audio, jnp.float32), int(sr), model_name,
        int(np.shape(audio)[-1])
    )
    if device:
        return {f"{n}0": waves[i] for i, n in enumerate(names)}
    return {f"{n}0": np.asarray(w) for n, w in zip(names, waves)}


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

_WEIGHTS_ENV = "ADX_SPLEETER_WEIGHTS"


def load_spleeter_params(
    weights_dir: str | Path, model_name: str, cast_f32: bool = True
) -> Optional[Dict[str, Any]]:
    """Load converted per-stem ``.npz`` parameter trees if present.

    ``cast_f32=False`` preserves the stored dtypes (the shipped
    synthetic-trained UNet stores params f16) — used by the separation
    cache so the per-call device upload ships half the bytes; the jitted
    program casts to f32 after transfer, which is value-identical to
    casting on the host."""
    weights_dir = Path(weights_dir)
    names = STEM_NAMES[model_name]
    out = {}
    for name in names:
        p = weights_dir / f"{model_name.split(':')[1]}_{name}.npz"
        if not p.exists():
            return None
        flat = dict(np.load(p))
        # float16-stored trees (the synthetic-trained UNet ships f16 to
        # halve the repo weight) compute as f32 like converted checkpoints
        if cast_f32:
            flat = {k: (v.astype(np.float32)
                        if np.issubdtype(v.dtype, np.floating) else v)
                    for k, v in flat.items()}
        tree: Dict[str, Any] = {}
        for key, value in flat.items():
            node = tree
            parts = key.split("/")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = value
        out[name] = tree
    return out


def separate(
    audio: np.ndarray, sr: int, model_name: str = "spleeter:4stems",
    device: bool = False,
) -> Dict[str, np.ndarray]:
    """Separate a mono mixture into named stems.

    Uses converted Spleeter UNet weights when ``$ADX_SPLEETER_WEIGHTS``
    points at them; otherwise the deterministic mask fallback.
    ``device=True`` keeps the stems on device (jax arrays) — see
    ``mask_separate``.
    """
    if model_name not in STEM_NAMES:
        raise ValueError(f"Unknown separation model: {model_name!r}")
    weights_dir = os.environ.get(_WEIGHTS_ENV)
    if weights_dir:
        entry = _cached_host_params(weights_dir, model_name)
        if entry is not None:
            stacked, n_ch = entry
            return _unet_separate_stacked(
                audio, stacked, n_ch, STEM_NAMES[model_name], device=device
            )
        print(f"[Warning] No converted weights under {weights_dir}; using mask fallback.")
    return mask_separate(audio, sr, model_name, device=device)


# Serving/explain call separate() once per track; without this cache every
# call re-read + decompressed the 68 MB npz set (measured: 5.7 s of a
# 7.0 s warm /explain was 'separation'). The cache holds HOST-stacked f32
# trees and the params are re-uploaded per call: a device-resident cache
# was tried and made the OTHER sweeps ~10x slower (warm serving occlusion
# 0.42 → 6.33 s, FBP 0.11 → 1.31, LIME 0.13 → 1.30 while the small
# analyze program was unchanged — ~272 MB of pinned params pressure the
# big sweep programs' HBM workspaces; a transient per-call upload does
# not). Keyed by resolved dir + weight mtimes so a converted/retrained
# checkpoint is picked up; cleared on a key change to bound host memory.
_HOST_PARAMS_CACHE: Dict[tuple, tuple] = {}


def _cached_host_params(weights_dir: str | Path, model_name: str):
    wd = Path(weights_dir).resolve()
    names = STEM_NAMES[model_name]
    try:
        mtimes = tuple(
            (wd / f"{model_name.split(':')[1]}_{n}.npz").stat().st_mtime_ns
            for n in names
        )
    except FileNotFoundError:
        return None
    key = (str(wd), model_name, mtimes)
    if key not in _HOST_PARAMS_CACHE:
        # raw dtypes: f16-stored params upload half the bytes per call and
        # are cast to f32 INSIDE the program (value-identical to host cast)
        params = load_spleeter_params(wd, model_name, cast_f32=False)
        if params is None:
            return None
        _HOST_PARAMS_CACHE.clear()
        _HOST_PARAMS_CACHE[key] = _stack_for_host(params, names)
    return _HOST_PARAMS_CACHE[key]
