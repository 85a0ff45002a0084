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
    """One stem's magnitude-mask U-Net (Spleeter architecture).

    Input  ``[B, T, F, C]`` magnitude (F = 1024 kept bins, C = channels);
    output an unnormalized mask logit of the same shape. 6 conv encoder
    stages (16→512 filters, 5×5, stride 2, BN + LeakyReLU) and 6 deconv
    decoder stages with skip connections (ReLU, dropout on the first 3),
    final 1×1 dilated conv + sigmoid.
    """

    channels: int = 1
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        filters = [16, 32, 64, 128, 256, 512]
        skips: List[jnp.ndarray] = []
        h = x
        for i, f in enumerate(filters):
            h = nn.Conv(f, (5, 5), strides=(2, 2), padding="SAME", name=f"conv{i}")(h)
            h = nn.BatchNorm(use_running_average=True, name=f"bn{i}")(h)
            skips.append(h)
            h = nn.leaky_relu(h, 0.2)

        for i, f in enumerate(reversed(filters[:-1])):
            h = nn.ConvTranspose(f, (5, 5), strides=(2, 2), padding="SAME", name=f"up{i}")(h)
            h = nn.relu(h)
            if i < 3:
                h = nn.Dropout(0.5, deterministic=self.deterministic)(h)
            h = nn.BatchNorm(use_running_average=True, name=f"upbn{i}")(h)
            h = jnp.concatenate([h, skips[len(filters) - 2 - i]], axis=-1)

        h = nn.ConvTranspose(1, (5, 5), strides=(2, 2), padding="SAME", name="up_final")(h)
        h = nn.relu(h)
        mask = nn.Conv(self.channels, (4, 4), padding="SAME", name="logit")(h)
        return nn.sigmoid(mask)


def unet_separate(
    audio: np.ndarray,
    sr: int,
    params_per_stem: Dict[str, Any],
    model_name: str = "spleeter:4stems",
    separation_exponent: float = 2.0,
) -> Dict[str, np.ndarray]:
    """Separate with converted Spleeter weights (Wiener-style ratio masks)."""
    names = STEM_NAMES[model_name]
    y = jnp.asarray(audio, jnp.float32)
    S = stft(y, n_fft=_SEP_N_FFT, hop_length=_SEP_HOP)
    mag, phase = magphase(S)
    T = mag.shape[-1]
    pad_t = (-T) % 512
    x = jnp.pad(mag[: _SEP_N_FFT // 4, :], ((0, 0), (0, pad_t)))  # keep 1024 bins
    x = x.T[None, :, :, None]  # [1, T', 1024, 1]

    unet = SpleeterUNet()
    masks = []
    for name in names:
        m = unet.apply(params_per_stem[name], x)
        masks.append(m[0, :, :, 0].T[:, :T])  # [1024, T]
    masks = jnp.stack(masks) ** separation_exponent
    denom = jnp.sum(masks, axis=0, keepdims=True) + 1e-10
    ratio = masks / denom
    full = jnp.concatenate(
        [ratio, jnp.zeros((len(names), mag.shape[0] - _SEP_N_FFT // 4, T))], axis=1
    )
    stems_S = full * mag[None] * phase[None]
    waves = istft(stems_S, hop_length=_SEP_HOP, n_fft=_SEP_N_FFT, length=y.shape[-1])
    return {f"{n}0": np.asarray(w) for n, w in zip(names, waves)}


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
    audio: np.ndarray, sr: int, model_name: str = "spleeter:4stems"
) -> Dict[str, np.ndarray]:
    """Weight-free deterministic separation; stems partition the mixture."""
    names = STEM_NAMES[model_name]
    waves = _mask_separate_device(
        jnp.asarray(audio, jnp.float32), int(sr), model_name, int(len(audio))
    )
    return {f"{n}0": np.asarray(w) for n, w in zip(names, waves)}


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

_WEIGHTS_ENV = "ADX_SPLEETER_WEIGHTS"


def load_spleeter_params(weights_dir: str | Path, model_name: str) -> Optional[Dict[str, Any]]:
    """Load converted per-stem ``.npz`` parameter trees if present."""
    weights_dir = Path(weights_dir)
    names = STEM_NAMES[model_name]
    out = {}
    for name in names:
        p = weights_dir / f"{model_name.split(':')[1]}_{name}.npz"
        if not p.exists():
            return None
        flat = dict(np.load(p))
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
    audio: np.ndarray, sr: int, model_name: str = "spleeter:4stems"
) -> Dict[str, np.ndarray]:
    """Separate a mono mixture into named stems.

    Uses converted Spleeter UNet weights when ``$ADX_SPLEETER_WEIGHTS``
    points at them; otherwise the deterministic mask fallback.
    """
    if model_name not in STEM_NAMES:
        raise ValueError(f"Unknown separation model: {model_name!r}")
    weights_dir = os.environ.get(_WEIGHTS_ENV)
    if weights_dir:
        params = load_spleeter_params(weights_dir, model_name)
        if params is not None:
            return unet_separate(audio, sr, params, model_name)
        print(f"[Warning] No converted weights under {weights_dir}; using mask fallback.")
    return mask_separate(audio, sr, model_name)
