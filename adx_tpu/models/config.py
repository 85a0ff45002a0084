"""Configuration for the SpecTTTra classifier family.

The reference selects checkpoints by name (``awsaf49/sonics-spectttra-
{alpha,beta,gamma}-{5,120}s`` — configs/Spec_occlusion_configs/
spectrogram_explainability.yaml:19-27) and treats the architecture as opaque.
Here the architecture is explicit and data-driven: every hyperparameter lives
in this config, and ``adx_tpu.models.convert.config_from_hf`` populates it
from a checkpoint's ``config.json`` so converted weights always match.

Defaults follow the SONICS paper's SpecTTTra description (spectro-temporal
tokenization of a 128-mel spectrogram; α/β/γ trade token granularity for
speed via the temporal/spectral clip sizes). Exact numerical parity with the
published checkpoints additionally requires converting their weights — see
``adx_tpu/models/convert.py``.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    """Mel frontend parameters (torchaudio conventions: htk mel scale,
    no filterbank norm, reflect padding, power spectrogram → dB)."""

    sample_rate: int = 16000
    duration: float = 120.0          # seconds the model consumes
    n_fft: int = 2048
    hop_length: int = 512
    win_length: int = 2048
    n_mels: int = 128
    f_min: float = 20.0
    f_max: float = 8000.0
    power: float = 2.0
    top_db: float = 80.0
    norm: str = "mean_std"           # 'mean_std' | 'min_max' | 'none'

    @property
    def n_samples(self) -> int:
        return int(self.sample_rate * self.duration)

    @property
    def n_frames(self) -> int:
        # center=True framing: 1 + n_samples // hop
        return 1 + self.n_samples // self.hop_length


@dataclasses.dataclass(frozen=True)
class SpecTTTraConfig:
    """Spectro-temporal transformer parameters."""

    t_clip: int = 3                  # temporal clip size (frames per token)
    f_clip: int = 1                  # spectral clip size (mel bins per token)
    embed_dim: int = 384
    num_heads: int = 6
    num_layers: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    pe_learnable: bool = False       # learnable vs sinusoidal positions
    pre_norm: bool = True            # LayerNorm on the input spectrogram
    dropout: float = 0.0
    attn_dropout: float = 0.0


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    audio: AudioConfig = AudioConfig()
    model: SpecTTTraConfig = SpecTTTraConfig()
    num_classes: int = 1
    name: str = "spectttra-alpha-120s"

    @property
    def t_tokens(self) -> int:
        return self.audio.n_frames // self.model.t_clip

    @property
    def f_tokens(self) -> int:
        return self.audio.n_mels // self.model.f_clip

    @property
    def n_tokens(self) -> int:
        return self.t_tokens + self.f_tokens


def _mk(name: str, t_clip: int, f_clip: int, duration: float) -> ModelConfig:
    return ModelConfig(
        audio=AudioConfig(duration=duration),
        model=SpecTTTraConfig(t_clip=t_clip, f_clip=f_clip),
        name=name,
    )


# SONICS variants: α = finest tokens / highest accuracy, γ = coarsest /
# fastest (configs/Spec_occlusion_configs/spectrogram_explainability.yaml:24-27).
PRESETS = {
    "spectttra-alpha-120s": _mk("spectttra-alpha-120s", 3, 1, 120.0),
    "spectttra-beta-120s": _mk("spectttra-beta-120s", 5, 3, 120.0),
    "spectttra-gamma-120s": _mk("spectttra-gamma-120s", 7, 5, 120.0),
    "spectttra-alpha-5s": _mk("spectttra-alpha-5s", 1, 1, 5.0),
    "spectttra-beta-5s": _mk("spectttra-beta-5s", 3, 1, 5.0),
    "spectttra-gamma-5s": _mk("spectttra-gamma-5s", 5, 3, 5.0),
}


def resolve_preset(name: str) -> ModelConfig:
    """Resolve a checkpoint-style name ('awsaf49/sonics-spectttra-alpha-120s')
    to a ModelConfig preset."""
    key = name.lower().split("/")[-1]
    key = key.replace("sonics-", "")
    if key in PRESETS:
        return PRESETS[key]
    raise KeyError(f"Unknown SpecTTTra preset: {name!r}; known: {sorted(PRESETS)}")


def tiny_test_config(duration: float = 0.5) -> ModelConfig:
    """A miniature config for unit tests and the multichip dry-run."""
    return ModelConfig(
        audio=AudioConfig(
            sample_rate=8000, duration=duration, n_fft=256, hop_length=128,
            win_length=256, n_mels=32, f_min=20.0, f_max=4000.0,
        ),
        model=SpecTTTraConfig(
            t_clip=2, f_clip=4, embed_dim=64, num_heads=4, num_layers=2,
            mlp_ratio=2.0,
        ),
        name="spectttra-tiny",
    )
