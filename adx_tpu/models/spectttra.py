"""SpecTTTra — spectro-temporal transformer classifier in flax.

Re-implementation of the SONICS fake-song detector the reference consumes as
a torch black box (``HFAudioClassifier`` — reference: src/sonics_api.py:20,
246-271). Architecture per the SONICS paper: a log-mel spectrogram is cut
into *temporal* clips (all mel bins × ``t_clip`` frames) and *spectral* clips
(``f_clip`` bins × all frames); each clip family is linearly embedded by a
strided 1-D convolution, position-encoded, concatenated into one token
sequence, fed through a pre-LN ViT-style encoder, mean-pooled, and projected
to a single fake-logit. The caller applies a sigmoid, mirroring the
reference (src/sonics_api.py:271).

TPU notes
---------
* The mel frontend is part of the module, so a predictor forward is a single
  XLA program: frame → rFFT → mel matmul → dB → normalize → tokenize →
  transformer. No host round-trips.
* All matmuls carry ``preferred_element_type=float32`` via flax defaults and
  the module supports bf16 compute (``dtype=jnp.bfloat16``) with f32 params,
  the MXU-native configuration.
* Static shapes throughout: the model consumes exactly
  ``cfg.audio.n_samples`` samples; the predictor pads/trims on device.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from adx_tpu.models.config import ModelConfig
from adx_tpu.ops.mel import melspectrogram
from adx_tpu.ops.db import power_to_db


def sinusoid_position_encoding(n_positions: int, dim: int) -> np.ndarray:
    """Standard transformer sin/cos position table ``[n_positions, dim]``."""
    pos = np.arange(n_positions)[:, None].astype(np.float64)
    i = np.arange(dim)[None, :]
    angle = pos / np.power(10000.0, (2 * (i // 2)) / dim)
    table = np.where(i % 2 == 0, np.sin(angle), np.cos(angle))
    return table.astype(np.float32)


class MelFrontend(nn.Module):
    """Waveform → normalized log-mel spectrogram ``[B, n_mels, T]``.

    torchaudio conventions (the ``sonics`` package's feature extractor):
    htk mel scale, unnormalized filterbank, reflect pad, power=2 → dB with
    ref=1 and ``top_db`` clamp, then per-instance normalization.
    """

    cfg: ModelConfig
    # real-DFT-matmul frontend: XLA's TPU rFFT is slow at these shapes
    # (155 ms vs ~30 ms per batch-64 frontend); numerically ≤1e-4 relative
    # of the FFT path (both f32)
    use_dft: bool = True
    # matmul compute dtype — follows the classifier's (bf16 in bf16 mode;
    # dB/norm math stays f32 regardless). Measured neutral on the full
    # explain bench (the encoder dominates), kept for dtype consistency.
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wave: jnp.ndarray) -> jnp.ndarray:
        from adx_tpu.ops.mel import melspectrogram_dft

        a = self.cfg.audio
        mel_fn = melspectrogram_dft if self.use_dft else melspectrogram
        extra = {"compute_dtype": self.dtype} if self.use_dft else {}
        M = mel_fn(
            wave.astype(jnp.float32),
            sr=a.sample_rate,
            n_fft=a.n_fft,
            hop_length=a.hop_length,
            win_length=a.win_length,
            n_mels=a.n_mels,
            fmin=a.f_min,
            fmax=a.f_max,
            htk=True,
            norm=None,
            power=a.power,
            pad_mode="reflect",
            **extra,
        )
        return normalize_log_mel(M, a)


def normalize_log_mel(M: jnp.ndarray, a) -> jnp.ndarray:
    """Mel POWER spectrogram → the classifier's normalized input.

    AmplitudeToDB(stype='power', top_db): ref=1, clamp relative to the
    per-instance max over the whole spectrogram, then per-instance norm.
    Shared by the waveform frontend and the LIME frontend hoist (which
    builds mel power directly from the stem cross-spectral Gram)."""
    S_db = power_to_db(M, ref=1.0, top_db=None)
    mx = jnp.max(S_db, axis=(-2, -1), keepdims=True)
    S_db = jnp.maximum(S_db, mx - a.top_db)
    if a.norm == "mean_std":
        mu = jnp.mean(S_db, axis=(-2, -1), keepdims=True)
        sd = jnp.std(S_db, axis=(-2, -1), keepdims=True)
        S_db = (S_db - mu) / (sd + 1e-6)
    elif a.norm == "min_max":
        mn = jnp.min(S_db, axis=(-2, -1), keepdims=True)
        S_db = (S_db - mn) / (jnp.max(S_db, axis=(-2, -1), keepdims=True) - mn + 1e-6)
    elif a.norm != "none":
        raise ValueError(f"Unknown spec norm: {a.norm!r}")
    return S_db


class Attention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Any = jnp.float32
    use_flash: bool = False
    dropout: float = 0.0
    attn_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from adx_tpu.ops.attention import attend

        B, N, D = x.shape
        H = self.num_heads
        head_dim = D // H
        qkv = nn.Dense(3 * D, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)
        if train and self.attn_dropout > 0.0:
            # explicit attention so probs dropout can be applied (training
            # only — the fused/flash inference paths don't expose probs)
            scale = head_dim ** -0.5
            # f32 accumulation like the fused inference path (xla_attention
            # requests f32) — bf16 training would otherwise store bf16
            # logits and diverge from inference numerics on the same weights
            logits = jnp.einsum("bnhd,bmhd->bhnm", (q * scale).astype(self.dtype), k,
                                preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
            probs = nn.Dropout(self.attn_dropout)(probs, deterministic=False)
            out = jnp.einsum("bhnm,bmhd->bnhd", probs, v)
        else:
            # Pallas flash attention on TPU for long sequences (SpecTTTra-α
            # at 44.1 kHz attends over ~3.6k tokens; the XLA path
            # materializes [B, H, S, S] scores); dot_product_attention else.
            out = attend(q, k, v, use_flash=self.use_flash)
        out = out.reshape(B, N, D)
        out = nn.Dense(D, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.dropout)(out, deterministic=not train)


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.float32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        return nn.Dropout(self.dropout)(x, deterministic=not train)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool = True
    dtype: Any = jnp.float32
    use_flash: bool = False
    dropout: float = 0.0
    attn_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + Attention(
            self.dim, self.num_heads, self.qkv_bias, dtype=self.dtype,
            use_flash=self.use_flash, dropout=self.dropout,
            attn_dropout=self.attn_dropout, name="attn"
        )(y, train=train)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + Mlp(
            self.dim, int(self.dim * self.mlp_ratio), dtype=self.dtype,
            dropout=self.dropout, name="mlp"
        )(y, train=train)
        return x


class Tokenizer1D(nn.Module):
    """Strided 1-D conv embedding: ``[B, L, C] → [B, L // clip, D]``."""

    embed_dim: int
    clip: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.embed_dim,
            kernel_size=(self.clip,),
            strides=(self.clip,),
            padding="VALID",
            dtype=self.dtype,
            name="proj",
        )(x)


class STTokenizer(nn.Module):
    """Spectro-temporal tokenization of a ``[B, F, T]`` spectrogram."""

    cfg: ModelConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, spec: jnp.ndarray) -> jnp.ndarray:
        m = self.cfg.model
        B, F, T = spec.shape
        t_tokens = T // m.t_clip
        f_tokens = F // m.f_clip

        # temporal clips: conv over time, mel bins as channels
        x_t = jnp.swapaxes(spec, -1, -2)  # [B, T, F]
        tok_t = Tokenizer1D(m.embed_dim, m.t_clip, dtype=self.dtype, name="temporal")(x_t)
        # spectral clips: conv over frequency, frames as channels
        tok_f = Tokenizer1D(m.embed_dim, m.f_clip, dtype=self.dtype, name="spectral")(spec)

        if m.pe_learnable:
            pe_t = self.param(
                "pos_embed_temporal", nn.initializers.normal(0.02), (t_tokens, m.embed_dim)
            )
            pe_f = self.param(
                "pos_embed_spectral", nn.initializers.normal(0.02), (f_tokens, m.embed_dim)
            )
        else:
            pe_t = jnp.asarray(sinusoid_position_encoding(t_tokens, m.embed_dim))
            pe_f = jnp.asarray(sinusoid_position_encoding(f_tokens, m.embed_dim))
        tok_t = tok_t + pe_t[None]
        tok_f = tok_f + pe_f[None]
        return jnp.concatenate([tok_t, tok_f], axis=1)  # [B, t+f, D]


class SpecTTTra(nn.Module):
    """Spectrogram ``[B, F, T]`` → token embeddings ``[B, N_tokens, D]``."""

    cfg: ModelConfig
    dtype: Any = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, spec: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        m = self.cfg.model
        if m.pre_norm:
            spec = nn.LayerNorm(dtype=self.dtype, name="input_norm")(spec)
        x = STTokenizer(self.cfg, dtype=self.dtype, name="tokenizer")(spec)
        for i in range(m.num_layers):
            x = Block(
                m.embed_dim, m.num_heads, m.mlp_ratio, m.qkv_bias,
                dtype=self.dtype, use_flash=self.use_flash,
                dropout=m.dropout, attn_dropout=m.attn_dropout,
                name=f"blocks_{i}",
            )(x, train=train)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)


class AudioClassifier(nn.Module):
    """Waveform ``[B, n_samples]`` → fake logit ``[B]``.

    The duck-typed core of the predictor layer: ``sigmoid(logit)`` is the
    fake probability, matching the reference's
    ``torch.sigmoid(model(t)).item()`` (src/sonics_api.py:268-271).
    """

    cfg: ModelConfig
    dtype: Any = jnp.float32
    # Pallas flash attention is available but OFF by default: measured
    # in-context on v5e it is slower than XLA's fused attention at
    # SpecTTTra's shapes (head dim 64 under-fills the 128-wide MXU);
    # full-explain p50 8.2 s with flash vs 6.1 s without. Forward-only.
    use_flash: bool = False

    def setup(self):
        self.frontend = MelFrontend(self.cfg, dtype=self.dtype, name="frontend")
        self.encoder = SpecTTTra(
            self.cfg, dtype=self.dtype, use_flash=self.use_flash, name="encoder"
        )
        self.head = nn.Dense(self.cfg.num_classes, name="head")

    def classify_spec(self, spec: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """Logits from a precomputed ``[B, F, T]`` spectrogram."""
        tokens = self.encoder(spec.astype(self.dtype), train=train)
        emb = jnp.mean(tokens, axis=1).astype(jnp.float32)
        return jnp.squeeze(self.head(emb), axis=-1)

    def __call__(self, wave: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """``train=True`` enables the config's dropout/attn_dropout (needs
        a ``{'dropout': key}`` rng); inference paths default to False."""
        return self.classify_spec(self.frontend(wave), train=train)


def init_params(cfg: ModelConfig, key: Optional[jax.Array] = None, dtype=jnp.float32):
    """Initialize random parameters for the given config."""
    if key is None:
        key = jax.random.key(0)
    model = AudioClassifier(cfg, dtype=dtype)
    wave = jnp.zeros((1, cfg.audio.n_samples), jnp.float32)
    return model.init(key, wave)
