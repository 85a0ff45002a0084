"""A torch implementation of SpecTTTra used ONLY as a conversion test fixture.

The real checkpoints live in the external ``sonics`` torch package (not
installable here, zero egress). This mirror reproduces the architecture with
checkpoint-style parameter names so ``adx_tpu.models.convert`` can be
validated end-to-end: torch state dict → flax params → identical outputs.
"""

import torch
import torch.nn as nn

from adx_tpu.models.spectttra import sinusoid_position_encoding


class TorchAttention(nn.Module):
    def __init__(self, dim, num_heads, qkv_bias=True):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim**-0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, D = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, self.head_dim)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, D)
        return self.proj(x)


class TorchMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class TorchBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio, qkv_bias=True):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TorchAttention(dim, num_heads, qkv_bias)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = TorchMlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class TorchTokenizer1D(nn.Module):
    def __init__(self, in_ch, dim, clip):
        super().__init__()
        self.proj = nn.Conv1d(in_ch, dim, kernel_size=clip, stride=clip)

    def forward(self, x):  # [B, C, L] -> [B, L // clip, D]
        return self.proj(x).transpose(1, 2)


class TorchSTTokenizer(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        m = cfg.model
        a = cfg.audio
        self.t_clip, self.f_clip = m.t_clip, m.f_clip
        self.temporal = TorchTokenizer1D(a.n_mels, m.embed_dim, m.t_clip)
        self.spectral = TorchTokenizer1D(a.n_frames, m.embed_dim, m.f_clip)
        t_tokens = a.n_frames // m.t_clip
        f_tokens = a.n_mels // m.f_clip
        pe_t = torch.tensor(sinusoid_position_encoding(t_tokens, m.embed_dim))
        pe_f = torch.tensor(sinusoid_position_encoding(f_tokens, m.embed_dim))
        if m.pe_learnable:
            self.pos_embed_temporal = nn.Parameter(pe_t.clone())
            self.pos_embed_spectral = nn.Parameter(pe_f.clone())
        else:
            self.register_buffer("pe_t", pe_t)
            self.register_buffer("pe_f", pe_f)
        self.pe_learnable = m.pe_learnable

    def forward(self, spec):  # [B, F, T]
        tok_t = self.temporal(spec)                    # conv over time, F channels
        tok_f = self.spectral(spec.transpose(1, 2))    # conv over freq, T channels
        pe_t = self.pos_embed_temporal if self.pe_learnable else self.pe_t
        pe_f = self.pos_embed_spectral if self.pe_learnable else self.pe_f
        return torch.cat([tok_t + pe_t[None], tok_f + pe_f[None]], dim=1)


class TorchSpecTTTra(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        m = cfg.model
        a = cfg.audio
        self.pre_norm = m.pre_norm
        if m.pre_norm:
            self.input_norm = nn.LayerNorm(a.n_frames)
        self.tokenizer = TorchSTTokenizer(cfg)
        self.blocks = nn.ModuleList(
            [TorchBlock(m.embed_dim, m.num_heads, m.mlp_ratio, m.qkv_bias) for _ in range(m.num_layers)]
        )
        self.norm = nn.LayerNorm(m.embed_dim)

    def forward(self, spec):
        if self.pre_norm:
            spec = self.input_norm(spec)
        x = self.tokenizer(spec)
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


class TorchAudioClassifierNoFrontend(nn.Module):
    """Encoder + head operating on a precomputed spectrogram (the mel
    frontend is exercised separately against its numpy reference)."""

    def __init__(self, cfg):
        super().__init__()
        self.encoder = TorchSpecTTTra(cfg)
        self.head = nn.Linear(cfg.model.embed_dim, cfg.num_classes)

    def forward(self, spec):
        tokens = self.encoder(spec)
        return self.head(tokens.mean(dim=1)).squeeze(-1)
