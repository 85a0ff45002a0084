"""torch → flax weight conversion for SpecTTTra checkpoints.

The published SONICS checkpoints (``awsaf49/sonics-spectttra-*``) are torch
state dicts. This module maps them onto ``adx_tpu.models.spectttra``
parameters:

* ``nn.Linear``  weight ``[out, in]``    → flax Dense kernel ``[in, out]``
* ``nn.Conv1d``  weight ``[out, in, k]`` → flax Conv kernel ``[k, in, out]``
* ``nn.LayerNorm`` weight/bias           → flax scale/bias

Key names are normalized through a small alias table so minor naming drift
between checkpoint versions does not break conversion; anything unmapped is
reported rather than silently dropped.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Dict, Mapping, Tuple

import numpy as np

from adx_tpu.models.config import AudioConfig, ModelConfig, SpecTTTraConfig


def config_from_hf(config: Mapping[str, Any] | str | Path) -> ModelConfig:
    """Build a ModelConfig from a checkpoint's ``config.json`` (dict or path)."""
    if not isinstance(config, Mapping):
        with open(config, "r", encoding="utf-8") as f:
            config = json.load(f)
    a = dict(config.get("audio", {}))
    m = dict(config.get("model", {}))

    def pick(d, *names, default=None):
        for n in names:
            if n in d:
                return d[n]
        return default

    audio = AudioConfig(
        sample_rate=int(pick(a, "sample_rate", "sr", default=16000)),
        duration=float(pick(a, "max_time", "duration", "max_len", default=120.0)),
        n_fft=int(pick(a, "n_fft", default=2048)),
        hop_length=int(pick(a, "hop_length", "hop_len", default=512)),
        win_length=int(pick(a, "win_length", "win_len", default=2048)),
        n_mels=int(pick(a, "n_mels", default=128)),
        f_min=float(pick(a, "f_min", "fmin", default=20.0)),
        f_max=float(pick(a, "f_max", "fmax", default=8000.0)),
        power=float(pick(a, "power", default=2.0)),
        top_db=float(pick(a, "top_db", default=80.0)),
        norm=str(pick(a, "spec_norm", "norm", default="mean_std")),
    )
    model = SpecTTTraConfig(
        t_clip=int(pick(m, "t_clip", default=3)),
        f_clip=int(pick(m, "f_clip", default=1)),
        embed_dim=int(pick(m, "embed_dim", "dim", default=384)),
        num_heads=int(pick(m, "num_heads", "heads", default=6)),
        num_layers=int(pick(m, "num_layers", "depth", default=12)),
        mlp_ratio=float(pick(m, "mlp_ratio", default=4.0)),
        qkv_bias=bool(pick(m, "qkv_bias", default=True)),
        pe_learnable=bool(pick(m, "pe_learnable", default=False)),
        pre_norm=bool(pick(m, "pre_norm", "input_norm", default=True)),
    )
    return ModelConfig(audio=audio, model=model, name=str(config.get("name", "spectttra")))


# torch key (regex) → (flax path template, transform)
_RULES: Tuple[Tuple[str, str, str], ...] = (
    (r"encoder\.input_norm\.weight", "encoder/input_norm/scale", "none"),
    (r"encoder\.input_norm\.bias", "encoder/input_norm/bias", "none"),
    (r"encoder\.tokenizer\.(temporal|spectral)\.proj\.weight",
     "encoder/tokenizer/{0}/proj/kernel", "conv1d"),
    (r"encoder\.tokenizer\.(temporal|spectral)\.proj\.bias",
     "encoder/tokenizer/{0}/proj/bias", "none"),
    (r"encoder\.tokenizer\.pos_embed_(temporal|spectral)",
     "encoder/tokenizer/pos_embed_{0}", "maybe_squeeze0"),
    (r"encoder\.blocks\.(\d+)\.norm1\.weight", "encoder/blocks_{0}/norm1/scale", "none"),
    (r"encoder\.blocks\.(\d+)\.norm1\.bias", "encoder/blocks_{0}/norm1/bias", "none"),
    (r"encoder\.blocks\.(\d+)\.norm2\.weight", "encoder/blocks_{0}/norm2/scale", "none"),
    (r"encoder\.blocks\.(\d+)\.norm2\.bias", "encoder/blocks_{0}/norm2/bias", "none"),
    (r"encoder\.blocks\.(\d+)\.attn\.qkv\.weight", "encoder/blocks_{0}/attn/qkv/kernel", "linear"),
    (r"encoder\.blocks\.(\d+)\.attn\.qkv\.bias", "encoder/blocks_{0}/attn/qkv/bias", "none"),
    (r"encoder\.blocks\.(\d+)\.attn\.proj\.weight", "encoder/blocks_{0}/attn/proj/kernel", "linear"),
    (r"encoder\.blocks\.(\d+)\.attn\.proj\.bias", "encoder/blocks_{0}/attn/proj/bias", "none"),
    (r"encoder\.blocks\.(\d+)\.mlp\.fc1\.weight", "encoder/blocks_{0}/mlp/fc1/kernel", "linear"),
    (r"encoder\.blocks\.(\d+)\.mlp\.fc1\.bias", "encoder/blocks_{0}/mlp/fc1/bias", "none"),
    (r"encoder\.blocks\.(\d+)\.mlp\.fc2\.weight", "encoder/blocks_{0}/mlp/fc2/kernel", "linear"),
    (r"encoder\.blocks\.(\d+)\.mlp\.fc2\.bias", "encoder/blocks_{0}/mlp/fc2/bias", "none"),
    (r"encoder\.norm\.weight", "encoder/norm/scale", "none"),
    (r"encoder\.norm\.bias", "encoder/norm/bias", "none"),
    (r"head\.weight", "head/kernel", "linear"),
    (r"head\.bias", "head/bias", "none"),
)

_PREFIX_STRIP = re.compile(r"^(model\.|module\.|_orig_mod\.)")
_SKIP = re.compile(
    r"(ft_extractor|feature_extractor|frontend|spec_converter|amplitude_to_db|"
    r"mel_scale|spectrogram|window|num_batches_tracked|pos_enc)"
)
# short-name position embeddings (tokenizer.pe_t / pe_f): SINUSOID buffers
# recomputed in flax when pe_learnable=False, but REAL learned parameters
# when pe_learnable=True — dropping them then would leave the flax model's
# pos_embed at random init with no error (strict mode ignores skips)
_PE_SHORT = re.compile(r"tokenizer\.pe_([tf])$")
_PE_TARGET = {"t": "temporal", "f": "spectral"}


def _apply(transform: str, value: np.ndarray) -> np.ndarray:
    if transform == "none":
        return value
    if transform == "linear":
        return value.T
    if transform == "conv1d":
        return np.transpose(value, (2, 1, 0))
    if transform == "maybe_squeeze0":
        return value[0] if value.ndim == 3 and value.shape[0] == 1 else value
    raise ValueError(transform)


def convert_torch_state_dict(
    state_dict: Mapping[str, Any], strict: bool = True,
    pe_learnable: bool = False,
) -> Dict[str, np.ndarray]:
    """Convert a torch state dict to a flat ``{'a/b/c': array}`` flax mapping.

    ``pe_learnable`` controls the short-name position-embedding keys
    (``tokenizer.pe_t`` / ``pe_f``): mapped to the flax ``pos_embed_*``
    params when True, skipped as recomputed sinusoid buffers when False.
    """
    out: Dict[str, np.ndarray] = {}
    unmapped = []
    for key, value in state_dict.items():
        key_n = _PREFIX_STRIP.sub("", str(key))
        pe_m = _PE_SHORT.search(key_n)
        if pe_m is not None:
            if not pe_learnable:
                continue
            value = np.asarray(
                value.detach().cpu().numpy() if hasattr(value, "detach") else value
            )
            target = f"encoder/tokenizer/pos_embed_{_PE_TARGET[pe_m.group(1)]}"
            out[target] = _apply("maybe_squeeze0", value)
            continue
        if _SKIP.search(key_n):
            continue
        value = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value
        )
        for pattern, template, transform in _RULES:
            m = re.fullmatch(pattern, key_n)
            if m:
                out[template.format(*m.groups())] = _apply(transform, value)
                break
        else:
            unmapped.append(key_n)
    if unmapped:
        if strict:
            raise ValueError(f"Unmapped torch keys: {unmapped}")
        # non-strict callers still get the diagnostic — a silently dropped
        # key leaves its flax parameter at random init with no trace
        print(f"⚠️ convert: {len(unmapped)} torch key(s) had no mapping rule "
              f"and were dropped: {unmapped}")
    return out


def unflatten(flat: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """``{'a/b': x}`` → nested ``{'a': {'b': x}}`` (flax params tree)."""
    tree: Dict[str, Any] = {}
    for path, value in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def save_params(params, path: str | Path) -> None:
    """Save a flax param tree as a native orbax checkpoint."""
    import jax
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(path).absolute(), jax.device_get(params))
    ckptr.wait_until_finished()


def load_native_checkpoint(path: str | Path):
    """Load a flax param tree saved by ``save_params`` / the trainer."""
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(Path(path).absolute())


def is_native_checkpoint(path: str | Path) -> bool:
    path = Path(path)
    return any((path / marker).exists() for marker in ("_METADATA", "manifest.ocdbt", "d"))


def load_torch_checkpoint(path: str | Path):
    """Load ``(ModelConfig, params)`` from an HF-style checkpoint directory
    containing ``config.json`` and ``pytorch_model.bin`` / ``model.safetensors``."""
    path = Path(path)
    cfg = config_from_hf(path / "config.json")
    sd = None
    st = path / "model.safetensors"
    if st.exists():
        from safetensors.numpy import load_file  # optional dependency

        sd = load_file(str(st))
    else:
        import torch

        for name in ("pytorch_model.bin", "model.pt", "model.bin"):
            p = path / name
            if p.exists():
                sd = torch.load(str(p), map_location="cpu", weights_only=True)
                break
    if sd is None:
        raise FileNotFoundError(f"No weights found under {path}")
    params = {"params": unflatten(convert_torch_state_dict(
        sd, pe_learnable=bool(getattr(cfg.model, "pe_learnable", False))
    ))}
    return cfg, params
