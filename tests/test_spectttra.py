"""SpecTTTra model tests: shapes, frontend golden values, and torch→flax
conversion parity (the 'tiny-random-weights forward parity test' from the
test strategy — SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adx_tpu.models import AudioClassifier
from adx_tpu.models.config import tiny_test_config
from adx_tpu.models.convert import (
    config_from_hf,
    convert_torch_state_dict,
    unflatten,
)
from adx_tpu.models.spectttra import init_params


@pytest.fixture(scope="module")
def tiny_cfg():
    return tiny_test_config()


def test_forward_shapes(tiny_cfg):
    params = init_params(tiny_cfg, jax.random.key(0))
    model = AudioClassifier(tiny_cfg)
    wave = jnp.asarray(
        np.random.default_rng(0).standard_normal((3, tiny_cfg.audio.n_samples)),
        jnp.float32,
    )
    logits = model.apply(params, wave)
    assert logits.shape == (3,)
    probs = jax.nn.sigmoid(logits)
    assert np.all((np.asarray(probs) >= 0) & (np.asarray(probs) <= 1))


def test_frontend_matches_numpy_reference(tiny_cfg):
    """MelFrontend == htk mel power spec → dB(ref=1, top_db) → mean/std."""
    from adx_tpu.models.spectttra import MelFrontend
    from adx_tpu.ops import melspectrogram

    a = tiny_cfg.audio
    rng = np.random.default_rng(3)
    wave = rng.standard_normal((2, a.n_samples)).astype(np.float32)

    fe = MelFrontend(tiny_cfg)
    got = np.asarray(fe.apply({"params": {}}, jnp.asarray(wave)))

    M = np.asarray(
        melspectrogram(
            jnp.asarray(wave), sr=a.sample_rate, n_fft=a.n_fft,
            hop_length=a.hop_length, win_length=a.win_length, n_mels=a.n_mels,
            fmin=a.f_min, fmax=a.f_max, htk=True, norm=None, power=2.0,
            pad_mode="reflect",
        )
    )
    S_db = 10.0 * np.log10(np.maximum(M, 1e-10))
    S_db = np.maximum(S_db, S_db.max(axis=(-2, -1), keepdims=True) - a.top_db)
    want = (S_db - S_db.mean(axis=(-2, -1), keepdims=True)) / (
        S_db.std(axis=(-2, -1), keepdims=True) + 1e-6
    )
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert got.shape == (2, a.n_mels, a.n_frames)


def test_torch_conversion_parity(tiny_cfg):
    """torch mirror forward == converted flax forward on the same spec."""
    import torch

    from tests.torch_mirror import TorchAudioClassifierNoFrontend

    torch.manual_seed(0)
    tmodel = TorchAudioClassifierNoFrontend(tiny_cfg).eval()

    a = tiny_cfg.audio
    spec = np.random.default_rng(5).standard_normal(
        (2, a.n_mels, a.n_frames)
    ).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.tensor(spec)).numpy()

    flat = convert_torch_state_dict(tmodel.state_dict())
    params = {"params": unflatten(flat)}
    model = AudioClassifier(tiny_cfg)
    got = np.asarray(
        model.apply(params, jnp.asarray(spec), method=AudioClassifier.classify_spec)
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_torch_conversion_parity_learnable_pe():
    import dataclasses

    import torch

    from tests.torch_mirror import TorchAudioClassifierNoFrontend

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, pe_learnable=True)
    )
    torch.manual_seed(1)
    tmodel = TorchAudioClassifierNoFrontend(cfg).eval()
    a = cfg.audio
    spec = np.random.default_rng(6).standard_normal((1, a.n_mels, a.n_frames)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.tensor(spec)).numpy()
    params = {"params": unflatten(convert_torch_state_dict(tmodel.state_dict()))}
    got = np.asarray(
        AudioClassifier(cfg).apply(params, jnp.asarray(spec), method=AudioClassifier.classify_spec)
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_config_from_hf_roundtrip():
    cfg = config_from_hf(
        {
            "name": "spectttra-alpha-120s",
            "audio": {"sample_rate": 16000, "max_time": 120, "n_mels": 128},
            "model": {"t_clip": 3, "f_clip": 1, "embed_dim": 384, "depth": 12},
        }
    )
    assert cfg.audio.n_samples == 1_920_000
    assert cfg.model.num_layers == 12
    assert cfg.t_tokens == (1 + 1_920_000 // 512) // 3
    assert cfg.f_tokens == 128


def test_convert_reports_unmapped():
    with pytest.raises(ValueError, match="Unmapped"):
        convert_torch_state_dict({"totally.unknown.weight": np.zeros((2, 2))})


@pytest.mark.parametrize("preset", ["spectttra-alpha-120s", "spectttra-gamma-5s"])
def test_torch_conversion_parity_full_size(preset):
    """Production-shape conversion parity (VERDICT r1 #9): layout/PE/size
    bugs only visible at real scale (alpha-120s: 3573 tokens, 12 layers;
    gamma-5s exercises t_clip=5/f_clip=3 tokenizers)."""
    import torch

    from adx_tpu.models.config import resolve_preset
    from tests.torch_mirror import TorchAudioClassifierNoFrontend

    cfg = resolve_preset(preset)
    torch.manual_seed(7)
    tmodel = TorchAudioClassifierNoFrontend(cfg).eval()

    a = cfg.audio
    spec = np.random.default_rng(9).standard_normal(
        (1, a.n_mels, a.n_frames)
    ).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.tensor(spec)).numpy()

    params = {"params": unflatten(convert_torch_state_dict(tmodel.state_dict()))}
    got = np.asarray(
        AudioClassifier(cfg).apply(
            params, jnp.asarray(spec), method=AudioClassifier.classify_spec
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_convert_nonstrict_reports_unmapped_keys(capsys):
    """strict=False must PRINT dropped keys (the module contract says
    unmapped keys are reported, never silently discarded)."""
    import numpy as np

    from adx_tpu.models.convert import convert_torch_state_dict

    sd = {"encoder.blocks.0.attn.q_norm.weight": np.ones(4, np.float32)}
    convert_torch_state_dict(sd, strict=False)
    assert "no mapping rule" in capsys.readouterr().out
