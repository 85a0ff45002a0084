"""Native pyin Viterbi (adx_tpu/native/pyin_viterbi.c) vs the numpy twin.

The C kernel must be BIT-EXACT to ``features/pyin.py::_viterbi_numpy`` —
same f32/f64 mixed-precision steps, same np.argmax first-max tie rule —
so the decoded state sequences are compared with strict equality, not a
tolerance. Reference behavior: librosa.pyin's Viterbi decode
(reference src/feature_extraction.py:11-13).
"""

import numpy as np
import pytest

from adx_tpu.features import pyin as pyin_mod
from adx_tpu.native import pyin_viterbi_native


def _random_problem(rng, T, M, K, quantize=False):
    obs_v = np.log(np.maximum(rng.random((T, M)) ** 4, 1e-30))
    voiced_prob = rng.random(T)
    obs_u = np.log(np.maximum((1.0 - voiced_prob)[:, None] / M, 1e-30))
    if quantize:
        # coarse quantization forces frequent exact ties in the banded
        # argmax, exercising the first-max tie rule
        obs_v = np.round(obs_v)
        obs_u = np.round(obs_u)
    offsets = np.arange(-K, K + 1)
    tri = 1.0 - np.abs(offsets) / (K + 1)
    tri /= tri.sum()
    log_tri = np.log(tri)
    log_stay = float(np.log1p(-0.01))
    log_switch = float(np.log(0.01))
    delta_init = np.full((2, M), np.log(1.0 / (2 * M)), np.float32)
    delta_init[0] += obs_v[0]
    delta_init[1] += obs_u[0]
    return obs_v, obs_u, log_tri, log_stay, log_switch, delta_init


@pytest.mark.parametrize("quantize", [False, True])
@pytest.mark.parametrize("T,M,K", [(37, 61, 9), (12, 301, 50), (64, 30, 3)])
def test_native_matches_numpy(T, M, K, quantize):
    rng = np.random.default_rng(hash((T, M, K, quantize)) % 2**32)
    obs_v, obs_u, log_tri, log_stay, log_switch, delta_init = _random_problem(
        rng, T, M, K, quantize
    )
    out = pyin_viterbi_native(
        obs_v, obs_u, log_tri.astype(np.float32), K, log_stay, log_switch,
        delta_init,
    )
    if out is None:
        pytest.skip("native toolchain unavailable")
    states_c, voiced_c = out
    states_np, voiced_np = pyin_mod._viterbi_numpy(
        obs_v, obs_u, log_tri, K, log_stay, log_switch, delta_init
    )
    np.testing.assert_array_equal(states_c, states_np)
    np.testing.assert_array_equal(voiced_c, voiced_np)


def test_band_envelope_guard():
    # 2K > 255 falls outside the uint8 backpointer envelope -> None
    rng = np.random.default_rng(0)
    obs_v, obs_u, log_tri, log_stay, log_switch, delta_init = _random_problem(
        rng, 4, 600, 130
    )
    assert pyin_viterbi_native(
        obs_v, obs_u, log_tri.astype(np.float32), 130, log_stay, log_switch,
        delta_init,
    ) is None


def test_pyin_end_to_end_native_vs_fallback(monkeypatch):
    sr = 22050
    t = np.arange(int(2.0 * sr)) / sr
    # tone + silence gap + tone (the gap regression shape from ADVICE r2)
    y = np.sin(2 * np.pi * 220.0 * t).astype(np.float32)
    y[int(0.8 * sr) : int(1.2 * sr)] = 0.0
    f0_n, v_n, p_n = pyin_mod.pyin(y, 65.4, 2093.0, sr=sr)

    monkeypatch.setattr(
        "adx_tpu.native.pyin_viterbi_native", lambda *a, **k: None
    )
    f0_f, v_f, p_f = pyin_mod.pyin(y, 65.4, 2093.0, sr=sr)
    np.testing.assert_array_equal(v_n, v_f)
    np.testing.assert_array_equal(f0_n, f0_f)
    np.testing.assert_array_equal(p_n, p_f)
    assert v_n.any() and not v_n.all()


@pytest.mark.parametrize("T,M,K", [(37, 61, 9), (12, 301, 50)])
def test_native_matches_numpy_with_renorm(T, M, K):
    """The per-source edge-renormalization penalty (librosa
    transition_local row normalization) must decode identically in both
    kernels."""
    rng = np.random.default_rng(hash((T, M, K, "rn")) % 2**32)
    obs_v, obs_u, log_tri, log_stay, log_switch, delta_init = _random_problem(
        rng, T, M, K, False
    )
    tri = np.exp(log_tri)
    valid = np.convolve(np.ones(M), tri, mode="full")[K: K + M]
    rn = np.log(np.minimum(valid, 1.0)).astype(np.float32)
    out = pyin_viterbi_native(
        obs_v, obs_u, log_tri.astype(np.float32), K, log_stay, log_switch,
        delta_init, rn=rn,
    )
    if out is None:
        pytest.skip("native toolchain unavailable")
    states_c, voiced_c = out
    states_np, voiced_np = pyin_mod._viterbi_numpy(
        obs_v, obs_u, log_tri, K, log_stay, log_switch, delta_init, rn=rn
    )
    np.testing.assert_array_equal(states_c, states_np)
    np.testing.assert_array_equal(voiced_c, voiced_np)
    # and the penalty actually matters somewhere near the band edges
    plain = pyin_mod._viterbi_numpy(
        obs_v, obs_u, log_tri, K, log_stay, log_switch, delta_init
    )
    assert not (np.array_equal(plain[0], states_np)
                and np.array_equal(plain[1], voiced_np)) or M <= 2 * K
