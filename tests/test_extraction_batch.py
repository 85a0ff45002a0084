"""Batched feature extraction (extraction.extract_all_features_batch /
extract_features_for_paths) vs the serial path: same schema, same values
within the documented tolerances (spectral stats are the same program
vmapped; HNR reduces in f32 on device; device pyin decodes states that were
bit-exact to the host on all test signals)."""

import numpy as np
import pytest

import adx_tpu.features.pyin_device as PD
from adx_tpu.features.extraction import (
    extract_all_features,
    extract_all_features_batch,
    extract_features_for_paths,
)

SR = 22050


@pytest.fixture(autouse=True)
def _small_bucket(monkeypatch):
    monkeypatch.setattr(PD, "LENGTH_BUCKET", 1 << 15)


def _waves(rng, n=SR * 2, b=2):
    t = np.arange(n) / SR
    w = np.stack([
        0.3 * np.sin(2 * np.pi * (220 + 40 * i) * t)
        + 0.02 * rng.standard_normal(n)
        for i in range(b)
    ]).astype(np.float32)
    # PCM16-exact (as anything loaded from the experiment WAV trees is) —
    # exercises the int16 wire format
    return np.round(w * 32768) / 32768


def _flat(d, pre=""):
    out = {}
    for k, v in d.items():
        if isinstance(v, dict):
            out.update(_flat(v, pre + k + "."))
        else:
            out[pre + k] = v
    return out


def _assert_close(serial, batch):
    fs, fb = _flat(serial), _flat(batch)
    assert set(fs) == set(fb)
    for k in fs:
        a, b = fs[k], fb[k]
        if isinstance(a, list):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7, err_msg=k)
        elif isinstance(a, float):
            if np.isnan(a):
                assert np.isnan(b), k
            else:
                np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6, err_msg=k)
        else:
            assert a == b, k


def test_batch_matches_serial(rng):
    waves = _waves(rng, b=3)
    batch = extract_all_features_batch(waves, SR)
    for i in range(3):
        _assert_close(extract_all_features(waves[i], SR), batch[i])


def test_batch_pow2_padding_is_transparent(rng):
    """B=3 pads to 4 on device; the zero row must not leak into results."""
    waves = _waves(rng, b=3)
    b3 = extract_all_features_batch(waves, SR)
    b2 = extract_all_features_batch(waves[:2], SR)  # B=2, no padding
    assert len(b3) == 3 and len(b2) == 2
    _assert_close(b2[0], b3[0])


def test_extract_features_for_paths(tmp_path, rng):
    from adx_tpu.io.audio_io import write_wav

    waves = _waves(rng, b=2)
    paths = []
    for i, w in enumerate(waves):
        p = tmp_path / f"w{i}.wav"
        write_wav(p, w.astype(np.float32), SR)
        paths.append(p)
    paths.insert(1, tmp_path / "missing.wav")  # containment: None, not raise

    out = extract_features_for_paths(paths, SR, batch_size=4)
    assert out[1] is None
    _assert_close(extract_all_features(waves[0], SR), out[0])
    _assert_close(extract_all_features(waves[1], SR), out[2])


def test_extract_features_for_paths_mixed_lengths(tmp_path, rng):
    """Different lengths land in different batches but return in order."""
    from adx_tpu.io.audio_io import write_wav

    w_long = _waves(rng, n=SR * 2, b=1)[0]
    w_short = _waves(rng, n=SR, b=1)[0]
    paths = []
    for i, w in enumerate([w_long, w_short, w_long]):
        p = tmp_path / f"m{i}.wav"
        write_wav(p, w.astype(np.float32), SR)
        paths.append(p)
    out = extract_features_for_paths(paths, SR)
    assert all(o is not None for o in out)
    assert out[0]["duration"] == pytest.approx(2.0, abs=1e-3)
    assert out[1]["duration"] == pytest.approx(1.0, abs=1e-3)


def test_serial_fallback_flag(tmp_path, rng):
    from adx_tpu.io.audio_io import write_wav

    w = _waves(rng, n=SR, b=1)[0]
    p = tmp_path / "s.wav"
    write_wav(p, w.astype(np.float32), SR)
    out = extract_features_for_paths([p], SR, device_batch=False)
    _assert_close(extract_all_features(w, SR), out[0])


def test_pcm16_wire_single_owner():
    """pcm16_wire owns the int16 wire-format rule (round, x32768 scale,
    [-32768, 32767] range incl. full-scale negative, roundtrip equality)."""
    from adx_tpu.io.audio_io import pcm16_wire

    y = np.array([0.5, -1.0, 0.25], np.float32)  # -1.0 -> -32768 is legal
    q = pcm16_wire(y)
    assert q is not None and q.dtype == np.int16
    assert np.array_equal(q, [16384, -32768, 8192])
    assert np.array_equal(q.astype(np.float32) / 32768.0, y)
    # not representable -> None (float not on the PCM16 grid)
    assert pcm16_wire(np.array([0.1], np.float32)) is None
    # out of range -> None
    assert pcm16_wire(np.array([1.5], np.float32)) is None
    assert pcm16_wire(np.array([], np.float32)) is None


def test_batch_failure_falls_back_serially(tmp_path, rng, monkeypatch):
    """One failing device batch must not abort the stage — the helper
    retries that batch's files serially (per-file containment)."""
    import adx_tpu.features.extraction as E
    from adx_tpu.io.audio_io import write_wav

    waves = _waves(rng, n=SR, b=2)
    paths = []
    for i, w in enumerate(waves):
        p = tmp_path / f"f{i}.wav"
        write_wav(p, w.astype(np.float32), SR)
        paths.append(p)

    def boom(*a, **k):
        raise RuntimeError("synthetic device failure")

    monkeypatch.setattr(E, "extract_all_features_batch", boom)
    out = E.extract_features_for_paths(paths, SR)
    assert all(o is not None for o in out)
    _assert_close(extract_all_features(waves[0], SR), out[0])
