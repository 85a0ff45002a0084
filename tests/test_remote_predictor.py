"""RemoteSonics parity-client tests: retry envelope (exp backoff, retryable
status codes, timeout-by-name), confidence parsing, and the unified dispatch
wrappers — all with a stubbed Space call (reference semantics:
src/sonics_api.py:50-144 retry loop, :319-345 dispatch)."""

import numpy as np
import pytest

from adx_tpu.predict import RemoteSonics, predict_batch_from_files, predict_from_file


class _HTTPError(Exception):
    def __init__(self, status):
        super().__init__(f"status {status}")

        class _Resp:
            status_code = status

        self.response = _Resp()


class _ReadTimeout(Exception):
    pass


def _client(**kw):
    kw.setdefault("initial_delay", 0.0)
    kw.setdefault("max_delay", 0.0)
    return RemoteSonics("user/space", **kw)


def test_backoff_formula():
    c = RemoteSonics("user/space", initial_delay=2.0, max_delay=60.0)
    for attempt in range(8):
        d = c._backoff(attempt)
        assert 0.0 <= d <= 60.0
        assert d >= min(2.0 * 2**attempt, 60.0) - 1e-9 or d == 60.0
    # large attempt is clamped by max_delay
    assert c._backoff(20) == 60.0


def test_parse_confidences():
    result = {
        "confidences": [
            {"label": "Real", "confidence": 0.3},
            {"label": "Fake", "confidence": 0.7},
        ]
    }
    assert RemoteSonics._parse_confidences(result) == pytest.approx(0.7)
    # missing Fake entry → 0.0 (reference default)
    assert RemoteSonics._parse_confidences({"confidences": []}) == 0.0


def test_retry_on_502_then_success(monkeypatch):
    c = _client()
    calls = {"n": 0}

    def flaky(path):
        calls["n"] += 1
        if calls["n"] < 3:
            raise _HTTPError(502)
        return 0.42

    monkeypatch.setattr(c, "_call_space", flaky)
    assert c.predict_from_file("x.wav") == pytest.approx(0.42)
    assert calls["n"] == 3


@pytest.mark.parametrize("status", [502, 503, 504])
def test_retryable_statuses(monkeypatch, status):
    c = _client(max_retries=3)
    calls = {"n": 0}

    def always_fail(path):
        calls["n"] += 1
        raise _HTTPError(status)

    monkeypatch.setattr(c, "_call_space", always_fail)
    with pytest.raises(_HTTPError):
        c.predict_from_file("x.wav")
    assert calls["n"] == 3  # exhausted all retries


def test_timeout_by_type_name_is_retryable(monkeypatch):
    c = _client()
    calls = {"n": 0}

    def flaky(path):
        calls["n"] += 1
        if calls["n"] == 1:
            raise _ReadTimeout("socket timed out")
        return 0.9

    monkeypatch.setattr(c, "_call_space", flaky)
    assert c.predict_from_file("x.wav") == pytest.approx(0.9)
    assert calls["n"] == 2


def test_non_retryable_error_raises_immediately(monkeypatch):
    c = _client()
    calls = {"n": 0}

    def fail(path):
        calls["n"] += 1
        raise _HTTPError(400)

    monkeypatch.setattr(c, "_call_space", fail)
    with pytest.raises(_HTTPError):
        c.predict_from_file("x.wav")
    assert calls["n"] == 1


def test_predict_writes_wav_and_dispatch(monkeypatch, tmp_path):
    c = _client()
    seen = {}

    def fake_call(path):
        from adx_tpu.io.audio_io import read_wav

        wave, sr = read_wav(path)
        seen["n_samples"], seen["sr"] = len(wave), sr
        return 0.5

    monkeypatch.setattr(c, "_call_space", fake_call)
    wave = np.sin(np.linspace(0, 100, 8000)).astype(np.float32)
    assert c.predict(wave, sr=8000) == pytest.approx(0.5)
    assert seen == {"n_samples": 8000, "sr": 8000}

    # unified dispatch wrappers route to the same methods
    monkeypatch.setattr(c, "predict_from_file", lambda p, **kw: 0.25)
    assert predict_from_file(c, "a.wav") == 0.25
    assert predict_batch_from_files(c, ["a.wav", "b.wav"], verbose=False) == [0.25, 0.25]
