"""HTTP inference server tests: health, predict round-trip (envelope matches
the reference client's expectations), and malformed-input handling."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from adx_tpu.predict import LocalSonics
from adx_tpu.serving import make_server

SR = 8000


@pytest.fixture(scope="module")
def tiny_predictor():
    """ONE tiny predictor for the whole module — each from_pretrained pays
    param init + jit retracing, pure wasted wall-clock on the 1-core host."""
    return LocalSonics.from_pretrained("tiny", max_batch=8)


@pytest.fixture(scope="module")
def server(tiny_predictor):
    predictor = tiny_predictor
    srv = make_server(predictor, host="127.0.0.1", port=0, model_name="tiny")
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", predictor
    srv.shutdown()
    srv.server_close()


def _wav_bytes(y, sr):
    from adx_tpu.io.audio_io import write_wav
    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as tmp:
        name = tmp.name
    try:
        write_wav(name, y, sr)
        with open(name, "rb") as f:
            return f.read()
    finally:
        os.unlink(name)


def test_health(server):
    url, _ = server
    with urllib.request.urlopen(f"{url}/health", timeout=30) as r:
        payload = json.loads(r.read())
    assert payload["status"] == "ok"
    assert payload["model"] == "tiny"


def test_predict_roundtrip_matches_local(server):
    url, predictor = server
    rng = np.random.default_rng(0)
    n = predictor.cfg.audio.n_samples
    y = (0.4 * np.sin(2 * np.pi * 440 * np.arange(n) / SR)
         + 0.05 * rng.standard_normal(n)).astype(np.float32)
    req = urllib.request.Request(
        f"{url}/predict", data=_wav_bytes(y, SR),
        headers={"Content-Type": "audio/wav"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        payload = json.loads(r.read())
    # the envelope the reference's RemoteSonnics parses
    labels = {c["label"]: c["confidence"] for c in payload["confidences"]}
    assert set(labels) == {"Fake", "Real"}
    assert labels["Fake"] + labels["Real"] == pytest.approx(1.0, abs=1e-6)
    assert payload["prediction"] == pytest.approx(labels["Fake"])
    # 16-bit PCM quantization on the wire → compare against the same
    # quantized wave locally
    y_q = np.clip(np.round(y * 32768.0), -32768, 32767).astype(np.int16) / 32768.0
    local = predictor.predict(y_q.astype(np.float32), SR)
    assert payload["prediction"] == pytest.approx(local, abs=1e-4)


def test_predict_rejects_garbage(server):
    url, _ = server
    req = urllib.request.Request(
        f"{url}/predict", data=b"not a wav at all",
        headers={"Content-Type": "audio/wav"}, method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
    assert "could not decode" in json.loads(ei.value.read())["error"]


def test_unknown_route_404(server):
    url, _ = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(f"{url}/nope", timeout=30)
    assert ei.value.code == 404


def test_remote_client_against_own_server(server, tmp_path):
    """Full remote loop without gradio: RemoteSonics pointed at the adx_tpu
    HTTP server must reproduce the local prediction (16-bit wire quantized)."""
    from adx_tpu.io.audio_io import write_wav
    from adx_tpu.predict import RemoteSonics

    url, predictor = server
    rng = np.random.default_rng(5)
    n = predictor.cfg.audio.n_samples
    y = (0.3 * np.sin(2 * np.pi * 330 * np.arange(n) / SR)
         + 0.05 * rng.standard_normal(n)).astype(np.float32)
    path = tmp_path / "remote.wav"
    write_wav(path, y, SR)

    client = RemoteSonics(url)
    remote = client.predict_from_file(path)
    y_q = np.clip(np.round(y * 32768.0), -32768, 32767).astype(np.int16) / 32768.0
    local = predictor.predict(y_q.astype(np.float32), SR)
    assert remote == pytest.approx(local, abs=1e-4)

    # a 400 from the server must surface as a NON-retryable HTTPError
    # (bare `Exception` would also accept an unrelated client bug)
    import urllib.error

    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"definitely not wav")
    with pytest.raises(urllib.error.HTTPError) as exc:
        RemoteSonics(url, max_retries=2, initial_delay=0.0).predict_from_file(bad)
    assert exc.value.code == 400


# ---------------------------------------------------------------------------
# Micro-batching window
# ---------------------------------------------------------------------------


def test_microbatcher_coalesces_and_matches_serial(tiny_predictor):
    from concurrent.futures import ThreadPoolExecutor

    from adx_tpu.serving import MicroBatcher

    predictor = tiny_predictor
    n = predictor.cfg.audio.n_samples
    rng = np.random.default_rng(3)
    waves = [
        (0.3 * np.sin(2 * np.pi * (200 + 40 * i) * np.arange(n) / SR)
         + 0.02 * rng.standard_normal(n)).astype(np.float32)
        for i in range(8)
    ]
    serial = [predictor.predict(w, SR) for w in waves]

    calls = []
    orig = predictor.predict_batch

    def counting(arr, sr, lengths=None):
        calls.append(arr.shape[0])
        return orig(arr, sr, lengths=lengths)

    predictor.predict_batch = counting
    try:
        batcher = MicroBatcher(predictor, window_ms=200.0)
        with ThreadPoolExecutor(8) as pool:
            got = list(pool.map(lambda w: batcher.submit(w, SR), waves))
        batcher.close()
    finally:
        predictor.predict_batch = orig

    np.testing.assert_allclose(got, serial, atol=1e-6)
    # all 8 concurrent requests arrived within the window -> few batches,
    # strictly fewer dispatches than requests
    assert sum(calls) == 8
    assert len(calls) < 8
    assert batcher.n_requests == 8 and batcher.n_batches == len(calls)


def test_microbatcher_groups_by_sample_rate(tiny_predictor):
    from concurrent.futures import ThreadPoolExecutor

    from adx_tpu.serving import MicroBatcher

    predictor = tiny_predictor
    n = predictor.cfg.audio.n_samples
    w1 = (0.3 * np.sin(2 * np.pi * 330 * np.arange(n) / SR)).astype(np.float32)
    w2 = (0.3 * np.sin(2 * np.pi * 330 * np.arange(2 * n) / (2 * SR))).astype(np.float32)
    want = [predictor.predict(w1, SR), predictor.predict(w2, 2 * SR)]

    batcher = MicroBatcher(predictor, window_ms=100.0)
    try:
        with ThreadPoolExecutor(2) as pool:
            f1 = pool.submit(batcher.submit, w1, SR)
            f2 = pool.submit(batcher.submit, w2, 2 * SR)
            got = [f1.result(timeout=60), f2.result(timeout=60)]
    finally:
        batcher.close()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_server_with_batching_window(tiny_predictor):
    import urllib.error
    from concurrent.futures import ThreadPoolExecutor

    predictor = tiny_predictor
    srv = make_server(predictor, host="127.0.0.1", port=0, model_name="tiny",
                      batch_window_ms=150.0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        n = predictor.cfg.audio.n_samples
        rng = np.random.default_rng(5)
        waves = [
            (0.3 * np.sin(2 * np.pi * (220 + 60 * i) * np.arange(n) / SR)
             + 0.02 * rng.standard_normal(n)).astype(np.float32)
            for i in range(4)
        ]
        want = [predictor.predict(w, SR) for w in waves]

        def post(w):
            req = urllib.request.Request(
                f"{url}/predict", data=_wav_bytes(w, SR),
                headers={"Content-Type": "audio/wav"}, method="POST",
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())["prediction"]

        with ThreadPoolExecutor(4) as pool:
            got = list(pool.map(post, waves))
        np.testing.assert_allclose(got, want, atol=1e-4)

        with urllib.request.urlopen(f"{url}/health", timeout=30) as r:
            health = json.loads(r.read())
        assert health["batching"]["requests"] == 4
        assert health["batching"]["batches"] < 4
    finally:
        srv.shutdown()
        srv.server_close()


def test_explain_endpoint_disabled_by_default(server):
    url, _ = server
    import urllib.error

    req = urllib.request.Request(
        f"{url}/explain", data=_wav_bytes(np.zeros(SR // 2, np.float32), SR),
        headers={"Content-Type": "audio/wav"}, method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 404
    assert "not enabled" in json.loads(exc.value.read())["error"]


def test_explain_endpoint_full_record(tiny_predictor):
    predictor = tiny_predictor
    srv = make_server(
        predictor, host="127.0.0.1", port=0, model_name="tiny",
        explain_kwargs=dict(
            sr=SR, duration=predictor.cfg.audio.duration,
            n_fft=256, hop_length=128, win_length=256,
            patch_time_frames=8, stride_time_frames=8,
            patch_freq_percent=50.0, stride_freq_percent=50.0,
            num_samples_lime=16,
        ),
    )
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        n = SR // 2
        t = np.arange(n) / SR
        rng = np.random.default_rng(11)
        y = (0.3 * np.sin(2 * np.pi * 300 * t)
             + 0.02 * rng.standard_normal(n)).astype(np.float32)
        req = urllib.request.Request(
            f"{url}/explain", data=_wav_bytes(y, SR),
            headers={"Content-Type": "audio/wav"}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            record = json.loads(r.read())
        assert 0.0 <= record["baseline_pred"] <= 1.0
        assert len(record["fbp"]["bands"]) == 6
        assert record["occlusion"]["n_patches"] > 0
        assert set(record["lime"]["component_influences"]) == {
            "vocals0", "drums0", "bass0", "other0",
        }
        # the engine is reused across requests (one service instance)
        assert srv.explain_service._engine is not None
        with urllib.request.urlopen(req2 := urllib.request.Request(
            f"{url}/explain", data=_wav_bytes(y, SR),
            headers={"Content-Type": "audio/wav"}, method="POST",
        ), timeout=600) as r:
            record2 = json.loads(r.read())
        assert record2["baseline_pred"] == pytest.approx(record["baseline_pred"], abs=1e-6)
        del req2
    finally:
        srv.shutdown()
        srv.server_close()


def test_explain_batcher_coalesces_and_matches_serial(tiny_predictor):
    """Concurrent /explain requests coalesce into ONE multi-track batched
    explanation (VERDICT r2 item 6) and match the serialized endpoint."""
    from concurrent.futures import ThreadPoolExecutor

    predictor = tiny_predictor
    explain_kwargs = dict(
        sr=SR, duration=predictor.cfg.audio.duration,
        n_fft=256, hop_length=128, win_length=256,
        patch_time_frames=8, stride_time_frames=8,
        patch_freq_percent=50.0, stride_freq_percent=50.0,
        num_samples_lime=16,
    )
    srv = make_server(
        predictor, host="127.0.0.1", port=0, model_name="tiny",
        explain_kwargs=explain_kwargs, explain_batch_window_ms=300.0,
    )
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        n = int(SR * predictor.cfg.audio.duration)
        rng = np.random.default_rng(17)
        waves = [
            (0.3 * np.sin(2 * np.pi * (260 + 80 * i) * np.arange(n) / SR)
             + 0.02 * rng.standard_normal(n)).astype(np.float32)
            for i in range(3)
        ]
        serial = [srv.explain_service.explain(w, SR) for w in waves]

        def post(w):
            req = urllib.request.Request(
                f"{url}/explain", data=_wav_bytes(w, SR),
                headers={"Content-Type": "audio/wav"}, method="POST",
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                return json.loads(r.read())

        with ThreadPoolExecutor(3) as pool:
            got = list(pool.map(post, waves))

        assert srv.explain_batcher.n_requests == 3
        assert srv.explain_batcher.n_batches < 3
        for s, g in zip(serial, got):
            assert g["baseline_pred"] == pytest.approx(s["baseline_pred"], abs=1e-4)
            for bs, bg in zip(s["fbp"]["bands"], g["fbp"]["bands"]):
                assert bg["importance"] == pytest.approx(bs["importance"], abs=2e-4)
            for comp, w in s["lime"]["component_influences"].items():
                assert g["lime"]["component_influences"][comp] == pytest.approx(
                    w, abs=1e-3)
            assert g["batch_size"] >= 1
    finally:
        srv.shutdown()
        srv.server_close()


def test_explain_many_matches_serial_path_exactly(tiny_predictor):
    """The batched path (explain_many) must return the same numbers as the
    serialized path (explain) for the SAME request: both now take an
    identical PCM16 quantize→dequantize trip, so whether a request happened
    to coalesce cannot change its explanation."""
    from adx_tpu.serving import ExplainService

    predictor = tiny_predictor
    svc = ExplainService(
        predictor,
        sr=SR, duration=predictor.cfg.audio.duration,
        n_fft=256, hop_length=128, win_length=256,
        patch_time_frames=8, stride_time_frames=8,
        patch_freq_percent=50.0, stride_freq_percent=50.0,
        num_samples_lime=16,
    )
    n = int(SR * predictor.cfg.audio.duration)
    rng = np.random.default_rng(23)
    # deliberately NOT PCM16-exact: quantization must be applied by both paths
    w = (0.3 * np.sin(2 * np.pi * 330 * np.arange(n) / SR)
         + 0.02 * rng.standard_normal(n)).astype(np.float32)
    serial = svc.explain(w, SR)
    batched = svc.explain_many([(w, SR)])[0]
    assert batched["baseline_pred"] == pytest.approx(
        serial["baseline_pred"], abs=2e-5)
    for bs, bg in zip(serial["fbp"]["bands"], batched["fbp"]["bands"]):
        assert bg["importance"] == pytest.approx(bs["importance"], abs=5e-5)
    for comp, wgt in serial["lime"]["component_influences"].items():
        assert batched["lime"]["component_influences"][comp] == pytest.approx(
            wgt, abs=5e-4)


def test_wav_bytes_downmixes_multichannel():
    """[ch, n] input must downmix to mono, not be serialized as one channel
    of back-to-back whole channels (double-length garbage)."""
    from adx_tpu.io.audio_io import read_wav
    from adx_tpu.serving import wav_bytes

    n = 1000
    t = np.arange(n) / SR
    stereo = np.stack([np.sin(2 * np.pi * 220 * t),
                       np.sin(2 * np.pi * 440 * t)]).astype(np.float32)
    for layout in (stereo, stereo.T):  # [ch, n] and [n, ch]
        y, sr = read_wav(io.BytesIO(wav_bytes(layout, SR)))
        assert sr == SR
        assert y.ndim == 1 and len(y) == n
        np.testing.assert_allclose(y, stereo.mean(axis=0), atol=1.5 / 32768)


def test_explain_batcher_holds_for_inflight_uploads():
    """Upload-aware coalescing: an arrival skewed past the fixed window
    still joins the batch while its body is marked in-flight (the measured
    hardware failure mode: GIL-serialized decode skews arrivals ~0.5 s, so
    a 150 ms window alone never coalesces 120 s tracks)."""
    import time as _time

    from adx_tpu.serving import ExplainBatcher

    class FakeService:
        def __init__(self):
            self.batch_sizes = []

        def explain_many(self, items):
            self.batch_sizes.append(len(items))
            return [{"i": float(w.sum())} for w, _ in items]

    svc = FakeService()
    batcher = ExplainBatcher(svc, window_ms=50.0, max_batch=4)
    try:
        w = np.ones(8, np.float32)

        # Slow uploader: marks in-flight, then takes 0.4 s (>> window) to
        # finish "decoding" before submitting.
        def slow():
            batcher.upload_started()
            _time.sleep(0.4)
            return batcher.submit(w * 2, SR, uploaded=True)

        def fast():
            batcher.upload_started()
            return batcher.submit(w, SR, uploaded=True)

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(2) as pool:
            f_slow = pool.submit(slow)
            # wait until slow's upload mark has actually landed — a fixed
            # sleep races on a loaded 1-core host
            deadline = _time.monotonic() + 5.0
            while batcher._inflight == 0 and _time.monotonic() < deadline:
                _time.sleep(0.005)
            assert batcher._inflight > 0
            f_fast = pool.submit(fast)
            r_fast, r_slow = f_fast.result(10), f_slow.result(10)
        assert svc.batch_sizes == [2]
        assert r_fast["i"] == pytest.approx(8.0)
        assert r_slow["i"] == pytest.approx(16.0)

        # An aborted upload releases the hold: a lone submit dispatches
        # as a batch of 1 without waiting out max_stall.
        batcher.upload_started()
        batcher.upload_aborted()
        t0 = _time.monotonic()
        batcher.submit(w, SR)
        assert _time.monotonic() - t0 < 2.0
        assert svc.batch_sizes == [2, 1]
    finally:
        batcher.close()


def test_remote_sonics_retries_urllib_503():
    """urllib.error.HTTPError carries .code (not .response.status_code) —
    the documented 502/503/504 backoff must fire in plain-HTTP mode."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from adx_tpu.io.audio_io import write_wav
    from adx_tpu.predict import RemoteSonics

    calls = {"n": 0}

    class Flaky(BaseHTTPRequestHandler):
        def do_POST(self):
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            calls["n"] += 1
            if calls["n"] < 3:
                self.send_response(503)
                self.end_headers()
                return
            body = json.dumps({"confidences": [
                {"label": "Fake", "confidence": 0.77},
                {"label": "Real", "confidence": 0.23},
            ]}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Flaky)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        import tempfile

        client = RemoteSonics(
            f"http://127.0.0.1:{srv.server_address[1]}",
            max_retries=5, initial_delay=0.01, max_delay=0.02, timeout=10.0,
        )
        with tempfile.NamedTemporaryFile(suffix=".wav") as tmp:
            write_wav(tmp.name, np.zeros(256, np.float32), SR)
            p = client.predict_from_file(tmp.name)
        assert p == pytest.approx(0.77)
        assert calls["n"] == 3  # two 503s retried, third succeeded
    finally:
        srv.shutdown()
        srv.server_close()


def test_explain_batcher_isolates_bad_request():
    """One degenerate request in a coalesced batch must not 500 its peers
    (per-item fallback after a batched failure)."""
    from concurrent.futures import ThreadPoolExecutor

    from adx_tpu.serving import ExplainBatcher

    class FlakyService:
        def explain_many(self, items):
            if any(w.size == 0 for w, _ in items):
                raise ValueError("empty wave")
            return [{"i": float(w.sum())} for w, _ in items]

    svc = FlakyService()
    batcher = ExplainBatcher(svc, window_ms=200.0, max_batch=4)
    try:
        good = np.ones(8, np.float32)
        bad = np.zeros(0, np.float32)
        with ThreadPoolExecutor(2) as pool:
            f_good = pool.submit(batcher.submit, good, SR)
            f_bad = pool.submit(batcher.submit, bad, SR)
            assert f_good.result(10)["i"] == pytest.approx(8.0)
            with pytest.raises(ValueError):
                f_bad.result(10)
    finally:
        batcher.close()


def test_predict_batch_lengths_mask_matches_single_under_resample():
    """Mixed-length rows resampled in one batch must equal their
    single-file predictions exactly (resample-tail mask). The short row's
    length is chosen so len·sr_model % sr != 0 — a floor instead of ceil
    in the valid-length math zeroes the final real resampled sample."""
    predictor = LocalSonics.from_pretrained("tiny", max_batch=4)
    src_sr = 2 * SR  # force the resample path
    rng = np.random.default_rng(9)
    n_long = int(src_sr * predictor.cfg.audio.duration)
    n_short = n_long // 2 + 1  # odd → ceil(n·1/2) != floor(n·1/2)
    waves = [
        (0.3 * np.sin(2 * np.pi * 330 * np.arange(n_long) / src_sr)
         + 0.02 * rng.standard_normal(n_long)).astype(np.float32),
        (0.3 * np.sin(2 * np.pi * 440 * np.arange(n_short) / src_sr)
         + 0.02 * rng.standard_normal(n_short)).astype(np.float32),
    ]
    singles = [predictor.predict(w, src_sr) for w in waves]
    n_max = max(len(w) for w in waves)
    batch = np.zeros((2, n_max), np.float32)
    for i, w in enumerate(waves):
        batch[i, : len(w)] = w
    got = predictor.predict_batch(batch, src_sr, lengths=[len(w) for w in waves])
    np.testing.assert_allclose(got, singles, atol=2e-6)


def test_microbatcher_holds_for_inflight_uploads():
    """The /predict batcher is upload-aware like ExplainBatcher: an arrival
    skewed past the fixed window still joins the batch while its body is
    marked in-flight."""
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    from adx_tpu.serving import MicroBatcher

    class FakePredictor:
        max_batch = 8

        def __init__(self):
            self.batch_sizes = []

        def predict_batch(self, arr, sr, lengths=None):
            self.batch_sizes.append(arr.shape[0])
            return arr.sum(axis=-1)

    pred = FakePredictor()
    batcher = MicroBatcher(pred, window_ms=50.0)
    try:
        w = np.ones(8, np.float32)

        def slow():
            batcher.upload_started()
            _time.sleep(0.4)
            return batcher.submit(w * 2, SR, uploaded=True)

        def fast():
            batcher.upload_started()
            return batcher.submit(w, SR, uploaded=True)

        with ThreadPoolExecutor(2) as pool:
            f_slow = pool.submit(slow)
            deadline = _time.monotonic() + 5.0
            while batcher._inflight == 0 and _time.monotonic() < deadline:
                _time.sleep(0.005)
            assert batcher._inflight > 0
            f_fast = pool.submit(fast)
            r_fast, r_slow = f_fast.result(10), f_slow.result(10)
        assert pred.batch_sizes == [2]
        assert r_fast == pytest.approx(8.0)
        assert r_slow == pytest.approx(16.0)
    finally:
        batcher.close()


def test_post_explain_client_resident_worker(tmp_path, tiny_predictor):
    """`post_explain` (the --server ad-hoc CLI path) round-trips a WAV file
    through a resident explain worker and matches the in-process service."""
    from adx_tpu.io.audio_io import write_wav
    from adx_tpu.serving import post_explain, wav_bytes

    predictor = tiny_predictor
    explain_kwargs = dict(
        sr=SR, duration=predictor.cfg.audio.duration,
        n_fft=256, hop_length=128, win_length=256,
        patch_time_frames=8, stride_time_frames=8,
        patch_freq_percent=50.0, stride_freq_percent=50.0,
        num_samples_lime=16,
    )
    srv = make_server(predictor, host="127.0.0.1", port=0, model_name="tiny",
                      explain_kwargs=explain_kwargs)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        n = int(SR * predictor.cfg.audio.duration)
        rng = np.random.default_rng(3)
        y = (0.3 * np.sin(2 * np.pi * 330 * np.arange(n) / SR)
             + 0.02 * rng.standard_normal(n)).astype(np.float32)
        p = tmp_path / "query.wav"
        write_wav(p, y, SR)

        got_file = post_explain(url, p)            # path form
        got_wave = post_explain(url, y, sr=SR)     # waveform form
        want = srv.explain_service.explain(y, SR)

        for got in (got_file, got_wave):
            assert got["baseline_pred"] == pytest.approx(
                want["baseline_pred"], abs=1e-3)
            assert set(got["lime"]["component_influences"]) == set(
                want["lime"]["component_influences"])

        # the in-memory encoder produces bytes the file writer agrees with
        assert wav_bytes(y, SR) == p.read_bytes()
    finally:
        srv.shutdown()
        srv.server_close()


def test_explain_batcher_max_batch_zero_clamped():
    """max_batch=0 (plumbed unvalidated from --explain-max-batch) used to
    busy-spin dispatching empty batches while every future blocked forever;
    the shared base clamps to 1 and requests resolve."""
    from adx_tpu.serving import ExplainBatcher

    class FakeService:
        def explain_many(self, items):
            return [{"i": float(w.sum())} for w, _ in items]

    batcher = ExplainBatcher(FakeService(), window_ms=10.0, max_batch=0)
    try:
        assert batcher.max_batch == 1
        out = batcher.submit(np.ones(4, np.float32), 8000, timeout=10.0)
        assert out == {"i": 4.0}
    finally:
        batcher.close()


def test_warm_explain_batches_traces_each_size():
    """warm_explain_batches pre-traces T=1 via explain() and each T>1 via
    explain_many() with T identical synthetic tracks (VERDICT r3 item 4)."""
    from adx_tpu.serving import warm_explain_batches

    calls = []

    class Stub:
        kwargs = {"sr": 8000, "duration": 0.25}

        def explain(self, w, sr):
            calls.append(("serial", 1, sr, len(w)))
            return {}

        def explain_many(self, items):
            calls.append(("many", len(items), items[0][1], len(items[0][0])))
            return [{}] * len(items)

    warm_explain_batches(Stub(), 3)
    # coalescing default: T=1 warms through explain_many too — the batcher
    # dispatches lone requests through the same *_multi program family
    # (warming T=1 via explain() left the first real single request paying
    # a measured ~200 s trace)
    assert [(k, t) for k, t, *_ in calls] == [("many", 1), ("many", 2), ("many", 3)]
    assert all(sr == 8000 and n == 2000 for _, _, sr, n in calls)

    calls.clear()
    warm_explain_batches(Stub(), 1, use_batched_path=False)
    assert [(k, t) for k, t, *_ in calls] == [("serial", 1)]
