"""Batch-inference HTTP server — the serving side of the predictor layer.

The reference consumes a hosted Gradio Space through ``RemoteSonnics``
(reference: src/sonics_api.py:24-228) but ships no server of its own. This
module completes that story: a dependency-free (stdlib ``http.server``)
endpoint that runs ``LocalSonics`` on the local TPU and answers in the same
``{"confidences": [{"label", "confidence"}, ...]}`` envelope the reference's
client parses (reference: src/sonics_api.py:96-101), so either system's
remote client can point at it.

Routes
------
* ``GET  /health``  → ``{"status": "ok", "model": ..., "device": ...}``
* ``POST /predict`` → body = a WAV file (``Content-Type: audio/wav``);
  optional ``?sr=`` overrides the container rate for raw streams.
  Response: ``{"prediction": p_fake, "predicted_class": ...,
  "confidences": [{"label": "Fake", ...}, {"label": "Real", ...}]}``

Requests are serialized through a lock: the TPU forward itself is batched
per call, and one device grant serves one program at a time anyway.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional


def _make_handler(predictor, lock: threading.Lock, model_name: str):
    class Handler(BaseHTTPRequestHandler):
        server_version = "adx_tpu"

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 — http.server API
            if self.path.split("?")[0] != "/health":
                self._send(404, {"error": f"unknown path {self.path!r}"})
                return
            import jax

            self._send(
                200,
                {
                    "status": "ok",
                    "model": model_name,
                    "device": str(jax.devices()[0]),
                },
            )

        def do_POST(self):  # noqa: N802 — http.server API
            path, _, query = self.path.partition("?")
            if path != "/predict":
                self._send(404, {"error": f"unknown path {self.path!r}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length <= 0:
                    self._send(400, {"error": "empty body; POST a WAV file"})
                    return
                raw = self.rfile.read(length)
                from adx_tpu.io.audio_io import read_wav

                wave, sr = read_wav(io.BytesIO(raw))
                for kv in query.split("&"):
                    if kv.startswith("sr="):
                        sr = int(kv[3:])
                if wave.ndim > 1:
                    wave = wave.mean(axis=-1)
            except Exception as e:  # noqa: BLE001 — malformed client input
                self._send(400, {"error": f"could not decode WAV body: {e}"})
                return
            try:
                with lock:
                    p_fake = float(predictor.predict(wave, sr))
            except Exception as e:  # noqa: BLE001 — surface compute errors
                self._send(500, {"error": f"prediction failed: {e}"})
                return
            self._send(
                200,
                {
                    "prediction": p_fake,
                    "predicted_class": "Fake" if p_fake > 0.5 else "Real",
                    "confidences": [
                        {"label": "Fake", "confidence": p_fake},
                        {"label": "Real", "confidence": 1.0 - p_fake},
                    ],
                },
            )

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def make_server(
    predictor,
    host: str = "127.0.0.1",
    port: int = 8756,
    model_name: str = "spectttra",
) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; call ``serve_forever()``."""
    handler = _make_handler(predictor, threading.Lock(), model_name)
    return ThreadingHTTPServer((host, port), handler)


def serve(
    model: str = "spectttra-alpha-120s",
    checkpoint_dir: Optional[str] = None,
    host: str = "127.0.0.1",
    port: int = 8756,
    max_batch: int = 8,
):
    """Load the predictor and serve until interrupted."""
    from adx_tpu.predict import LocalSonics

    predictor = LocalSonics.from_pretrained(
        model, checkpoint_dir=checkpoint_dir, max_batch=max_batch
    )
    # warm the forward once so the first request doesn't pay the compile
    import numpy as np

    predictor.predict(
        np.zeros(predictor.cfg.audio.n_samples, np.float32),
        predictor.cfg.audio.sample_rate,
    )
    srv = make_server(predictor, host=host, port=port, model_name=model)
    print(f"serving {model} on http://{host}:{port}  (POST /predict, GET /health)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
