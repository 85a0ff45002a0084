"""Predictor layer — the L1 of the framework.

Replaces the reference's scalar-in/scalar-out torch predictor
(``LocalSonnics.predict`` → one H2D copy + forward + D2H sync per waveform,
src/sonics_api.py:259-271) with a device-resident, batched, mesh-sharded
forward, while keeping the duck-typed surface every explainer consumes:

    predictor.predict(wave, sr) -> float              # fake probability
    predictor.predict_batch(waves, sr) -> np.ndarray
    predictor.predict_from_file(path, sr=44100, duration=None) -> float
    predictor.predict_batch_from_files(paths, ...) -> list[float]

``RemoteSonics`` is a thin HTTP parity client for the HF Space, kept only
for cross-checking against the reference deployment (same retry envelope:
exponential backoff with jitter on 502/503/504 and timeouts,
src/sonics_api.py:88-132).
"""

from __future__ import annotations

import functools
import random
import time
from pathlib import Path
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from adx_tpu.io.audio_io import load_audio
from adx_tpu.models.config import ModelConfig, resolve_preset, tiny_test_config
from adx_tpu.models.spectttra import AudioClassifier, init_params
from adx_tpu.ops.audio import fix_length, resample_poly_device
from adx_tpu.parallel.mesh import batch_sharding, pad_batch, perturbation_mesh, replicate


def enable_fidelity_mode() -> None:
    """True-f32 matmuls everywhere (cross-backend parity mode).

    On TPU, f32 dots default to FAST precision (single bf16 multiply
    passes); measured at SpecTTTra-α scale this moves raw probabilities by
    up to ~0.06 vs CPU f32 at random init. With HIGHEST precision the
    TPU-vs-CPU gap is ≤ 8.8e-4 — inside the 1e-3 parity gate. Costs ~3×
    matmul time; use for parity_check / fidelity runs, not serving.
    """
    jax.config.update("jax_default_matmul_precision", "highest")


class LocalSonics:
    """On-device SpecTTTra predictor.

    Parameters
    ----------
    cfg, params : model configuration and flax parameter tree.
    mesh        : optional 1-D device mesh; the wave batch axis is sharded
                  over it and params are replicated (ICI-only collectives).
    max_batch   : compiled batch size; calls are chunked/padded to it so one
                  compiled program serves every request shape.
    dtype       : transformer compute dtype (bf16 recommended on TPU).
    """

    def __init__(
        self,
        cfg: ModelConfig,
        params,
        mesh=None,
        max_batch: int = 8,
        dtype=jnp.float32,
    ):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else perturbation_mesh()
        n_dev = int(self.mesh.devices.size)
        # the sharded batch axis must divide evenly over the mesh
        self.max_batch = max(1, -(-max_batch // n_dev)) * n_dev
        self.model = AudioClassifier(cfg, dtype=dtype)
        self.params = replicate(self.mesh, params)
        self._wave_sharding = batch_sharding(self.mesh, 2)

        @jax.jit
        def _fwd(p, waves):  # [B, n_samples] -> [B] fake probs
            return jax.nn.sigmoid(self.model.apply(p, waves))

        self._fwd = _fwd
        self._n_samples = cfg.audio.n_samples

        n_model = cfg.audio.n_samples
        sr_model = cfg.audio.sample_rate

        @functools.partial(jax.jit, static_argnames=("src_sr",))
        def _to_model_rate(waves, src_sr: int):
            if src_sr != sr_model:
                waves = resample_poly_device(waves, sr_model, src_sr)
            return fix_length(waves, n_model)

        self._to_model_rate = _to_model_rate

    # -- device-side API (used by the engine; everything stays on device) --

    def forward_device(self, waves: jnp.ndarray) -> jnp.ndarray:
        """``[B, cfg.audio.n_samples]`` model-rate waves → ``[B]`` probs."""
        return self._fwd(self.params, waves)

    def to_model_rate(self, waves: jnp.ndarray, src_sr: int) -> jnp.ndarray:
        """Resample + fix-length to the model's input shape, on device."""
        return self._to_model_rate(waves, int(src_sr))

    # -- host-facing duck-typed API ---------------------------------------

    def predict(self, audio_wave: np.ndarray, sr: int) -> float:
        """Fake probability for one waveform (any length / rate)."""
        return float(self.predict_batch(np.asarray(audio_wave)[None, :], sr)[0])

    def predict_batch(
        self, waves: np.ndarray, sr: int,
        lengths: Optional[Sequence[int]] = None,
    ) -> np.ndarray:
        """Fake probabilities for ``[B, n]`` waveforms (chunked to the
        compiled batch size; last chunk zero-padded, not recompiled).

        ``lengths`` gives each row's true (pre-padding) sample count. When
        resampling occurs, the device resample of a zero-padded row rings
        past the row's true content (the anti-aliasing filter tail), so
        the rows would differ slightly from their single-file results;
        masking each row past ``ceil(len_i·sr_model/sr)`` restores EXACT
        equality with the unbatched path (the resampler zero-extends its
        input, so the valid prefix already matches bit-for-bit)."""
        waves = np.asarray(waves, dtype=np.float32)
        if waves.ndim == 1:
            waves = waves[None]
        sr_model = int(self.cfg.audio.sample_rate)
        out = np.empty((waves.shape[0],), np.float32)
        for lo in range(0, waves.shape[0], self.max_batch):
            chunk = waves[lo : lo + self.max_batch]
            padded, n = pad_batch(chunk, self.max_batch)
            dev = jax.device_put(jnp.asarray(padded), self._wave_sharding)
            dev = self._to_model_rate(dev, int(sr))
            if lengths is not None and int(sr) != sr_model:
                # ceil(m·sr_model/sr), the resampler's output-length
                # convention — note the parenthesization: -(-a // b) is
                # ceil, -(-a) // b is floor
                valid = [
                    -(-(int(m) * sr_model) // int(sr))
                    for m in list(lengths[lo : lo + self.max_batch]) + [0] * self.max_batch
                ][: dev.shape[0]]
                iota = jnp.arange(dev.shape[-1])
                dev = jnp.where(
                    iota[None, :] < jnp.asarray(valid, jnp.int32)[:, None], dev, 0.0
                )
            probs = self.forward_device(dev)
            out[lo : lo + n] = np.asarray(probs)[:n]
        return out

    def predict_from_file(
        self,
        audio_path: Union[str, Path],
        sr: int = 44100,
        duration: Optional[float] = None,
    ) -> float:
        y, _ = load_audio(audio_path, sr=sr, duration=duration, mono=True)
        return self.predict(y, sr)

    def predict_batch_from_files(
        self,
        audio_paths: Sequence[Union[str, Path]],
        sr: int = 44100,
        duration: Optional[float] = None,
        verbose: bool = True,
        waves_out: Optional[dict] = None,
        **kwargs,
    ) -> List[float]:
        """Batched dataset sweep (reference surface: src/sonics_api.py:289-317,
        which predicts file-by-file).

        Files are loaded host-side in ``max_batch`` groups, zero-padded to
        the group's longest waveform, and classified with ONE chunked
        forward per group — ⌈N / max_batch⌉ dispatches total instead of N.
        Per-row true lengths ride along so ``predict_batch`` can zero each
        row's resample tail — batched results equal the single-file path
        EXACTLY even when group members have different lengths.

        ``waves_out`` (a dict) collects the successfully decoded waveforms
        as ``{index: float32 wave}`` so a caller that needs the same audio
        next (e.g. the LIME explain phase) doesn't decode every WAV twice —
        pass it only for datasets small enough to hold in host RAM.
        """
        probs: List[float] = []
        paths = list(audio_paths)
        for lo in range(0, len(paths), self.max_batch):
            group = paths[lo : lo + self.max_batch]
            waves: List[Optional[np.ndarray]] = []
            for idx, path in enumerate(group, start=lo):
                if verbose:
                    print(f"   Predicting {idx+1}/{len(paths)}: {Path(path).name}")
                try:
                    y, _ = load_audio(path, sr=sr, duration=duration, mono=True)
                    w = np.asarray(y, np.float32)
                    waves.append(w)
                    if waves_out is not None:
                        waves_out[idx] = w
                except Exception as e:  # noqa: BLE001 — degrade per file
                    # e.g. mp3 without ffmpeg in the image: skip the file
                    # (NaN marker) instead of killing the dataset sweep
                    print(f"   [Warning] skipping {Path(path).name}: {e}")
                    waves.append(None)
            loaded = [w for w in waves if w is not None]
            group_probs = np.full((len(waves),), np.nan, np.float32)
            if loaded:
                n_max = max(w.shape[-1] for w in loaded)
                batch = np.zeros((len(loaded), n_max), np.float32)
                for i, w in enumerate(loaded):
                    batch[i, : w.shape[-1]] = w
                ok = self.predict_batch(
                    batch, sr, lengths=[w.shape[-1] for w in loaded]
                )
                group_probs[[i for i, w in enumerate(waves) if w is not None]] = ok
            for p in group_probs:
                probs.append(float(p))
                if verbose and np.isfinite(p):
                    print(f"      → Fake prob: {float(p):.4f}")
        return probs

    # -- constructors ------------------------------------------------------

    @classmethod
    def from_pretrained(
        cls,
        name: str,
        checkpoint_dir: Optional[Union[str, Path]] = None,
        device: str = "tpu",  # accepted for config compatibility; unused
        seed: int = 0,
        **kwargs,
    ) -> "LocalSonics":
        """Build from a converted checkpoint directory, or (when no weights
        are available, e.g. offline CI) from the named architecture preset
        with seeded random parameters — clearly announced."""
        del device
        if checkpoint_dir is not None and Path(checkpoint_dir).exists():
            from adx_tpu.models.convert import (
                is_native_checkpoint,
                load_native_checkpoint,
                load_torch_checkpoint,
            )

            import sys as _sys

            # stderr like the random-init warning: bench.py's driver
            # contract is ONE JSON line on stdout, with or without weights
            if is_native_checkpoint(checkpoint_dir):
                cfg = (
                    tiny_test_config() if name in ("tiny", "spectttra-tiny")
                    else resolve_preset(name)
                )
                params = load_native_checkpoint(checkpoint_dir)
                print(f"📥 Loaded native (orbax) checkpoint from {checkpoint_dir}",
                      file=_sys.stderr)
            else:
                cfg, params = load_torch_checkpoint(checkpoint_dir)
                print(f"📥 Loaded converted checkpoint from {checkpoint_dir}",
                      file=_sys.stderr)
        else:
            if name in ("tiny", "spectttra-tiny"):
                cfg = tiny_test_config()
            else:
                cfg = resolve_preset(name)
            # random init runs the full forward trace once; on the TPU that
            # is a ~2 min remote compile of the 120 s program, on the host
            # CPU backend ~12 s (measured) — and the threefry PRNG makes the
            # values backend-independent. Params are device_put onto the
            # mesh by the constructor either way.
            try:
                init_dev = jax.devices("cpu")[0]
            except RuntimeError:
                init_dev = None
            if init_dev is not None and jax.default_backend() != "cpu":
                with jax.default_device(init_dev):
                    params = init_params(cfg, jax.random.key(seed))
            else:
                params = init_params(cfg, jax.random.key(seed))
            import sys as _sys

            # stderr, NOT stdout: bench.py's driver contract is ONE JSON
            # line on stdout (bench reaches this path when the committed
            # checkpoint is absent or --checkpoint random is passed)
            print(
                f"⚠️  No checkpoint weights for {name!r}; using seeded random "
                f"parameters (architecture preset {cfg.name}). Convert the HF "
                "checkpoint with adx_tpu.models.convert for real predictions.",
                file=_sys.stderr,
            )
        return cls(cfg, params, **kwargs)


class RemoteSonics:
    """Thin HF-Space parity client (availability mechanism, not a compute
    path). Mirrors the reference's retry envelope exactly; requires network
    egress, so it is only exercised in deployments that have it."""

    def __init__(
        self,
        space: str,
        model_time: int = 120,
        api_name: str = "/predict",
        model_type: str = "SpecTTTra-α",
        max_retries: int = 20,
        initial_delay: float = 2.0,
        max_delay: float = 60.0,
        timeout: float = 180.0,
    ):
        self.space = space
        self.model_time = model_time
        self.api_name = api_name
        self.model_type = model_type
        self.max_retries = max_retries
        self.initial_delay = initial_delay
        self.max_delay = max_delay
        self.timeout = timeout

    def _backoff(self, attempt: int) -> float:
        return min(self.initial_delay * (2**attempt) + random.uniform(0, 1), self.max_delay)

    def _call_space(self, wav_path: str) -> float:
        # plain-HTTP endpoints (e.g. adx_tpu.serving's server) speak the
        # same confidences envelope without the gradio handshake
        if self.space.startswith(("http://", "https://")):
            return self._call_http(wav_path)
        try:
            from gradio_client import Client, handle_file  # optional dep
        except ImportError as e:
            raise RuntimeError(
                "RemoteSonics requires the gradio_client package (not "
                "installed in this environment). Use LocalSonics instead, "
                "or point `space` at an http(s):// adx_tpu serving endpoint."
            ) from e
        client = Client(self.space)
        result = client.predict(
            audio_file=handle_file(wav_path),
            model_type=self.model_type,
            duration=f"{self.model_time}s",
            api_name=self.api_name,
        )
        return self._parse_confidences(result)

    def _call_http(self, wav_path: str) -> float:
        """POST the WAV to ``{space}/predict`` (adx_tpu.serving envelope)."""
        import json as _json
        import urllib.request

        with open(wav_path, "rb") as f:
            body = f.read()
        req = urllib.request.Request(
            f"{self.space.rstrip('/')}/predict", data=body,
            headers={"Content-Type": "audio/wav"}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return self._parse_confidences(_json.loads(r.read()))

    @staticmethod
    def _parse_confidences(result: dict) -> float:
        """P(fake) from a Space response (reference: src/sonics_api.py:96-101
        — the 'Fake' entry of ``confidences``, 0.0 when absent)."""
        return float(
            next(
                (item["confidence"] for item in result["confidences"] if item["label"] == "Fake"),
                0.0,
            )
        )

    def predict_from_file(self, audio_path: Union[str, Path]) -> float:
        last_err: Optional[Exception] = None
        for attempt in range(self.max_retries):
            try:
                return self._call_space(str(audio_path))
            except Exception as e:  # noqa: BLE001 — retry envelope
                last_err = e
                # gradio_client/requests carry e.response.status_code;
                # urllib.error.HTTPError carries .code (the plain-HTTP
                # mode) — checking only the former left the documented
                # backoff dead for every urllib 502/503/504
                import urllib.error as _uerr

                status = getattr(getattr(e, "response", None), "status_code", None)
                if status is None:
                    status = getattr(e, "code", None)
                retryable = (
                    status in (502, 503, 504)
                    or "Timeout" in type(e).__name__
                    # connect-phase failures (refused/reset/DNS) while a
                    # server restarts surface as URLError without a code
                    or (isinstance(e, _uerr.URLError)
                        and not isinstance(e, _uerr.HTTPError))
                )
                if retryable and attempt < self.max_retries - 1:
                    delay = self._backoff(attempt)
                    print(
                        f"[Warning] {type(e).__name__} (attempt {attempt+1}/{self.max_retries}); "
                        f"retrying after {delay:.2f}s..."
                    )
                    time.sleep(delay)
                    continue
                raise
        # reachable only when max_retries <= 0 (the loop never runs);
        # every executed final attempt re-raises its own exception above
        raise RuntimeError(
            f"Failed to get prediction after {self.max_retries} attempts"
        ) from last_err

    def predict(self, audio_wave: np.ndarray, sr: int) -> float:
        import tempfile

        from adx_tpu.io.audio_io import write_wav

        with tempfile.NamedTemporaryFile(suffix=".wav") as tmp:
            write_wav(tmp.name, audio_wave, sr)
            return self.predict_from_file(tmp.name)

    def predict_batch_from_files(self, audio_paths, verbose: bool = True, **kwargs):
        probs = []
        for idx, path in enumerate(audio_paths):
            if verbose:
                print(f"   Predicting {idx+1}/{len(audio_paths)}: {Path(path).name}")
            probs.append(self.predict_from_file(path))
        return probs


Predictor = Union[LocalSonics, RemoteSonics]


def predict_from_file(predictor: Predictor, audio_path, **kwargs) -> float:
    """Unified dispatch (reference: src/sonics_api.py:319-330)."""
    return predictor.predict_from_file(audio_path, **kwargs)


def predict_batch_from_files(predictor: Predictor, audio_paths, verbose=True, **kwargs):
    """Unified batch dispatch (reference: src/sonics_api.py:332-345)."""
    return predictor.predict_batch_from_files(audio_paths, verbose=verbose, **kwargs)
