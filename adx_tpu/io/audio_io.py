"""Audio file I/O with librosa.load-compatible semantics.

The reference loads every track with ``librosa.load(path, sr=44100,
duration=120, mono=True)`` (e.g. src/dsp_band_ops.py:679,
src/spectrogram_explainability.py:601) and writes WAVs with soundfile.
Neither librosa nor soundfile nor ffmpeg is available in this environment, so:

* WAV read/write is implemented on ``scipy.io.wavfile`` (PCM16/24/32,
  float32/64), normalizing integer PCM to [-1, 1] exactly as soundfile does.
* mp3/flac/ogg decode shells out to ``ffmpeg`` when present and raises a
  clear error otherwise.
* Resampling to the target rate uses polyphase filtering (host-side; decode
  is a per-track one-time cost, never in the device hot path).
"""

from __future__ import annotations

import shutil
import subprocess
import tempfile
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from adx_tpu.ops.audio import resample_poly, to_mono

_PCM_SCALE = {np.dtype(np.int16): 32768.0, np.dtype(np.int32): 2147483648.0}


def read_wav(path) -> Tuple[np.ndarray, int]:
    """Read a WAV file (path or binary file-like) →
    (float32 samples [n] or [n, ch], sample_rate)."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path if hasattr(path, "read") else str(path))
    if data.dtype in _PCM_SCALE:
        data = data.astype(np.float32) / _PCM_SCALE[data.dtype]
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    return data, int(sr)


def pcm16_quantize(y: np.ndarray) -> np.ndarray:
    """Float → int16 with libsndfile's convention: scale by 2^15 = 32768
    (NOT 32767) and round — the reference writes WAVs via soundfile, whose
    float→PCM16 path is ``lrintf(x * 0x8000)``. With the matching /32768
    read scale the round trip is idempotent. One deviation: we clip at
    32767 where an unclipped libsndfile would WRAP +1.0 to -32768."""
    return np.clip(
        np.round(np.asarray(y) * 32768.0), -32768, 32767
    ).astype(np.int16)


def pcm16_wire(y: np.ndarray):
    """int16 wire form of ``y`` when every sample is EXACTLY
    16-bit-PCM-representable (everything decoded from a PCM16 WAV is),
    else ``None``.

    Single owner of the wire-format rule (round, ×32768 scale, [min,max]
    range check — −32768 is a legal full-scale negative — and the
    roundtrip-equality test) shared by ``runtime/engine.py::to_device_wave``
    and ``features/extraction.py::_to_device_batch``: hand-rolled copies of
    this check have drifted before (the 32767→32768 scale fix and the
    |q|-vs-min/max fix each had to chase twins)."""
    y = np.asarray(y, np.float32)
    q = np.round(y * 32768.0)
    if (
        y.size
        and q.min() >= -32768
        and q.max() <= 32767
        and np.array_equal(q.astype(np.float32) / 32768.0, y)
    ):
        return q.astype(np.int16)
    return None


def pcm16_roundtrip(y: np.ndarray) -> np.ndarray:
    """In-memory twin of ``write_wav(PCM_16)`` + ``read_wav``: the exact
    float values a wave takes after one trip through a 16-bit WAV.  Used
    by the serving layer so batched requests see the SAME samples as the
    serialized temp-WAV path."""
    return pcm16_quantize(y).astype(np.float32) / _PCM_SCALE[np.dtype(np.int16)]


def write_wav(path: str | Path, y: np.ndarray, sr: int, subtype: str = "PCM_16",
              channels_last: Optional[bool] = None) -> None:
    """Write a WAV file (default 16-bit PCM, matching soundfile's default).

    Multi-channel layout: pass ``channels_last=True`` for ``[n, ch]`` input
    or ``False`` for ``[ch, n]``. The default ``None`` keeps the heuristic
    (shorter first axis = channels), which mis-guesses only when a clip has
    fewer frames than channels.
    """
    from scipy.io import wavfile

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    y = np.asarray(y)
    if y.ndim > 1:
        flip = (not channels_last) if channels_last is not None \
            else y.shape[0] < y.shape[-1]
        if flip:
            y = y.T  # [ch, n] → [n, ch]
    if subtype == "PCM_16":
        if y.dtype == np.int16:
            data = y  # already quantized (e.g. on device) — pass through
        else:
            data = pcm16_quantize(y)
    elif subtype == "FLOAT":
        data = y.astype(np.float32)
    else:
        raise ValueError(f"Unsupported subtype: {subtype}")
    wavfile.write(str(path), int(sr), data)


def _decode_via_ffmpeg(path: Path) -> Tuple[np.ndarray, int]:
    if path.suffix.lower() == ".mp3":
        # In-process codec first (the image has libmpg123 but no ffmpeg).
        from adx_tpu.io.mp3 import decode_mp3, have_mp3

        if have_mp3():
            try:
                y, sr = decode_mp3(path.read_bytes())
                return (y.T if y.ndim > 1 else y), sr
            except Exception as e:  # noqa: BLE001 — fall to ffmpeg if any
                if shutil.which("ffmpeg") is None:
                    raise
                print(f"⚠️ Warning: native mp3 decode failed for {path} "
                      f"({e}); retrying via ffmpeg")
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError(
            f"Cannot decode {path.suffix} file {path}: ffmpeg is not installed "
            "and scipy only reads WAV. Convert the dataset to WAV first."
        )
    with tempfile.NamedTemporaryFile(suffix=".wav") as tmp:
        subprocess.run(
            [ffmpeg, "-y", "-v", "error", "-i", str(path), "-f", "wav",
             "-acodec", "pcm_f32le", tmp.name],
            check=True,
        )
        return read_wav(tmp.name)


def load_audio(
    path: str | Path,
    sr: Optional[int] = 44100,
    duration: Optional[float] = None,
    offset: float = 0.0,
    mono: bool = True,
) -> Tuple[np.ndarray, int]:
    """librosa.load-compatible decode: returns (float32 mono wave, sr).

    ``sr=None`` keeps the native rate. ``duration``/``offset`` are applied
    at the NATIVE rate before resampling — librosa seeks
    ``int(offset·sr_native)`` and reads ``int(duration·sr_native)`` frames,
    then resamples only the excerpt, so boundary samples see the
    resampler's zero edge rather than the rest of the file. (For files
    already at the target rate the two orders are identical.)
    """
    path = Path(path)
    if path.suffix.lower() in (".wav", ".wave"):
        y, native_sr = read_wav(path)
    else:
        y, native_sr = _decode_via_ffmpeg(path)
    if y.ndim > 1:
        if mono:
            y = to_mono(y.T)  # read gives [n, ch]
        else:
            y = y.T
    if offset:
        y = y[..., int(offset * native_sr) :]
    if duration is not None:
        y = y[..., : int(duration * native_sr)]
    target_sr = sr or native_sr
    if target_sr != native_sr:
        y = resample_poly(y.astype(np.float32), native_sr, target_sr)
    if y.shape[-1] == 0:
        print(f"⚠️ Warning: decoded 0 samples from {path} (duration={duration}, offset={offset})")
    return np.ascontiguousarray(y, dtype=np.float32), int(target_sr)
