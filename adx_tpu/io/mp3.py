"""MP3 encode/decode on the image's shared codec libraries, via ctypes.

The reference's mp3_192 degradation arm and mp3 ingestion both shell out to
``ffmpeg`` (Notebooks/0. AnalyzeSongs/analyzesongs.ipynb cell 7,
``degrade_mp3_roundtrip``: WAV → ``ffmpeg -b:a 192k`` → MP3 → ``ffmpeg`` →
WAV → librosa.load at the original rate).  ffmpeg's MP3 encoder *is*
libmp3lame and its decoder honors the LAME gapless tag, so binding the
image's ``libmp3lame.so.0`` (encode) and ``libmpg123.so.0`` (gapless
decode) directly reproduces the same round trip without the missing ffmpeg
binary — this is the runtime tier of the framework (native codecs under a
Python surface), not a compute-path shortcut.

Both libraries are loaded lazily; ``have_mp3()`` gates callers so images
without the codecs degrade to the reference's "return input unchanged"
fallback.
"""

from __future__ import annotations

import ctypes as C
import threading
from typing import Optional, Tuple

import numpy as np

_lock = threading.Lock()
_lame: Optional[C.CDLL] = None
_mpg: Optional[C.CDLL] = None
_mpg_inited = False

# mpg123.h constants
_MPG123_OK = 0
_MPG123_DONE = -12
_MPG123_NEW_FORMAT = -11
_MPG123_ENC_FLOAT_32 = 0x200
_MPG123_MONO = 1
_MPG123_STEREO = 2

# lame.h: vbr_mode_e
_VBR_OFF = 0


def _load() -> bool:
    global _lame, _mpg, _mpg_inited
    with _lock:
        if _lame is not None and _mpg is not None:
            return True
        try:
            lame = C.CDLL("libmp3lame.so.0")
            mpg = C.CDLL("libmpg123.so.0")
        except OSError:
            return False
        lame.lame_init.restype = C.c_void_p
        for fn in (
            "lame_set_in_samplerate", "lame_set_out_samplerate",
            "lame_set_num_channels", "lame_set_brate", "lame_set_VBR",
            "lame_set_bWriteVbrTag",
        ):
            getattr(lame, fn).argtypes = [C.c_void_p, C.c_int]
            getattr(lame, fn).restype = C.c_int
        lame.lame_init_params.argtypes = [C.c_void_p]
        lame.lame_init_params.restype = C.c_int
        lame.lame_encode_buffer_ieee_float.argtypes = [
            C.c_void_p, C.POINTER(C.c_float), C.POINTER(C.c_float),
            C.c_int, C.c_char_p, C.c_int,
        ]
        lame.lame_encode_buffer_ieee_float.restype = C.c_int
        lame.lame_encode_flush.argtypes = [C.c_void_p, C.c_char_p, C.c_int]
        lame.lame_encode_flush.restype = C.c_int
        lame.lame_get_lametag_frame.argtypes = [C.c_void_p, C.c_char_p, C.c_size_t]
        lame.lame_get_lametag_frame.restype = C.c_size_t
        lame.lame_close.argtypes = [C.c_void_p]

        mpg.mpg123_new.restype = C.c_void_p
        mpg.mpg123_new.argtypes = [C.c_char_p, C.POINTER(C.c_int)]
        mpg.mpg123_format_none.argtypes = [C.c_void_p]
        mpg.mpg123_format.argtypes = [C.c_void_p, C.c_long, C.c_int, C.c_int]
        mpg.mpg123_rates.argtypes = [C.POINTER(C.POINTER(C.c_long)),
                                     C.POINTER(C.c_size_t)]
        mpg.mpg123_open_feed.argtypes = [C.c_void_p]
        mpg.mpg123_feed.argtypes = [C.c_void_p, C.c_char_p, C.c_size_t]
        mpg.mpg123_getformat.argtypes = [C.c_void_p, C.POINTER(C.c_long),
                                         C.POINTER(C.c_int), C.POINTER(C.c_int)]
        mpg.mpg123_read.argtypes = [C.c_void_p, C.c_char_p, C.c_size_t,
                                    C.POINTER(C.c_size_t)]
        mpg.mpg123_close.argtypes = [C.c_void_p]
        mpg.mpg123_delete.argtypes = [C.c_void_p]
        if not _mpg_inited:
            mpg.mpg123_init()
            _mpg_inited = True
        _lame, _mpg = lame, mpg
        return True


def have_mp3() -> bool:
    """True when both codec libraries are present in the image."""
    return _load()


def encode_mp3(y: np.ndarray, sr: int, bitrate_kbps: int = 192) -> bytes:
    """Encode float waveform ``y`` ([-1, 1]; ``[n]`` mono or ``[ch, n]``)
    to a CBR MP3 bytestream with the LAME/Info gapless tag (what ffmpeg's
    ``-b:a 192k`` produces)."""
    if not _load():
        raise RuntimeError("libmp3lame is not available")
    y = np.asarray(y, np.float32)
    if y.ndim == 1:
        # The encode loop does raw pointer arithmetic — a strided view
        # would be read as if contiguous and encode the wrong samples.
        y = np.ascontiguousarray(y)
        chans = [y, y]
        n_ch = 1
    elif y.ndim == 2 and y.shape[0] in (1, 2):
        n_ch = y.shape[0]
        chans = [np.ascontiguousarray(y[0]),
                 np.ascontiguousarray(y[-1])]
    else:
        raise ValueError(f"expected [n] or [ch<=2, n], got {y.shape}")
    n = chans[0].shape[0]

    gfp = _lame.lame_init()
    try:
        _lame.lame_set_in_samplerate(gfp, int(sr))
        _lame.lame_set_out_samplerate(gfp, int(sr))
        _lame.lame_set_num_channels(gfp, n_ch)
        _lame.lame_set_brate(gfp, int(bitrate_kbps))
        _lame.lame_set_VBR(gfp, _VBR_OFF)
        _lame.lame_set_bWriteVbrTag(gfp, 1)
        if _lame.lame_init_params(gfp) < 0:
            raise RuntimeError("lame_init_params failed (unsupported sr?)")

        out = bytearray()
        chunk = 65536
        buf = C.create_string_buffer(int(1.25 * chunk) + 7200)
        lp = chans[0].ctypes.data_as(C.POINTER(C.c_float))
        rp = chans[1].ctypes.data_as(C.POINTER(C.c_float))
        for start in range(0, n, chunk):
            m = min(chunk, n - start)
            lq = C.cast(C.addressof(lp.contents) + 4 * start,
                        C.POINTER(C.c_float))
            rq = C.cast(C.addressof(rp.contents) + 4 * start,
                        C.POINTER(C.c_float))
            k = _lame.lame_encode_buffer_ieee_float(gfp, lq, rq, m, buf,
                                                    len(buf))
            if k < 0:
                raise RuntimeError(f"lame_encode_buffer failed: {k}")
            out += buf.raw[:k]
        k = _lame.lame_encode_flush(gfp, buf, len(buf))
        if k < 0:
            raise RuntimeError(f"lame_encode_flush failed: {k}")
        out += buf.raw[:k]
        # Finalize the Info/LAME tag (first frame) so decoders can strip the
        # encoder delay+padding — required for a gapless round trip.
        tag = C.create_string_buffer(8192)
        tlen = _lame.lame_get_lametag_frame(gfp, tag, len(tag))
        # tlen > len(tag) means the buffer was too small and NOTHING was
        # written (LAME's documented contract) — splicing tag.raw[:tlen]
        # would shift-corrupt the stream, so require it fits the tag buffer
        if 0 < tlen <= len(tag) and tlen <= len(out):
            out[:tlen] = tag.raw[:tlen]
        return bytes(out)
    finally:
        _lame.lame_close(gfp)


def decode_mp3(data: bytes) -> Tuple[np.ndarray, int]:
    """Decode an MP3 bytestream to (float32 ``[n]`` mono / ``[ch, n]``, sr),
    honoring the LAME gapless tag (mpg123's default), like ffmpeg's
    decoder."""
    if not _load():
        raise RuntimeError("libmpg123 is not available")
    err = C.c_int(0)
    h = _mpg.mpg123_new(None, C.byref(err))
    if not h:
        raise RuntimeError(f"mpg123_new failed: {err.value}")
    try:
        # Restrict output to float32 at every supported native rate.
        rates = C.POINTER(C.c_long)()
        n_rates = C.c_size_t(0)
        _mpg.mpg123_rates(C.byref(rates), C.byref(n_rates))
        _mpg.mpg123_format_none(h)
        for i in range(n_rates.value):
            _mpg.mpg123_format(h, rates[i], _MPG123_MONO | _MPG123_STEREO,
                               _MPG123_ENC_FLOAT_32)
        if _mpg.mpg123_open_feed(h) != _MPG123_OK:
            raise RuntimeError("mpg123_open_feed failed")
        if _mpg.mpg123_feed(h, data, len(data)) != _MPG123_OK:
            raise RuntimeError("mpg123_feed failed")

        rate = C.c_long(0)
        n_ch = C.c_int(0)
        enc = C.c_int(0)
        first_fmt = None
        chunks = []
        buf = C.create_string_buffer(1 << 18)
        done = C.c_size_t(0)
        while True:
            rc = _mpg.mpg123_read(h, buf, len(buf), C.byref(done))
            if done.value:
                chunks.append(buf.raw[: done.value])
            if rc == _MPG123_NEW_FORMAT:
                _mpg.mpg123_getformat(h, C.byref(rate), C.byref(n_ch),
                                      C.byref(enc))
                if first_fmt is None:
                    first_fmt = (int(rate.value), int(n_ch.value))
                elif (int(rate.value), int(n_ch.value)) != first_fmt:
                    # A mid-stream rate/channel change means mpg123 resynced
                    # onto garbage ("Frankenstein stream") after the real
                    # track — keep the leading coherent stream and stop,
                    # like ffmpeg. Letting the loop continue would label
                    # ALL the PCM with the tail's format (e.g. a corrupt
                    # tail relabeling 44.1 kHz audio as 8 kHz).
                    break
                continue
            if rc == _MPG123_OK:
                continue
            # Feed API signals "need more input" once the buffer drains;
            # we fed everything, so any other status ends the stream.
            break
        pcm = np.frombuffer(b"".join(chunks), np.float32)
        if pcm.size == 0 or first_fmt is None or first_fmt[0] <= 0:
            raise ValueError("no MP3 frames decoded (not an MP3 stream?)")
        sr_out, ch_out = first_fmt
        if ch_out > 1:
            pcm = pcm.reshape(-1, ch_out).T
        return np.ascontiguousarray(pcm), sr_out
    finally:
        _mpg.mpg123_close(h)
        _mpg.mpg123_delete(h)


def mp3_roundtrip(y: np.ndarray, sr: int, bitrate_kbps: int = 192) -> np.ndarray:
    """Encode+decode at ``sr`` (the mp3_192 arm's WAV→MP3→WAV semantics).

    MP3 frames quantize the stream length; like ffmpeg's gapless decode the
    result length matches the input to within one granule, and is trimmed /
    zero-padded to the exact input length (the notebook re-normalizes LUFS
    afterwards, so sub-frame tail padding is immaterial)."""
    y = np.asarray(y, np.float32)
    out, out_sr = decode_mp3(encode_mp3(y, sr, bitrate_kbps))
    if out_sr != sr:
        from adx_tpu.ops.audio import resample_poly

        out = resample_poly(out, out_sr, sr)
    n = y.shape[-1]
    if out.shape[-1] >= n:
        out = out[..., :n]
    else:
        pad = [(0, 0)] * (out.ndim - 1) + [(0, n - out.shape[-1])]
        out = np.pad(out, pad)
    if y.ndim == 2 and out.ndim == 1:
        out = np.tile(out, (y.shape[0], 1))
    return np.ascontiguousarray(out, np.float32)
