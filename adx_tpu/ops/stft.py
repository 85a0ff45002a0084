"""STFT / ISTFT / Griffin-Lim for TPU.

Semantics follow librosa 0.10 (the DSP library used throughout the reference:
src/spectrogram_explainability.py:364-411, src/dsp_band_ops.py:379-426):

* ``stft``: hann (periodic) window of ``win_length`` zero-padded centered to
  ``n_fft``; ``center=True`` pads the signal by ``n_fft // 2`` on both sides
  (``pad_mode='constant'`` i.e. zeros, librosa's default since 0.10);
  output layout ``[..., 1 + n_fft // 2, n_frames]``.
* ``istft``: windowed overlap-add divided by the window-sum-square envelope,
  then the ``n_fft // 2`` center padding is trimmed from both ends.
* ``griffin_lim``: momentum-accelerated phase recovery (momentum 0.99,
  random phase init) matching ``librosa.griffinlim``'s update rule.

TPU notes
---------
Everything here is shape-static and jit-friendly. Framing and overlap-add
avoid gathers/scatters when ``n_fft`` is a multiple of ``hop_length`` (the
committed configuration: 2048 / 512 — configs/FBP_configs/
fbp_experiment.yaml:78-80): frames decompose into ``n_fft // hop`` aligned
hop-sized chunks, so both directions become reshapes + shifted adds that XLA
fuses into bandwidth-bound loops; the FFT itself lowers to XLA's native rFFT.
All functions broadcast over arbitrary leading batch dimensions, which is how
the explainers evaluate the whole perturbation batch in one program.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_TINY = 1.1754944e-38  # smallest positive normal float32 (librosa util.tiny)


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic (fftbins=True) hann window, identical to
    ``scipy.signal.get_window('hann', win_length, fftbins=True)``."""
    n = np.arange(win_length)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    return jnp.asarray(w, dtype=dtype)


def _pad_center(window: jnp.ndarray, size: int) -> jnp.ndarray:
    """Zero-pad ``window`` centered to length ``size`` (librosa pad_center)."""
    n = window.shape[-1]
    lpad = (size - n) // 2
    return jnp.pad(window, (lpad, size - n - lpad))


def get_window(window, win_length: int, n_fft: int, dtype=jnp.float32) -> jnp.ndarray:
    """Resolve a window spec (name or array) and center-pad it to ``n_fft``."""
    if isinstance(window, str):
        if window != "hann":
            raise ValueError(f"Unsupported window: {window!r} (only 'hann')")
        w = hann_window(win_length, dtype=dtype)
    else:
        w = jnp.asarray(window, dtype=dtype)
    if w.shape[-1] > n_fft:
        raise ValueError("win_length may not exceed n_fft")
    return _pad_center(w, n_fft)


def _pad_mode(pad_mode: str) -> str:
    """Validate the supported STFT pad modes with a descriptive error."""
    if pad_mode not in ("constant", "reflect"):
        raise ValueError(
            f"Unsupported pad_mode {pad_mode!r}: only 'constant' and "
            f"'reflect' are implemented (librosa accepts any np.pad mode)"
        )
    return pad_mode


def n_frames_for(n_samples: int, n_fft: int, hop_length: int, center: bool = True) -> int:
    """Number of STFT frames produced for a signal of ``n_samples``."""
    if center:
        # the center pad adds 2·(n_fft//2) samples — for odd n_fft that is
        # n_fft − 1, so the common `1 + n//hop` shortcut overcounts by one
        padded = n_samples + 2 * (n_fft // 2)
        return 1 + (padded - n_fft) // hop_length
    return 1 + (n_samples - n_fft) // hop_length


def frame_signal(y: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """Slide a window of ``frame_length`` with ``hop_length`` over the last axis.

    Returns ``[..., n_frames, frame_length]``. When ``frame_length`` is a
    multiple of ``hop_length`` this is pure reshape + slice + stack (no
    gather); otherwise it falls back to a gather.
    """
    n = y.shape[-1]
    if n < frame_length:
        raise ValueError(
            f"frame_signal: signal of {n} samples is shorter than "
            f"frame_length={frame_length} (zero frames); pad the signal "
            f"(stft(center=True) does) or shorten the frame"
        )
    n_frames = 1 + (n - frame_length) // hop_length
    if frame_length % hop_length == 0:
        m = frame_length // hop_length
        usable = (n_frames - 1 + m) * hop_length
        chunks = y[..., :usable].reshape(*y.shape[:-1], -1, hop_length)
        # frame t = concat(chunks[t], ..., chunks[t + m - 1])
        parts = [chunks[..., k : k + n_frames, :] for k in range(m)]
        return jnp.concatenate(parts, axis=-1)
    idx = (
        np.arange(n_frames)[:, None] * hop_length + np.arange(frame_length)[None, :]
    )
    return y[..., idx]


def _overlap_add(frames: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """Overlap-add ``[..., n_frames, frame_length]`` → ``[..., out_len]``.

    ``out_len = frame_length + hop_length * (n_frames - 1)``. When
    ``frame_length % hop_length == 0`` this is ``m`` shifted pad-and-adds of
    contiguous ``[..., n_frames * hop]`` buffers — no scatter.
    """
    *batch, n_frames, frame_length = frames.shape
    out_len = frame_length + hop_length * (n_frames - 1)
    if frame_length % hop_length == 0:
        m = frame_length // hop_length
        chunks = frames.reshape(*batch, n_frames, m, hop_length)
        out = jnp.zeros((*batch, out_len), dtype=frames.dtype)
        flat_len = n_frames * hop_length
        for k in range(m):
            flat = chunks[..., :, k, :].reshape(*batch, flat_len)
            pad = [(0, 0)] * len(batch) + [(k * hop_length, out_len - flat_len - k * hop_length)]
            out = out + jnp.pad(flat, pad)
        return out
    # general fallback: scatter-add
    out = jnp.zeros((*batch, out_len), dtype=frames.dtype)
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(frame_length)[None, :]
    return out.at[..., idx.reshape(-1)].add(frames.reshape(*batch, -1))


def window_sumsquare(
    window: jnp.ndarray, n_frames: int, hop_length: int
) -> jnp.ndarray:
    """Sum of squared, hop-shifted window copies (ISTFT normalization env)."""
    w2 = (window * window)[None, :]
    tiled = jnp.broadcast_to(w2, (n_frames, window.shape[-1]))
    return _overlap_add(tiled, hop_length)


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "win_length", "window", "center", "pad_mode"),
)
def stft(
    y: jnp.ndarray,
    n_fft: int = 2048,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: str = "hann",
    center: bool = True,
    pad_mode: str = "constant",
) -> jnp.ndarray:
    """Short-time Fourier transform; complex output ``[..., 1+n_fft//2, T]``."""
    hop_length = hop_length or n_fft // 4
    win_length = win_length or n_fft
    if not jnp.issubdtype(y.dtype, jnp.floating):
        # an int16 wire-format wave that missed its dequant would otherwise
        # cast the hann window to an int unit impulse — garbage spectra
        # with no error
        y = y.astype(jnp.float32)
    w = get_window(window, win_length, n_fft, dtype=y.dtype)
    if center:
        pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        y = jnp.pad(y, pad, mode=_pad_mode(pad_mode))
    frames = frame_signal(y, n_fft, hop_length) * w
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.swapaxes(spec, -1, -2)


@functools.partial(
    jax.jit,
    static_argnames=("hop_length", "win_length", "n_fft", "window", "center", "length"),
)
def istft(
    S: jnp.ndarray,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    n_fft: Optional[int] = None,
    window: str = "hann",
    center: bool = True,
    length: Optional[int] = None,
) -> jnp.ndarray:
    """Inverse STFT of ``[..., 1+n_fft//2, T]`` → ``[..., n_samples]``."""
    if n_fft is None:
        n_fft = 2 * (S.shape[-2] - 1)
    hop_length = hop_length or n_fft // 4
    win_length = win_length or n_fft
    w = get_window(window, win_length, n_fft, dtype=jnp.float32)

    frames = jnp.fft.irfft(jnp.swapaxes(S, -1, -2), n=n_fft, axis=-1)
    return _finish_istft(frames, w, hop_length, S.shape[-1], n_fft, center, length)


def _finish_istft(frames, w, hop_length, n_frames, n_fft, center, length):
    """Window, overlap-add, envelope-normalize and trim ISTFT frames."""
    frames = frames.astype(jnp.float32) * w
    y = _overlap_add(frames, hop_length)

    env = window_sumsquare(w, n_frames, hop_length)
    y = jnp.where(env > _TINY, y / jnp.where(env > _TINY, env, 1.0), y)

    if center:
        if length is None:
            y = y[..., n_fft // 2 : y.shape[-1] - n_fft // 2]
        else:
            # librosa.istft(length=...) trims only the HEAD and fix_lengths
            # the rest — the final up-to-n_fft//2 samples come from the
            # last frames' overlap-add, NOT zeros (trimming both ends
            # first silenced every resynthesized tail by ~hop·(T-1)−length
            # samples and broke the stems-sum-to-mixture invariant)
            y = y[..., n_fft // 2 :]
    if length is not None:
        from adx_tpu.ops.audio import fix_length

        y = fix_length(y, length)
    return y


def _matmul_precision(compute_dtype):
    """f32 rDFT matmuls must request ``Precision.HIGHEST``: TPU "f32" dots
    default to FAST precision (bf16 passes), so without it the fidelity
    path silently runs at bf16 accuracy/speed (measured on the v5e —
    see CLAUDE.md fidelity-mode note). bf16 inputs keep the default."""
    return (
        jax.lax.Precision.HIGHEST
        if jnp.dtype(compute_dtype) == jnp.float32
        else None
    )


@functools.lru_cache(maxsize=8)
def _inverse_rdft_matrices(n_fft: int):
    """(Cr, Ci) such that ``Sr @ Cr + Si @ Ci == irfft(Sr + 1j·Si)``.

    Cached as float32 NUMPY arrays (host constants are safe to cache
    across jit traces; device arrays created in-trace are not)."""
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[:, None]
    n = np.arange(n_fft, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    alpha = np.full((n_fft // 2 + 1, 1), 2.0)
    alpha[0] = 1.0
    if n_fft % 2 == 0:
        alpha[-1] = 1.0
    return (
        (alpha * np.cos(ang) / n_fft).astype(np.float32),
        (-alpha * np.sin(ang) / n_fft).astype(np.float32),
    )


def istft_matmul(
    S_real: jnp.ndarray,
    S_imag: jnp.ndarray,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    n_fft: Optional[int] = None,
    window: str = "hann",
    center: bool = True,
    length: Optional[int] = None,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """ISTFT of ``[..., 1+n_fft//2, T]`` real/imag parts via inverse-rDFT
    **matmuls** instead of FFTs.

    On TPU the batched irfft lowers to VPU-bound FFT stages, while two
    ``[B·T, F] @ [F, n_fft]`` matmuls ride the MXU — for large perturbation
    batches (RISE's dense Bernoulli masks) this is the faster formulation
    despite ~47× more FLOPs. ``compute_dtype=bfloat16`` accumulates in f32
    (``preferred_element_type``); pass ``jnp.float32`` for full fidelity.

    Taking real/imag separately also keeps complex arrays out of the
    calling convention (the axon tunnel cannot transfer complex64).
    """
    if n_fft is None:
        n_fft = 2 * (S_real.shape[-2] - 1)
    hop_length = hop_length or n_fft // 4
    win_length = win_length or n_fft
    w = get_window(window, win_length, n_fft, dtype=jnp.float32)
    Cr_np, Ci_np = _inverse_rdft_matrices(n_fft)
    Cr = jnp.asarray(Cr_np).astype(compute_dtype)
    Ci = jnp.asarray(Ci_np).astype(compute_dtype)
    prec = _matmul_precision(compute_dtype)
    frames = jnp.einsum(
        "...ft,fn->...tn", S_real.astype(compute_dtype), Cr,
        preferred_element_type=jnp.float32, precision=prec,
    ) + jnp.einsum(
        "...ft,fn->...tn", S_imag.astype(compute_dtype), Ci,
        preferred_element_type=jnp.float32, precision=prec,
    )
    return _finish_istft(frames, w, hop_length, S_real.shape[-1], n_fft, center, length)


@functools.lru_cache(maxsize=8)
def _forward_rdft_matrices(n_fft: int):
    """(Fr, Fi) such that ``frames @ Fr + 1j·(frames @ Fi) == rfft(frames)``.

    Cached as float32 NUMPY arrays (host constants are safe to cache
    across jit traces; device arrays created in-trace are not)."""
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def stft_matmul(
    y: jnp.ndarray,
    n_fft: int = 2048,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: str = "hann",
    center: bool = True,
    pad_mode: str = "constant",
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """STFT via forward-rDFT **matmuls**: returns ``(S_real, S_imag)``,
    each ``[..., 1+n_fft//2, T]``.

    The MXU-resident counterpart of :func:`stft` — same framing/window
    semantics, but the rfft becomes two ``[B·T, n_fft] @ [n_fft, F]``
    matmuls (see :func:`istft_matmul` for why this wins on TPU for large
    perturbation batches). Keeping real/imag separate also avoids complex
    arrays entirely.
    """
    hop_length = hop_length or n_fft // 4
    win_length = win_length or n_fft
    w = get_window(window, win_length, n_fft, dtype=jnp.float32)
    if center:
        pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        y = jnp.pad(y, pad, mode=_pad_mode(pad_mode))
    frames = (frame_signal(y, n_fft, hop_length) * w).astype(compute_dtype)
    Fr_np, Fi_np = _forward_rdft_matrices(n_fft)
    Fr = jnp.asarray(Fr_np).astype(compute_dtype)
    Fi = jnp.asarray(Fi_np).astype(compute_dtype)
    prec = _matmul_precision(compute_dtype)
    S_real = jnp.einsum("...tn,nf->...ft", frames, Fr,
                        preferred_element_type=jnp.float32, precision=prec)
    S_imag = jnp.einsum("...tn,nf->...ft", frames, Fi,
                        preferred_element_type=jnp.float32, precision=prec)
    return S_real, S_imag


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_iter",
        "hop_length",
        "win_length",
        "n_fft",
        "window",
        "center",
        "length",
        "momentum",
        "compute_dtype",
    ),
)
def griffin_lim_matmul(
    S_mag: jnp.ndarray,
    n_iter: int = 32,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    n_fft: Optional[int] = None,
    window: str = "hann",
    center: bool = True,
    length: Optional[int] = None,
    momentum: float = 0.99,
    key: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Griffin-Lim phase recovery with the ISTFT→STFT pair as rDFT
    **matmuls** (all-real arithmetic) instead of FFT pairs.

    Same accelerated update rule and random phase init as
    :func:`griffin_lim` (cos/sin of the identical uniform draw), so the
    float32 variant matches it closely; ``compute_dtype=bfloat16`` runs
    each iteration's four matmuls on the MXU with f32 accumulation — the
    treatment that made RISE resynthesis 4.5× faster (istft_matmul), now
    applied to the GL inner loop (reference mel default:
    src/spectrogram_explainability.py:391-411, n_iter=256).
    """
    if n_fft is None:
        n_fft = 2 * (S_mag.shape[-2] - 1)
    hop_length = hop_length or n_fft // 4
    win_length = win_length or n_fft
    if key is None:
        key = jax.random.key(0)

    u = 2.0 * jnp.pi * jax.random.uniform(key, S_mag.shape, dtype=jnp.float32)
    S_mag = S_mag.astype(jnp.float32)
    # tie the carry's sharding/type to S_mag (see griffin_lim)
    ar = jnp.cos(u) + jnp.zeros_like(S_mag)
    ai = jnp.sin(u) + jnp.zeros_like(S_mag)

    def body(_, carry):
        ar, ai, tr, ti = carry
        inv = istft_matmul(
            S_mag * ar, S_mag * ai,
            hop_length=hop_length, win_length=win_length, n_fft=n_fft,
            window=window, center=center, length=length,
            compute_dtype=compute_dtype,
        )
        Rr, Ri = stft_matmul(
            inv, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
            window=window, center=center, compute_dtype=compute_dtype,
        )
        tr_n = Rr[..., : S_mag.shape[-1]]
        ti_n = Ri[..., : S_mag.shape[-1]]
        ar = tr_n - (momentum / (1.0 + momentum)) * tr
        ai = ti_n - (momentum / (1.0 + momentum)) * ti
        nrm = jnp.sqrt(ar * ar + ai * ai) + 1e-16
        return ar / nrm, ai / nrm, tr_n, ti_n

    ar, ai, _, _ = jax.lax.fori_loop(
        0, n_iter, body, (ar, ai, jnp.zeros_like(ar), jnp.zeros_like(ai))
    )
    return istft_matmul(
        S_mag * ar, S_mag * ai,
        hop_length=hop_length, win_length=win_length, n_fft=n_fft,
        window=window, center=center, length=length,
        compute_dtype=compute_dtype,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_iter",
        "hop_length",
        "win_length",
        "n_fft",
        "window",
        "center",
        "length",
        "momentum",
    ),
)
def griffin_lim(
    S_mag: jnp.ndarray,
    n_iter: int = 32,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    n_fft: Optional[int] = None,
    window: str = "hann",
    center: bool = True,
    length: Optional[int] = None,
    momentum: float = 0.99,
    key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Griffin-Lim phase recovery from a magnitude spectrogram.

    Matches ``librosa.griffinlim``'s accelerated update (momentum 0.99,
    random phase init). The iteration runs as a ``lax.fori_loop`` so the
    whole recovery — including the batched perturbation case — is a single
    compiled program (reference invokes it serially per patch via
    ``librosa.feature.inverse.mel_to_audio``,
    src/spectrogram_explainability.py:391-402).
    """
    if n_fft is None:
        n_fft = 2 * (S_mag.shape[-2] - 1)
    hop_length = hop_length or n_fft // 4
    win_length = win_length or n_fft
    if key is None:
        key = jax.random.key(0)

    phase = jnp.exp(
        2j * jnp.pi * jax.random.uniform(key, S_mag.shape, dtype=jnp.float32)
    )
    S_mag = S_mag.astype(jnp.float32)
    # tie the loop carry's type to S_mag: under shard_map the random init is
    # replicated while the body output varies per shard, and fori_loop
    # requires matching varying-manual-axes on the carry
    phase = phase + jnp.zeros_like(S_mag, dtype=jnp.complex64)

    def body(_, carry):
        angles, tprev = carry
        inv = istft(
            S_mag * angles,
            hop_length=hop_length,
            win_length=win_length,
            n_fft=n_fft,
            window=window,
            center=center,
            length=length,
        )
        rebuilt = stft(
            inv,
            n_fft=n_fft,
            hop_length=hop_length,
            win_length=win_length,
            window=window,
            center=center,
        )
        t = rebuilt[..., : S_mag.shape[-1]]
        angles = t - (momentum / (1.0 + momentum)) * tprev
        angles = angles / (jnp.abs(angles) + 1e-16)
        return angles, t

    phase, _ = jax.lax.fori_loop(
        0, n_iter, body, (phase, jnp.zeros_like(phase))
    )
    return istft(
        S_mag * phase,
        hop_length=hop_length,
        win_length=win_length,
        n_fft=n_fft,
        window=window,
        center=center,
        length=length,
    )


def magphase(S: jnp.ndarray):
    """Split complex spectrogram into magnitude and unit-phase factors
    (librosa.magphase; reference uses it at src/dsp_band_ops.py:566)."""
    mag = jnp.abs(S)
    phase = S / jnp.where(mag > 0, mag, 1.0)
    phase = jnp.where(mag > 0, phase, jnp.ones_like(phase))
    return mag, phase
