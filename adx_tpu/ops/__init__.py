"""JAX DSP primitives — the L2 layer of the framework.

These replace the reference's librosa calls
(reference: src/spectrogram_explainability.py:364-411,
src/dsp_band_ops.py:379-426) with batched, jit-able, TPU-resident
implementations. All functions accept leading batch dimensions and are safe
to ``vmap`` / ``pjit``.
"""

from adx_tpu.ops.stft import (
    hann_window,
    stft,
    stft_matmul,
    istft,
    istft_matmul,
    griffin_lim,
    griffin_lim_matmul,
    frame_signal,
    magphase,
    n_frames_for,
)
from adx_tpu.ops.mel import (
    hz_to_mel,
    mel_to_hz,
    mel_frequencies,
    fft_frequencies,
    mel_filterbank,
    melspectrogram,
    mel_to_stft,
    mel_to_audio,
)
from adx_tpu.ops.db import amplitude_to_db, power_to_db, db_to_amplitude, db_to_power
from adx_tpu.ops.masks import (
    smooth_band_keep_mask,
    band_gain_matrix,
    occlusion_patch_grid,
    occlusion_mask_batch,
    rise_mask_batch,
    lime_mask_batch,
)
from adx_tpu.ops.audio import match_rms, fix_length, peak_normalize, resample_poly
