"""Data-preparation pipeline: LUFS normalization + degradation arms."""

from adx_tpu.dataprep.loudness import (
    integrated_lufs,
    true_peak_dbtp,
    apply_gain,
    soft_limiter,
    normalize_to_lufs_with_tp,
    tpdf_dither,
)
from adx_tpu.dataprep.degrade import (
    degrade_mp3_roundtrip,
    degrade_resample,
    degrade_add_noise,
    degrade_reverb_synthetic,
)
