"""Physically-interpretable audio feature pipeline (L4 layer)."""

from adx_tpu.features.extraction import (
    extract_all_features,
    extract_all_features_batch,
    extract_features_for_paths,
    compute_jitter,
    compute_jitter_extended,
    compute_shimmer,
    compute_shimmer_extended,
    compute_hnr,
    detect_breaths,
    detect_voice_breaks,
    compute_intonation_pattern,
    compute_rms_envelope,
    compute_rhythm_stats,
)
