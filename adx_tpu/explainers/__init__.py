"""Explainer engines: FBP, occlusion/RISE saliency, AudioLIME."""

from adx_tpu.explainers.fbp import FrequencyBandPerturbation, FREQUENCY_BAND_PRESETS
from adx_tpu.explainers.occlusion import SpectrogramExplainability
