"""Model zoo: the SpecTTTra classifier family and source-separation UNet.

The reference consumes SONICS SpecTTTra as an external torch black box
(``HFAudioClassifier`` — reference: src/sonics_api.py:246-271) and Spleeter
as an external TF black box (via audioLIME). Here both are first-class flax
modules with weight converters, so the whole perturb→forward pipeline is one
XLA program.
"""

from adx_tpu.models.config import AudioConfig, SpecTTTraConfig, ModelConfig, PRESETS
from adx_tpu.models.spectttra import AudioClassifier, SpecTTTra
