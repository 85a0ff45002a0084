"""I/O layer: audio files, YAML configs, result JSON merging, checkpoints."""

from adx_tpu.io.audio_io import load_audio, write_wav, read_wav
from adx_tpu.io.results import (
    convert_to_native,
    to_native_dict,
    append_update_results,
    append_update_explanations,
    append_update_features,
    load_existing_explanations,
    safe_stem,
)
