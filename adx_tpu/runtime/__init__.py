"""Runtime layer: batched perturbation engine, profiler, experiment checkpoints."""

from adx_tpu.runtime.profiler import TimeAggregator, timed
from adx_tpu.runtime.checkpoint import (
    ExperimentCheckpoint,
    SpectrogramCheckpoint,
    LIMEExperimentCheckpoint,
)
