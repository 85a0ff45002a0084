"""SpecTTTra fine-tuning: sharded train step over a (data, model) mesh."""

from adx_tpu.training.train import make_train_step, param_partition_spec, TrainState
