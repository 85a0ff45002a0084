"""Device-mesh construction and perturbation-batch sharding."""

from adx_tpu.parallel.mesh import (
    perturbation_mesh,
    training_mesh,
    shard_batch,
    replicate,
    pad_batch,
    batch_sharding,
)
