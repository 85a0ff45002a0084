"""Sharded training step for the SpecTTTra classifier.

The reference has no training loop at all (the classifier is consumed as a
frozen external checkpoint — SURVEY.md §2.1); a framework intended to stand
alone needs one, both for fine-tuning the detector on new generator families
and for the multi-chip dry-run contract. Parallelism layout:

* ``data`` axis  — batch sharding (DP),
* ``model`` axis — tensor parallelism over the transformer's wide matmuls:
  qkv / mlp-up kernels shard their *output* features, proj / mlp-down
  kernels their *input* features, so each block needs a single psum pair
  that XLA inserts automatically from the shardings (Megatron layout).

Loss is binary cross-entropy on the fake logit (sigmoid head, matching the
inference path's ``sigmoid(logit)`` semantics).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from adx_tpu.models.config import ModelConfig
from adx_tpu.models.spectttra import AudioClassifier


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def param_partition_spec(params, model_axis: str = "model"):
    """PartitionSpec tree: Megatron-style TP for block matmuls, replicate
    the rest."""

    def spec_for(path_tuple, leaf):
        path = "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path_tuple)
        if leaf.ndim == 2:
            if "attn/qkv/kernel" in path or "mlp/fc1/kernel" in path:
                return P(None, model_axis)  # shard output features
            if "attn/proj/kernel" in path or "mlp/fc2/kernel" in path:
                return P(model_axis, None)  # shard input features
        if leaf.ndim == 1 and ("attn/qkv/bias" in path or "mlp/fc1/bias" in path):
            return P(model_axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def make_train_step(
    cfg: ModelConfig,
    mesh: Mesh,
    learning_rate: float = 1e-4,
    weight_decay: float = 1e-4,
    dtype=jnp.float32,
):
    """Build ``(init_fn, step_fn)`` jitted over the mesh.

    ``step_fn(state, waves [B, n_samples], labels [B]) -> (state, loss)``
    with B sharded over 'data' and TP params sharded over 'model'.
    """
    # flash attention is forward-only; training uses the XLA attention path
    model = AudioClassifier(cfg, dtype=dtype, use_flash=False)
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)

    def loss_fn(params, waves, labels):
        logits = model.apply(params, waves)
        loss = optax.sigmoid_binary_cross_entropy(logits, labels)
        return jnp.mean(loss)

    def init_fn(rng, sample_wave):
        params = model.init(rng, sample_wave)
        opt_state = tx.init(params)
        return TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    def step_fn(state: TrainState, waves, labels):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, waves, labels)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    # shardings: params per TP spec, batch over 'data'
    def shard_state(state: TrainState) -> TrainState:
        pspec = param_partition_spec(state.params)

        def put(tree, spec_tree):
            return jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, spec_tree
            )

        params = put(state.params, pspec)
        # optimizer state mirrors the param tree structure where it embeds it
        def opt_put(x):
            return jax.device_put(x, NamedSharding(mesh, P()))

        opt_state = jax.tree.map(opt_put, state.opt_state)
        return TrainState(params, opt_state, state.step)

    batch_sharding = NamedSharding(mesh, P("data", None))
    label_sharding = NamedSharding(mesh, P("data"))

    jitted_step = jax.jit(step_fn, donate_argnums=(0,))

    def wrapped_step(state, waves, labels):
        waves = jax.device_put(waves, batch_sharding)
        labels = jax.device_put(labels, label_sharding)
        return jitted_step(state, waves, labels)

    return init_fn, wrapped_step, shard_state
