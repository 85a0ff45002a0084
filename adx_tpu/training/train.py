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

from typing import Any, NamedTuple, Optional

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


def lr_schedule(
    learning_rate: float,
    total_steps: Optional[int] = None,
    warmup_steps: int = 0,
    final_scale: float = 0.01,
):
    """Linear warmup → cosine decay to ``final_scale × lr`` (constant when
    ``total_steps`` is None). Standard large-batch transformer recipe; the
    schedule lives in the optimizer so the jitted step stays a single
    program (step count is carried in the optax state, not retraced)."""
    if total_steps is None:
        if warmup_steps:
            return optax.linear_schedule(0.0, learning_rate, warmup_steps)
        return learning_rate
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0 if warmup_steps else learning_rate,
        peak_value=learning_rate,
        warmup_steps=max(warmup_steps, 1 if warmup_steps else 0),
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=learning_rate * final_scale,
    )


def decay_mask(params):
    """adamw weight-decay mask: the standard transformer recipe decays only
    weight MATRICES — biases, LayerNorm scales/biases (ndim 1) and the
    learnable position embeddings are excluded."""

    def mask_for(path_tuple, leaf):
        path = "/".join(
            str(p.key) if hasattr(p, "key") else str(p) for p in path_tuple
        )
        return leaf.ndim >= 2 and "pos_embed" not in path

    return jax.tree_util.tree_map_with_path(mask_for, params)


def make_train_step(
    cfg: ModelConfig,
    mesh: Mesh,
    learning_rate: float = 1e-4,
    weight_decay: float = 1e-4,
    dtype=jnp.float32,
    total_steps: Optional[int] = None,
    warmup_steps: int = 0,
    clip_norm: Optional[float] = 1.0,
):
    """Build ``(init_fn, step_fn)`` jitted over the mesh.

    ``step_fn(state, waves [B, n_samples], labels [B]) -> (state, loss)``
    with B sharded over 'data' and TP params sharded over 'model'.
    ``total_steps``/``warmup_steps`` enable the warmup+cosine schedule;
    ``clip_norm`` adds global-norm gradient clipping (None disables).
    """
    # flash attention is forward-only; training uses the XLA attention path
    model = AudioClassifier(cfg, dtype=dtype, use_flash=False)
    sched = lr_schedule(learning_rate, total_steps, warmup_steps)

    parts = []
    if clip_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_norm))
    parts.append(optax.adamw(sched, weight_decay=weight_decay, mask=decay_mask))
    tx = optax.chain(*parts)

    has_dropout = (float(cfg.model.dropout) > 0.0
                   or float(cfg.model.attn_dropout) > 0.0)

    def loss_fn(params, waves, labels, rng):
        # train=True enables the config's dropout (no-op at rate 0); the
        # per-step rng is derived from the step counter — deterministic
        # and resume-safe
        logits = model.apply(
            params, waves, train=has_dropout,
            rngs={"dropout": rng} if has_dropout else None,
        )
        loss = optax.sigmoid_binary_cross_entropy(logits, labels)
        return jnp.mean(loss)

    def init_fn(rng, sample_wave):
        params = model.init(rng, sample_wave)
        opt_state = tx.init(params)
        return TrainState(params, opt_state, jnp.zeros((), jnp.int32))

    def step_fn(state: TrainState, waves, labels):
        rng = jax.random.fold_in(jax.random.key(0), state.step)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, waves, labels, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    # shardings: params per TP spec, batch over 'data'
    def shard_state(state: TrainState) -> TrainState:
        pspec = param_partition_spec(state.params)
        param_treedef = jax.tree.structure(state.params)

        def put(tree, spec_tree):
            return jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, spec_tree
            )

        params = put(state.params, pspec)

        # optimizer moments (adam mu/nu) embed the FULL param tree — shard
        # them with the param spec so TP does not pay 2× replicated
        # optimizer memory per device (and the first step needn't reshard)
        def shard_opt(node):
            try:
                if jax.tree.structure(node) == param_treedef:
                    return put(node, pspec)
            except Exception:  # noqa: BLE001 — not a params-shaped subtree
                pass
            if isinstance(node, tuple) and hasattr(node, "_fields"):
                return type(node)(*[shard_opt(x) for x in node])
            if isinstance(node, (list, tuple)):
                return type(node)(shard_opt(x) for x in node)
            return jax.device_put(node, NamedSharding(mesh, P()))

        opt_state = shard_opt(state.opt_state)
        return TrainState(params, opt_state, state.step)

    batch_sharding = NamedSharding(mesh, P("data", None))
    label_sharding = NamedSharding(mesh, P("data"))

    jitted_step = jax.jit(step_fn, donate_argnums=(0,))

    def wrapped_step(state, waves, labels):
        waves = jax.device_put(waves, batch_sharding)
        labels = jax.device_put(labels, label_sharding)
        return jitted_step(state, waves, labels)

    # Device-resident dataset path: gather the batch + int16→float decode
    # INSIDE the program (see make_cached_train_step).
    def cached_step_fn(state: TrainState, waves_i16, labels_all, idx):
        waves = waves_i16[idx].astype(jnp.float32) * (1.0 / 32768.0)
        waves = jax.lax.with_sharding_constraint(waves, batch_sharding)
        labels = jax.lax.with_sharding_constraint(labels_all[idx],
                                                  label_sharding)
        return step_fn(state, waves, labels)

    wrapped_step.cached = jax.jit(cached_step_fn, donate_argnums=(0,))

    return init_fn, wrapped_step, shard_state


class DeviceDataCache(NamedTuple):
    """A whole training set resident in HBM: ``waves_i16 [N, n_samples]``
    (int16 — exact for 16-bit-PCM sources, ≲3e-5 quantization otherwise)
    and ``labels [N]`` float32, both replicated over the mesh."""

    waves_i16: Any
    labels: Any
    n: int


def upload_device_cache(mesh: Mesh, waves, labels) -> DeviceDataCache:
    """Ship the dataset to the devices ONCE as int16.

    On the axon tunnel (~18 MB/s) a single f32 [8, 5.3M] batch costs ~9 s
    of H2D per step; a 48-track 120 s dataset is ~508 MB once as int16,
    after which every step is pure device compute."""
    import numpy as np

    from adx_tpu.io.audio_io import pcm16_quantize

    waves = np.asarray(waves, np.float32)
    q = pcm16_quantize(waves)  # the shared int16 wire convention
    rep = NamedSharding(mesh, P())
    return DeviceDataCache(
        jax.device_put(q, rep),
        jax.device_put(np.asarray(labels, np.float32), rep),
        len(labels),
    )


def make_cached_train_step(cfg: ModelConfig, mesh: Mesh, **kwargs):
    """``make_train_step`` over a :class:`DeviceDataCache`.

    Returns ``(init_fn, cached_step, shard_state)`` where
    ``cached_step(state, cache, idx [B]) -> (state, loss)`` gathers batch
    ``idx`` from the resident dataset and decodes int16→float inside the
    jitted program — zero per-step host↔device traffic."""
    init_fn, step, shard_state = make_train_step(cfg, mesh, **kwargs)

    def cached_step(state, cache: DeviceDataCache, idx):
        return step.cached(state, cache.waves_i16, cache.labels,
                           jnp.asarray(idx, jnp.int32))

    return init_fn, cached_step, shard_state


def make_eval_step(cfg: ModelConfig, mesh: Mesh, dtype=jnp.float32):
    """Jitted eval forward over the mesh: ``eval_fn(params, waves, labels)
    -> (per-example BCE loss [B], fake probs [B])``, batch sharded over
    'data'. Same model/axes as the train step so TP-sharded params apply
    directly."""
    model = AudioClassifier(cfg, dtype=dtype, use_flash=False)
    batch_sharding = NamedSharding(mesh, P("data", None))
    label_sharding = NamedSharding(mesh, P("data"))

    @jax.jit
    def _eval(params, waves, labels):
        logits = model.apply(params, waves)
        loss = optax.sigmoid_binary_cross_entropy(logits, labels)
        return loss, jax.nn.sigmoid(logits)

    n_data = int(mesh.shape["data"])
    seen_width = [0]

    def eval_fn(params, waves, labels):
        import numpy as np

        waves = np.asarray(waves)
        labels = np.asarray(labels, np.float32)
        b = len(labels)
        # pad to the data-axis multiple AND to the widest batch seen so far:
        # per-example outputs make the trim exact, and reusing one padded
        # width means a narrower tail batch (the drop_last=False eval path)
        # reuses the compiled program instead of triggering a second
        # minutes-long XLA compile on the real TPU
        width = b + ((-b) % n_data)
        width = max(width, seen_width[0])
        seen_width[0] = width
        pad = width - b
        if pad:
            waves = np.concatenate([waves, np.zeros((pad,) + waves.shape[1:],
                                                    waves.dtype)])
            labels = np.concatenate([labels, np.zeros((pad,), np.float32)])
        waves = jax.device_put(waves, batch_sharding)
        labels = jax.device_put(labels, label_sharding)
        loss, probs = _eval(params, waves, labels)
        return np.asarray(loss)[:b], np.asarray(probs)[:b]

    return eval_fn


def evaluate(eval_fn, params, batches) -> dict:
    """Run ``eval_fn`` over an iterable of batches and aggregate metrics:
    mean BCE loss, accuracy at 0.5, and AUROC (rank statistic — well
    defined whenever both classes appear)."""
    import numpy as np

    losses, probs, labels = [], [], []
    for batch in batches:
        l, p = eval_fn(params, batch["wave"], batch["label"])
        losses.append(l)
        probs.append(p)
        labels.append(np.asarray(batch["label"]))
    loss = np.concatenate(losses)
    p = np.concatenate(probs)
    y = np.concatenate(labels)
    out = {
        "loss": float(loss.mean()),
        "accuracy": float(((p > 0.5) == (y > 0.5)).mean()),
        "n": int(len(y)),
    }
    pos, neg = p[y > 0.5], p[y <= 0.5]
    if len(pos) and len(neg):
        # Mann-Whitney U formulation of AUROC, ties counted half
        from scipy.stats import rankdata

        ranks = rankdata(np.concatenate([pos, neg]))
        out["auroc"] = float(
            (ranks[: len(pos)].sum() - len(pos) * (len(pos) + 1) / 2)
            / (len(pos) * len(neg))
        )
    return out
