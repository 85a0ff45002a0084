"""Training tests: sharded train step on the 8-device CPU mesh, data
pipeline, eval helpers."""

import numpy as np

import jax
import jax.numpy as jnp

from adx_tpu.models.config import tiny_test_config
from adx_tpu.parallel.mesh import training_mesh
from adx_tpu.training.data import batch_iterator, scan_dataset
from adx_tpu.training.train import make_train_step, param_partition_spec


def test_train_step_decreases_loss_dp_tp():
    """One DP×TP mesh, 20 steps on a separable toy problem → loss drops."""
    cfg = tiny_test_config()
    mesh = training_mesh(n_data=4, n_model=2)
    init_fn, step_fn, shard_state = make_train_step(cfg, mesh, learning_rate=3e-4)

    sample = jnp.zeros((1, cfg.audio.n_samples), jnp.float32)
    state = shard_state(init_fn(jax.random.key(0), sample))

    rng = np.random.default_rng(0)
    n = cfg.audio.n_samples
    t = np.arange(n) / cfg.audio.sample_rate
    # separable: 'fake' = tone, 'real' = noise
    def make_batch():
        waves = np.zeros((8, n), np.float32)
        labels = np.zeros((8,), np.float32)
        for i in range(8):
            if i % 2 == 0:
                waves[i] = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.02 * rng.standard_normal(n)
                labels[i] = 1.0
            else:
                waves[i] = 0.1 * rng.standard_normal(n)
        return waves, labels

    losses = []
    for _ in range(20):
        waves, labels = make_batch()
        state, loss = step_fn(state, waves, labels)
        losses.append(float(loss))
    assert int(state.step) == 20
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_param_partition_spec_shards_block_matmuls():
    from jax.sharding import PartitionSpec as P

    cfg = tiny_test_config()
    from adx_tpu.models.spectttra import init_params

    params = init_params(cfg, jax.random.key(0))
    specs = param_partition_spec(params)
    flat = dict(
        (jax.tree_util.keystr(k), v) for k, v in jax.tree_util.tree_flatten_with_path(specs)[0]
    )
    qkv_key = next(k for k in flat if "qkv" in k and "kernel" in k)
    proj_key = next(k for k in flat if "attn" in k and "proj" in k and "kernel" in k)
    head_key = next(k for k in flat if "head" in k and "kernel" in k)
    assert flat[qkv_key] == P(None, "model")
    assert flat[proj_key] == P("model", None)
    assert flat[head_key] == P()


def test_scan_dataset_and_batches(tmp_path, rng):
    from adx_tpu.io.audio_io import write_wav

    sr = 8000
    for model, n_files in [("REAL", 3), ("SUNO", 2)]:
        for i in range(n_files):
            write_wav(tmp_path / model / f"x{i}.wav",
                      rng.standard_normal(sr).astype(np.float32) * 0.1, sr)
    items = scan_dataset(tmp_path)
    assert len(items) == 5
    labels = {p.parent.name: l for p, l in items}
    assert labels == {"REAL": 0.0, "SUNO": 1.0}

    batches = list(batch_iterator(items, batch_size=2, n_samples=4000, sr=8000,
                                  input_sr=8000, epochs=1, shuffle=False))
    assert len(batches) == 2
    assert batches[0]["wave"].shape == (2, 4000)


def test_eval_helpers(tmp_path):
    from adx_tpu.predict import LocalSonics
    from adx_tpu.utils.eval import plot_classification_report, plot_roc_curve, run_inference

    predictor = LocalSonics.from_pretrained("tiny", max_batch=8)
    rng = np.random.default_rng(1)
    n = predictor.cfg.audio.n_samples
    batches = [
        {"wave": rng.standard_normal((4, n)).astype(np.float32) * 0.1,
         "label": np.array([0, 1, 0, 1], np.float32)}
        for _ in range(2)
    ]
    preds, labels = run_inference(predictor, batches, sr=predictor.cfg.audio.sample_rate)
    assert preds.shape == labels.shape == (8,)

    plot_classification_report(labels, preds, output_path=tmp_path / "cm.png")
    assert (tmp_path / "cm.png").exists()
    scores = rng.uniform(0, 1, 8)
    auc = plot_roc_curve(labels, scores, output_path=tmp_path / "roc.png")
    assert 0.0 <= auc <= 1.0
    assert (tmp_path / "roc.png").exists()
