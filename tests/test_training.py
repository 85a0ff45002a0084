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

    # eval path: drop_last=False keeps the 5th item in a narrower tail batch
    # (the old drop-last iterator silently skipped it, biasing val metrics)
    full = list(batch_iterator(items, batch_size=2, n_samples=4000, sr=8000,
                               input_sr=8000, epochs=1, shuffle=False,
                               drop_last=False))
    assert [b["wave"].shape[0] for b in full] == [2, 2, 1]
    assert sum(len(b["label"]) for b in full) == 5
    np.testing.assert_array_equal(full[0]["wave"], batches[0]["wave"])


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


def test_lr_schedule_and_clipping_train_step():
    """Warmup+cosine schedule + grad clipping: loss still drops and the
    schedule's LR endpoints behave (0 at step 0 with warmup, decayed tail)."""
    from adx_tpu.training.train import lr_schedule

    sched = lr_schedule(1e-3, total_steps=100, warmup_steps=10)
    assert float(sched(0)) < 1e-4
    np.testing.assert_allclose(float(sched(10)), 1e-3, rtol=1e-5)  # peak
    assert float(sched(100)) < 2e-4  # decayed near end_value

    cfg = tiny_test_config()
    mesh = training_mesh(n_data=4, n_model=2)
    init_fn, step_fn, shard_state = make_train_step(
        cfg, mesh, learning_rate=3e-4, total_steps=30, warmup_steps=3,
        clip_norm=1.0,
    )
    sample = jnp.zeros((1, cfg.audio.n_samples), jnp.float32)
    state = shard_state(init_fn(jax.random.key(0), sample))
    rng_l = np.random.default_rng(0)
    n = cfg.audio.n_samples
    t = np.arange(n) / cfg.audio.sample_rate
    losses = []
    for _ in range(20):
        waves = np.zeros((8, n), np.float32)
        labels = np.zeros((8,), np.float32)
        for i in range(8):
            if i % 2 == 0:
                waves[i] = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.02 * rng_l.standard_normal(n)
                labels[i] = 1.0
            else:
                waves[i] = 0.1 * rng_l.standard_normal(n)
        state, loss = step_fn(state, waves, labels)
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_eval_step_and_metrics():
    """make_eval_step + evaluate: metrics dict with sane ranges; AUROC = 1
    when probabilities perfectly separate the labels."""
    from adx_tpu.training.train import evaluate, make_eval_step

    cfg = tiny_test_config()
    mesh = training_mesh(n_data=4, n_model=2)
    from adx_tpu.models.spectttra import init_params

    params = init_params(cfg, jax.random.key(0))
    eval_fn = make_eval_step(cfg, mesh)
    rng_l = np.random.default_rng(2)
    n = cfg.audio.n_samples
    batches = [
        {"wave": rng_l.standard_normal((8, n)).astype(np.float32) * 0.1,
         "label": np.tile([0.0, 1.0], 4).astype(np.float32)}
        for _ in range(2)
    ]
    m = evaluate(eval_fn, params, batches)
    assert m["n"] == 16
    assert 0.0 <= m["accuracy"] <= 1.0
    assert 0.0 <= m["auroc"] <= 1.0
    assert m["loss"] > 0.0

    # separable sanity: fake probs strictly above real ones ⇒ AUROC 1
    fake_fn = lambda p, w, l: (np.zeros(len(l)), np.where(l > 0.5, 0.9, 0.1))
    m2 = evaluate(fake_fn, None, batches)
    assert m2["auroc"] == 1.0 and m2["accuracy"] == 1.0


def test_train_val_split_stratified():
    from adx_tpu.training.data import train_val_split

    items = [(f"r{i}.wav", 0.0) for i in range(8)] + \
            [(f"f{i}.wav", 1.0) for i in range(12)]
    train, val = train_val_split(items, val_fraction=0.25, seed=1)
    assert len(train) + len(val) == 20
    val_labels = [l for _, l in val]
    assert val_labels.count(0.0) == 2 and val_labels.count(1.0) == 3
    assert set(train).isdisjoint(val)

    # tiny class still keeps one training item
    train2, val2 = train_val_split([("a", 0.0), ("b", 0.0), ("c", 1.0)], 0.5)
    assert ("c", 1.0) in train2 + val2
    assert any(l == 0.0 for _, l in train2)


def test_cached_train_step_matches_plain():
    """Device-resident dataset path ≡ host-batch path: same params after a
    step on the same batch (int16 quantization applied to both inputs)."""
    from adx_tpu.training.train import make_cached_train_step, upload_device_cache

    cfg = tiny_test_config()
    mesh = training_mesh(n_data=4, n_model=2)
    init_fn, step_fn, shard_state = make_train_step(cfg, mesh, learning_rate=3e-4)
    _, cached_step, _ = make_cached_train_step(cfg, mesh, learning_rate=3e-4)

    rng = np.random.default_rng(3)
    n = cfg.audio.n_samples
    waves = rng.standard_normal((12, n)).astype(np.float32) * 0.2
    # quantize exactly as the cache does so both paths see identical data
    waves = np.clip(np.round(waves * 32768.0), -32768, 32767) / 32768.0
    waves = waves.astype(np.float32)
    labels = (np.arange(12) % 2).astype(np.float32)

    sample = jnp.zeros((1, n), jnp.float32)
    state_a = shard_state(init_fn(jax.random.key(1), sample))
    state_b = shard_state(init_fn(jax.random.key(1), sample))

    cache = upload_device_cache(mesh, waves, labels)
    idx = np.array([2, 5, 7, 1, 9, 0, 4, 11], np.int32)

    state_a, loss_a = step_fn(state_a, waves[idx], labels[idx])
    state_b, loss_b = cached_step(state_b, cache, idx)

    assert float(loss_a) == float(loss_b)
    da = jax.tree.leaves(state_a.params)
    db = jax.tree.leaves(state_b.params)
    for a, b in zip(da, db):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batch_iterator_too_few_items_raises():
    """drop_last with fewer items than batch_size must raise, not busy-loop
    forever yielding nothing (epochs=None would spin at 100% CPU)."""
    import pytest as _pytest

    from adx_tpu.training.data import batch_iterator

    items = [("a.wav", 0.0)] * 3
    with _pytest.raises(ValueError, match="never yield"):
        next(batch_iterator(items, batch_size=8, n_samples=100, sr=8000))


def test_dropout_is_wired_through_training():
    """config.dropout must actually regularize: train=True with different
    rngs gives different logits; train=False is deterministic dropout-free."""
    import dataclasses

    from adx_tpu.models.config import tiny_test_config
    from adx_tpu.models.spectttra import AudioClassifier

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dropout=0.3, attn_dropout=0.2)
    )
    model = AudioClassifier(cfg)
    wave = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (2, cfg.audio.n_samples)).astype(np.float32) * 0.1
    )
    params = model.init(jax.random.key(0), wave)
    eval1 = model.apply(params, wave)
    eval2 = model.apply(params, wave, train=False)
    np.testing.assert_allclose(np.asarray(eval1), np.asarray(eval2), atol=0)
    tr1 = model.apply(params, wave, train=True, rngs={"dropout": jax.random.key(1)})
    tr2 = model.apply(params, wave, train=True, rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(tr1), np.asarray(tr2))
    assert not np.allclose(np.asarray(tr1), np.asarray(eval1))


def test_weight_decay_mask_excludes_norms_and_biases():
    """The PRODUCTION mask (train.py::decay_mask, the one adamw receives)
    must decay matrices only — never biases, norm scales, or pos embeds."""
    import dataclasses

    from adx_tpu.models.spectttra import init_params
    from adx_tpu.training.train import decay_mask

    cfg = tiny_test_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, pe_learnable=True)
    )
    params = init_params(cfg)
    mask = decay_mask(params)
    flat = {
        "/".join(str(p.key) for p in kp): v
        for kp, v in jax.tree_util.tree_flatten_with_path(mask)[0]
    }
    assert any(v for k, v in flat.items() if "kernel" in k)
    assert not any(v for k, v in flat.items() if "bias" in k)
    assert not any(v for k, v in flat.items() if "norm" in k and "scale" in k)
    assert not any(v for k, v in flat.items() if "pos_embed" in k)


def test_tp_opt_state_sharded_like_params():
    """adam mu/nu must mirror the TP param sharding, not replicate
    (2x optimizer memory per device otherwise)."""
    cfg = tiny_test_config()
    mesh = training_mesh(n_data=4, n_model=2)
    init_fn, _step, shard_state = make_train_step(cfg, mesh)
    sample = jnp.zeros((1, cfg.audio.n_samples), jnp.float32)
    state = shard_state(init_fn(jax.random.key(0), sample))

    def find_qkv(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for kp, leaf in flat:
            path = "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in kp)
            if "qkv" in path and "kernel" in path:
                return leaf
        raise AssertionError("qkv kernel not found")

    p_leaf = find_qkv(state.params)
    mu_leaf = find_qkv(state.opt_state)
    assert mu_leaf.sharding == p_leaf.sharding
    assert "model" in str(p_leaf.sharding.spec)


def test_convert_pe_learnable_maps_short_names():
    from adx_tpu.models.convert import convert_torch_state_dict

    pe = np.random.default_rng(0).standard_normal((1, 6, 16)).astype(np.float32)
    # learnable: mapped (with the leading batch dim squeezed)
    out = convert_torch_state_dict(
        {"encoder.tokenizer.pe_t": pe, "encoder.tokenizer.pe_f": pe * 2},
        pe_learnable=True,
    )
    np.testing.assert_array_equal(
        out["encoder/tokenizer/pos_embed_temporal"], pe[0])
    np.testing.assert_array_equal(
        out["encoder/tokenizer/pos_embed_spectral"], (pe * 2)[0])
    # sinusoid mode: skipped silently (recomputed in flax)
    assert convert_torch_state_dict(
        {"encoder.tokenizer.pe_t": pe}, pe_learnable=False) == {}


def test_training_mesh_rejects_overcommitted_grid():
    import pytest

    with pytest.raises(ValueError, match="devices requested but only"):
        training_mesh(n_data=8, n_model=2)  # 16 > the 8-device CPU mesh


def test_classification_report_single_class(tmp_path):
    """A skewed val set (all one class) must still render a 2x2 matrix —
    unpinned confusion_matrix returns 1x1 and crashes the two-label
    heatmap."""
    from adx_tpu.utils.eval import plot_classification_report

    labels = np.ones(5, dtype=int)
    preds = np.ones(5, dtype=bool)
    plot_classification_report(labels, preds, output_path=tmp_path / "cm1.png")
    assert (tmp_path / "cm1.png").exists()
