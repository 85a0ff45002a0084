"""Native checkpoint round trip: save_params → from_pretrained loads them."""

import numpy as np

import jax

from adx_tpu.models.config import tiny_test_config
from adx_tpu.models.convert import is_native_checkpoint, load_native_checkpoint, save_params
from adx_tpu.models.spectttra import init_params
from adx_tpu.predict import LocalSonics


def test_native_checkpoint_roundtrip(tmp_path, rng):
    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.key(3))
    ckpt = tmp_path / "ckpt"
    save_params(params, ckpt)
    assert is_native_checkpoint(ckpt)

    restored = load_native_checkpoint(ckpt)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(restored)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # predictions from the restored predictor equal the original's
    p1 = LocalSonics(cfg, params)
    p2 = LocalSonics.from_pretrained("tiny", checkpoint_dir=ckpt)
    wave = rng.standard_normal(cfg.audio.n_samples).astype(np.float32)
    assert p1.predict(wave, cfg.audio.sample_rate) == p2.predict(wave, cfg.audio.sample_rate)
