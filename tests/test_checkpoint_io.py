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


def test_truncated_checkpoint_degrades_gracefully(tmp_path):
    """A ledger truncated by a kill mid-write (the pre-atomic failure mode)
    must yield a fresh state with a warning, not abort every resume."""
    from adx_tpu.runtime.checkpoint import ExperimentCheckpoint

    ck = ExperimentCheckpoint(tmp_path)
    ck.mark_as_processed("a.wav")
    assert ck.load_processed_files() == {"a.wav"}
    # simulate the truncation
    ck.checkpoint_file.write_text('{"processed_files": ["a.wav", "b.w')
    assert ck.load_processed_files() == set()
    # and the ledger recovers on the next write
    ck.mark_as_processed("c.wav")
    assert ck.load_processed_files() == {"c.wav"}


def test_checkpoint_writes_are_atomic_no_temp_left(tmp_path):
    from adx_tpu.runtime.checkpoint import SpectrogramCheckpoint

    ck = SpectrogramCheckpoint(tmp_path)
    for i in range(5):
        ck.mark_as_processed(f"f{i}.wav")
    assert ck.load_processed_files() == {f"f{i}.wav" for i in range(5)}
    assert not list(tmp_path.glob("*.tmp"))  # no orphan temp files
