"""Flash-attention kernel correctness (interpret mode on CPU) vs the XLA
reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from adx_tpu.ops.attention import attend, flash_attention


@pytest.mark.parametrize("valid_len", [256, 300, 384])
def test_flash_attention_matches_reference(valid_len):
    rng = np.random.default_rng(0)
    B, H, D = 2, 3, 32
    S = 384  # padded length (multiple of 128)
    q = rng.standard_normal((B, H, S, D)).astype(np.float32)
    k = rng.standard_normal((B, H, S, D)).astype(np.float32)
    v = rng.standard_normal((B, H, S, D)).astype(np.float32)

    got = np.asarray(
        flash_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            valid_len=valid_len, block_q=128, block_k=128, interpret=True,
        )
    )

    # reference: plain softmax attention over the first valid_len keys
    scale = 1.0 / np.sqrt(D)
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    s[..., valid_len:] = -np.inf
    p = np.exp(s - s.max(axis=-1, keepdims=True))
    p /= p.sum(axis=-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", p, v)

    # only query rows within valid_len are meaningful
    np.testing.assert_allclose(
        got[:, :, :valid_len], want[:, :, :valid_len], atol=2e-5, rtol=1e-4
    )


def test_flash_attention_bf16():
    rng = np.random.default_rng(1)
    B, H, S, D = 1, 2, 256, 64
    q = rng.standard_normal((B, H, S, D)).astype(np.float32)
    k = rng.standard_normal((B, H, S, D)).astype(np.float32)
    v = rng.standard_normal((B, H, S, D)).astype(np.float32)
    got = np.asarray(
        flash_attention(
            jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
            jnp.asarray(v, jnp.bfloat16), valid_len=S, interpret=True,
        ).astype(jnp.float32)
    )
    scale = 1.0 / np.sqrt(D)
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    p = np.exp(s - s.max(axis=-1, keepdims=True))
    p /= p.sum(axis=-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", p, v)
    assert np.mean(np.abs(got - want)) < 0.05  # bf16 inputs, fp32 accum


def test_attend_falls_back_off_tpu():
    """On CPU the dispatcher must use the XLA path and match exactly."""
    rng = np.random.default_rng(2)
    B, N, H, D = 2, 600, 4, 16
    q = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
    got = np.asarray(attend(q, k, v, use_flash=True))
    want = np.asarray(jax.nn.dot_product_attention(q, k, v))
    np.testing.assert_allclose(got, want, atol=1e-6)
