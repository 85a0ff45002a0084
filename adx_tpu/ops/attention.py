"""Flash attention for SpecTTTra — the framework's hot Pallas kernel.

SpecTTTra-α at 44.1 kHz input attends over ~3.6k tokens; XLA's default
attention materializes the ``[B, H, S, S]`` score tensor (≈1.2 GB in bf16
per 8-wide forward chunk), making the 500-forward LIME sweep HBM-bound.
This kernel computes softmax(QKᵀ/√d)·V in (block_q × block_k) tiles with
the standard running-max/denominator recurrence, so scores never leave
VMEM. Forward-only (inference path; training uses the XLA attention).

Layout: ``[B, H, S, D]`` with S padded to a block multiple by the caller;
``valid_len`` masks the padded keys. The MXU sees [block_q, D] × [D,
block_k] and [block_q, block_k] × [block_k, D] matmuls with
``preferred_element_type=float32`` accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_NEG_INF = -1e30


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, *, block_q: int, block_k: int, valid_len: int, scale: float
):
    """One grid step = one (batch·head): K/V are DMA'd into VMEM ONCE and
    both the q-block and k-block loops run inside the kernel (a grid over
    q-blocks would refetch the full K/V per q-block — 28× more HBM traffic
    at SpecTTTra's 3.6k tokens)."""
    seq_len, d = q_ref.shape[1], q_ref.shape[2]
    n_qb = seq_len // block_q
    n_kb = seq_len // block_k

    def q_body(qb, _):
        # keep the matmul INPUTS in the stored dtype (bf16): v5e runs f32
        # MXU matmuls ~8× slower; accumulation stays f32 via
        # preferred_element_type (measured: the all-f32 kernel was 332 ms
        # per batch-64 encoder vs XLA's 199 ms)
        q = q_ref[0, pl.ds(qb * block_q, block_q), :]

        def body(kb, carry):
            acc, m_prev, l_prev = carry
            k = k_ref[0, pl.ds(kb * block_k, block_k), :]
            v = v_ref[0, pl.ds(kb * block_k, block_k), :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale  # [block_q, block_k] f32
            col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < valid_len, s, _NEG_INF)

            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc, m_new, l_new

        acc0 = jnp.zeros((block_q, d), jnp.float32)
        m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((block_q, 1), jnp.float32)
        acc, _m, l = jax.lax.fori_loop(0, n_kb, body, (acc0, m0, l0))
        o_ref[0, pl.ds(qb * block_q, block_q), :] = (
            acc / jnp.maximum(l, 1e-30)
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_qb, q_body, 0)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "valid_len", "interpret")
)
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    valid_len: int,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(QKᵀ/√d)·V over ``[B, H, S, D]`` without materializing scores.

    ``S`` must be a multiple of both block sizes; keys/values beyond
    ``valid_len`` are masked out (queries beyond it produce garbage rows the
    caller slices away).
    """
    B, H, S, D = q.shape
    assert S % block_q == 0 and S % block_k == 0, (S, block_q, block_k)
    scale = 1.0 / float(np.sqrt(D))

    qf = q.reshape(B * H, S, D)
    kf = k.reshape(B * H, S, D)
    vf = v.reshape(B * H, S, D)

    grid = (B * H,)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, block_q=block_q, block_k=block_k,
            valid_len=valid_len, scale=scale,
        ),
        out_shape=jax.ShapeDtypeStruct((B * H, S, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, S, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, S, D), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, S, D), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, D), lambda b: (b, 0, 0)),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, S, D)


def xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Plain-XLA attention over ``[B, N, H, D]`` with compute-dtype probs.

    The softmax logits accumulate in f32, but the probability tensor is
    stored back in the inputs' dtype before the AV matmul. In bf16 mode
    this halves the dominant HBM traffic of the encoder: profiling the
    batch-64 SpecTTTra-α forward showed the ``[B, H, S, S]`` f32 probs
    cost 73 GB (111 ms of 165 ms) per forward when left to
    ``jax.nn.dot_product_attention``. f32 inputs keep full-precision probs
    (fidelity mode unchanged).
    """
    D = q.shape[-1]
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (1.0 / float(np.sqrt(D)))
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    # NOTE (measured on v5e): forcing the [B,H,S,S] probs buffer to bf16
    # with an optimization_barrier makes things WORSE (253 ms vs 199 ms
    # per batch-64) — the barrier splits QK+softmax into two passes that
    # re-read the f32 logits. Left to itself XLA keeps one f32 probs
    # buffer between the QK+softmax and AV fusions.
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def attend(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, use_flash: bool = True):
    """Attention dispatch for ``[B, N, H, D]`` tensors (flax layout).

    Uses the Pallas flash kernel on TPU for long sequences; falls back to
    ``xla_attention`` elsewhere (CPU tests, short inputs, training — the
    kernel is forward-only).
    """
    B, N, H, D = q.shape
    on_tpu = jax.default_backend() == "tpu"
    if not (use_flash and on_tpu and N >= 512):
        return xla_attention(q, k, v)

    block = 128
    S = -(-N // block) * block
    pad = [(0, 0), (0, S - N), (0, 0), (0, 0)]
    qt = jnp.moveaxis(jnp.pad(q, pad), 2, 1)  # [B, H, S, D]
    kt = jnp.moveaxis(jnp.pad(k, pad), 2, 1)
    vt = jnp.moveaxis(jnp.pad(v, pad), 2, 1)
    out = flash_attention(qt, kt, vt, valid_len=N, block_q=block, block_k=block)
    return jnp.moveaxis(out, 1, 2)[:, :N]
