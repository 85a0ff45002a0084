"""Decibel scaling with librosa-compatible semantics.

The reference computes display spectrograms with ``ref=np.max``
(src/spectrogram_explainability.py:377,387). Here ``ref`` may be a scalar or
the string ``'max'``, in which case the per-call maximum of the input is
used — note this is a *data-dependent* reference, so maps produced with
``ref='max'`` are only comparable within one spectrogram, exactly as in the
reference.
"""

from __future__ import annotations

import jax.numpy as jnp


def _resolve_ref(x: jnp.ndarray, ref):
    if isinstance(ref, str):
        if ref != "max":
            raise ValueError(f"Unsupported ref: {ref!r}")
        return jnp.max(x)
    return jnp.asarray(ref, dtype=x.dtype)


def power_to_db(S, ref="max", amin: float = 1e-10, top_db: float = 80.0):
    S = jnp.asarray(S)
    ref_value = jnp.abs(_resolve_ref(S, ref))
    log_spec = 10.0 * jnp.log10(jnp.maximum(S, amin))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(ref_value, amin))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - top_db)
    return log_spec


def amplitude_to_db(S, ref="max", amin: float = 1e-5, top_db: float = 80.0):
    S = jnp.abs(jnp.asarray(S))
    ref_value = jnp.abs(_resolve_ref(S, ref))
    # librosa: power_to_db(S**2, ref=ref**2, amin=amin**2, top_db=top_db)
    return power_to_db(S**2, ref=ref_value**2, amin=amin**2, top_db=top_db)


def db_to_power(S_db, ref: float = 1.0):
    return ref * jnp.power(10.0, 0.1 * jnp.asarray(S_db))


def db_to_amplitude(S_db, ref: float = 1.0):
    return jnp.sqrt(db_to_power(S_db, ref=ref**2))
