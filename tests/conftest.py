"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (the same
fake-device trick the driver uses for the dry-run)."""

import os

# Hard-set (not setdefault): the environment may pre-select a TPU platform
# (e.g. JAX_PLATFORMS=axon) and a sitecustomize hook may already have
# imported jax, so the env var alone is not enough — jax.config.update
# overrides the platform as long as no backend has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def short_audio(rng):
    """~1.5 s of band-limited noise + tones at 44.1 kHz (fast test signal)."""
    sr = 44100
    n = 65536
    t = np.arange(n) / sr
    y = (
        0.5 * np.sin(2 * np.pi * 440.0 * t)
        + 0.25 * np.sin(2 * np.pi * 1760.0 * t + 0.3)
        + 0.1 * rng.standard_normal(n)
    ).astype(np.float32)
    return y, sr
