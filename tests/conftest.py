"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (the same
fake-device trick the driver uses for the dry-run)."""

import os

# Hard-set (not setdefault): the environment may pre-select a TPU platform
# (e.g. JAX_PLATFORMS=axon) and a sitecustomize hook may already have
# imported jax, so the env var alone is not enough — jax.config.update
# overrides the platform as long as no backend has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
# The suite hard-codes 8 devices (training_mesh(4, 2), dryrun asserts,
# engine mesh-invariance tests) — REPLACE any pre-existing device-count
# flag (e.g. left over from a dryrun) instead of keeping a wrong value.
flags = [
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if not f.startswith("--xla_force_host_platform_device_count")
]
os.environ["XLA_FLAGS"] = " ".join(
    flags + ["--xla_force_host_platform_device_count=8"]
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng():
    """Fresh, identically-seeded generator PER TEST: shared session state
    would make every test's data depend on which tests ran before it
    (irreproducible failures in isolation vs in the suite)."""
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def short_audio():
    """~1.5 s of band-limited noise + tones at 44.1 kHz (fast test signal)."""
    sr = 44100
    n = 65536
    t = np.arange(n) / sr
    y = (
        0.5 * np.sin(2 * np.pi * 440.0 * t)
        + 0.25 * np.sin(2 * np.pi * 1760.0 * t + 0.3)
        + 0.1 * np.random.default_rng(1234).standard_normal(n)
    ).astype(np.float32)
    return y, sr
