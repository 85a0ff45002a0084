"""Mesh and sharding utilities.

The reference has no parallelism of any kind (SURVEY.md §2.6): every
perturbation is a serial Python loop. Here the unit of parallelism is the
*perturbation batch*, data-parallel over a 1-D mesh riding ICI:

* masks / perturbed spectrogram batch: sharded on axis 0 (``'data'``),
* classifier parameters: replicated,
* per-mask scalar predictions: the only all-gather.

A 2-D ``('data', 'model')`` mesh is provided for SpecTTTra fine-tuning,
where the MLP/attention weight matrices shard over ``'model'``
(tensor parallelism) and the batch over ``'data'``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def perturbation_mesh(devices: Optional[Sequence[jax.Device]] = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over all (or given) devices for perturbation-batch DP."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))

def training_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """2-D ``('data', 'model')`` mesh for the sharded train step."""
    devices = list(devices) if devices is not None else jax.devices()
    if n_model < 1 or n_model > len(devices):
        raise ValueError(
            f"training_mesh: n_model={n_model} must be in [1, "
            f"{len(devices)}] (available devices)"
        )
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data < 1:
        raise ValueError(
            f"training_mesh: n_data={n_data} — n_model={n_model} does not "
            f"fit {len(devices)} devices"
        )
    used = n_data * n_model
    if used > len(devices):
        raise ValueError(
            f"training_mesh: n_data={n_data} × n_model={n_model} = {used} "
            f"devices requested but only {len(devices)} available"
        )
    if used < len(devices):
        print(f"⚠️ training_mesh: using {used} of {len(devices)} devices "
              f"(n_model={n_model} does not divide the device count)")
    grid = np.asarray(devices[:used]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int, axis_name: str = "data") -> NamedSharding:
    """NamedSharding that splits axis 0 over the mesh, replicates the rest."""
    spec = P(axis_name, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh (classifier params)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, x, axis_name: str = "data"):
    """Place ``x`` with axis 0 sharded over the mesh. Axis 0 must be a
    multiple of the mesh size (use ``pad_batch`` first)."""
    return jax.device_put(x, batch_sharding(mesh, np.ndim(x), axis_name))


def pad_batch(x: np.ndarray, multiple: int):
    """Pad axis 0 up to a multiple; returns (padded, original_len)."""
    n = x.shape[0]
    rem = (-n) % multiple
    if rem:
        pad_width = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        x = np.pad(x, pad_width)
    return x, n
