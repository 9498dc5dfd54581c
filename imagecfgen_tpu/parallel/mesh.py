"""Device-mesh plumbing for data-parallel training.

The reference is single-device throughout (every ``train()`` takes a bare
``device`` string, e.g. ``image_scms/mnist.py:163``); here data parallelism
is first-class: a named 1-D ``("data",)`` mesh, batches sharded over it,
parameters replicated, and gradient all-reduce inserted by GSPMD over ICI.
The axis is named so a future multi-slice ("dcn") axis is purely additive.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_mesh(devices: Optional[Sequence[Any]] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for batch pytrees."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree onto the mesh, sharded along axis 0."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, opt state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
