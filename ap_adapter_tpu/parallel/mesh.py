"""Device mesh + sharding rules.

The reference's only parallelism is HF-Accelerate DDP (SURVEY §2.5). The
TPU-native story: a ``jax.sharding.Mesh`` with axes ``('data', 'model')`` —
batch sharded over ``data`` (grad all-reduce rides ICI), parameters either
replicated (default: the UNet is ~750 M params and fits per chip in bf16) or
sharded over ``model`` for tensor-parallel serving of large batches.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data: Optional[int] = None, model: int = 1, devices=None) -> Mesh:
    """('data', 'model') mesh; data defaults to all devices / model."""

    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""

    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place every array in a pytree batch with its leading axis over 'data'."""

    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate_params(mesh: Mesh, params):
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), params)
