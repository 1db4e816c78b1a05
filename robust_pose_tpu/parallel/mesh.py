"""Device-mesh utilities for data-parallel training over ICI.

TPU-native replacement for the reference's ``torch.nn.DataParallel``
scale-out (reference scripts/train_posenet.py:77-79 — single-process
scatter/gather replication). Here training is SPMD: parameters are
replicated, batches are sharded over a 1-D ``data`` mesh axis, and XLA
inserts the gradient all-reduce over ICI automatically from the sharding
annotations (no NCCL/MPI analogue needed).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree with the leading axis sharded over ``data``."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)
