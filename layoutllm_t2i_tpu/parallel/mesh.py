"""Device mesh + sharding helpers.

The reference's only parallelism is DDP over NCCL (GLIGEN/distributed.py,
main.py:59-65). The TPU-native equivalent is a 1-D ``data`` mesh: batches are
sharded on axis 0, parameters are replicated, and XLA inserts the gradient
all-reduce over ICI from the shardings — there is no hand-written collective
in the train step. Multi-host runs only add ``jax.distributed.initialize()``
at startup; the mesh spans all global devices.

Host-side rank gating (reference get_rank()==0) maps to
``jax.process_index() == 0``.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Put a host batch onto the mesh, sharded along the leading axis."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def zero1_sharding(mesh: Mesh, tree, axis: str = "data"):
    """Per-leaf ZeRO-1 shardings: shard each leaf's largest ``axis``-divisible
    dimension across the mesh, replicate leaves with none.

    Applied to the optimizer state (Adam moments) of a data-parallel train
    step, this is ZeRO stage 1 the GSPMD way: no gather/scatter code — the
    shardings alone make XLA reduce-scatter the gradient into the sharded
    Adam update and all-gather the weight delta, and the f32 moment memory
    drops by the mesh size. The reference has no equivalent (its only
    parallelism is DDP with fully replicated Adam state, GLIGEN/main.py:59-65).
    """
    n = mesh.shape[axis]

    def leaf_sharding(x):
        shape = getattr(x, "shape", ())
        best = None
        for i, d in enumerate(shape):
            if d >= n and d % n == 0 and (best is None or d > shape[best]):
                best = i
        if best is None:
            return NamedSharding(mesh, P())
        spec = [None] * len(shape)
        spec[best] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(leaf_sharding, tree)


def is_primary() -> bool:
    return jax.process_index() == 0


def sync_global_devices(name: str = "sync"):
    """Barrier across hosts (replaces torch.distributed synchronize())."""
    if jax.process_count() > 1:  # pragma: no cover - multi-host only
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
