"""Device mesh + sharding helpers: one SPMD program instead of DDP subprocesses.

Behavioral spec being replaced: the reference's single-node DDP relaunch via
torch.distributed.run + NCCL allreduce (SURVEY.md §2.9, trainer.py:197-228,
dist.py:26-68). Here: a jax.sharding.Mesh over ICI, batch sharded on axis
"data", params/optimizer state replicated; XLA inserts the gradient psums.
Multi-slice (DCN) reuses the same named axis.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]).reshape(n), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-dim sharding for input batches."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Device-put array leaves of a batch dict with leading-dim sharding."""
    sh = batch_sharding(mesh, axis)

    def put(x):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, sh)
        return x

    return {k: put(v) if k not in ("meta", "n_real") else v for k, v in batch.items()}
