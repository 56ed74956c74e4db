"""Device mesh + sharding helpers: one SPMD program instead of DDP subprocesses.

Behavioral spec being replaced: the reference's single-node DDP relaunch via
torch.distributed.run + NCCL allreduce (SURVEY.md §2.9, trainer.py:197-228,
dist.py:26-68). Here: a jax.sharding.Mesh over ICI, batch sharded on axis
"data", params/optimizer state replicated; XLA inserts the gradient psums.
Multi-slice (DCN) reuses the same named axis.

Beyond the reference's DDP: an optional second "fsdp" mesh axis shards the
trainer's FLAT param/momentum/EMA vectors (ZeRO-style). Because the fused
optimizer already operates on one raveled vector, sharding that vector over
"fsdp" makes GSPMD emit exactly the ZeRO collective pattern: ONE all-gather
of the parameter vector per step (forward), one reduce-scatter of the flat
gradient (backward), with all optimizer/EMA arithmetic running on 1/n-sized
shards. The batch shards over BOTH axes, so every device still does data
work; "fsdp" only subdivides parameter-state residency.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: int | None = None, axis: str = "data", fsdp: int = 1) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if fsdp > 1:
        assert n % fsdp == 0, f"{n} devices not divisible by fsdp={fsdp}"
        return Mesh(np.asarray(devs[:n]).reshape(n // fsdp, fsdp), (axis, "fsdp"))
    return Mesh(np.asarray(devs[:n]).reshape(n), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-dim sharding for input batches (over ALL mesh axes, so a
    ("data", "fsdp") mesh still data-parallelizes every device)."""
    names = mesh.axis_names
    return NamedSharding(mesh, P(names if len(names) > 1 else axis))


def spatial_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the image HEIGHT dim of an NHWC batch across the mesh —
    sequence/context-parallel inference for large imgsz (SURVEY §2.9 stretch
    goal). GSPMD inserts the conv halo exchanges and the psums for global
    reductions (SPPF pools, C2PSA linear-attention KV moments) automatically;
    tests/test_parallel.py proves bit-equality with the replicated forward.
    Use when one image is too large (or too latency-critical) for one chip —
    e.g. batch=1 4K frames — where batch sharding has nothing to split."""
    return NamedSharding(mesh, P(None, axis))


def flat_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for the trainer's raveled 1-D state vectors: split over the
    "fsdp" axis when the mesh has one, replicated otherwise."""
    if "fsdp" in mesh.axis_names:
        return NamedSharding(mesh, P("fsdp"))
    return NamedSharding(mesh, P())


def shard_flat_state(state, mesh: Mesh, flat_len: int):
    """Place a trainer state tuple: 1-D leaves of length `flat_len` (params /
    momentum / EMA raveled vectors) get flat_sharding; everything else
    (batch_stats, counters) is replicated."""
    fsh, rep = flat_sharding(mesh), replicated(mesh)

    def put(x):
        if getattr(x, "ndim", None) == 1 and x.shape[0] == flat_len:
            return jax.device_put(x, fsh)
        return jax.device_put(x, rep)

    return jax.tree.map(put, state)


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
