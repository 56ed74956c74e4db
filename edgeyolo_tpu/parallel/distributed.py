"""Multi-process (multi-host / multi-slice) runtime initialization.

Behavioral spec being replaced: the reference's DDP bootstrap — a subprocess
relaunch through torch.distributed.run with RANK/WORLD_SIZE envs and an
nccl/gloo process group (ultralytics/utils/dist.py:26-68,
engine/trainer.py:217-228). TPU-native shape: `jax.distributed.initialize`
once per process, after which `jax.devices()` is the GLOBAL device list and
the exact same Mesh/NamedSharding code paths (parallel/mesh.py) compile one
SPMD program whose collectives ride ICI within a slice and DCN across
slices. No per-rank branching anywhere downstream — the only per-process
code is feeding each host its local shard of the batch
(`host_local_batch`).

Proven in CI by an actual 2-process gloo run over a virtual CPU mesh
(tests/test_parallel.py::test_multiprocess_train_step), which the
reference's hardware-gated DDP test cannot do.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from edgeyolo_tpu.utils import LOGGER

__all__ = ["init_distributed", "host_local_batch", "is_initialized"]

_initialized = False


def is_initialized() -> bool:
    return _initialized


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> int:
    """Join (or create) the multi-process runtime; returns this process id.

    Arguments fall back to env vars (EDGEYOLO_COORDINATOR,
    EDGEYOLO_NUM_PROCS, EDGEYOLO_PROC_ID) so launchers can export the same
    triplet everywhere — the analog of the reference's RANK/WORLD_SIZE
    contract. On real TPU pods all three are optional: jax.distributed
    autodetects from the TPU metadata, so `init_distributed()` bare is the
    normal call. No-op (with a warning) if already initialized.
    """
    global _initialized
    if _initialized:
        LOGGER.warning("init_distributed: already initialized; ignoring")
        return jax.process_index()
    coordinator = coordinator or os.environ.get("EDGEYOLO_COORDINATOR")
    num_processes = num_processes or _env_int("EDGEYOLO_NUM_PROCS")
    process_id = process_id if process_id is not None else _env_int("EDGEYOLO_PROC_ID")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes, process_id=process_id)
    _initialized = True
    LOGGER.info(f"distributed: process {jax.process_index()}/{jax.process_count()}, "
                f"{jax.local_device_count()} local / {jax.device_count()} global devices")
    return jax.process_index()


def _env_int(name: str) -> int | None:
    v = os.environ.get(name)
    return int(v) if v else None


def host_local_batch(batch: dict, mesh, axis: str = "data") -> dict:
    """Assemble a GLOBAL sharded batch from this process's local slice.

    Each host feeds `global_batch / process_count` examples; leaves become
    jax.Arrays spanning the global mesh (make_array_from_process_local_data),
    so the jitted step is identical to the single-process one. Non-array
    entries ("meta", "n_real") stay host-local.
    """
    from edgeyolo_tpu.parallel.mesh import batch_sharding

    sh = batch_sharding(mesh, axis)

    def put(x):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1:
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return x

    return {k: put(v) if k not in ("meta", "n_real") else v for k, v in batch.items()}
