"""Mesh bootstrap and sharding helpers.

This is the TPU-native replacement for the reference's entire
``mps/distributed.py`` stack (NCCL/gloo/MPI rendezvous, 470 lines copied
into three stages): a JAX single-controller program needs only

* ``jax.distributed.initialize`` on multi-host (no-op single host),
* a ``jax.sharding.Mesh`` over the devices,
* ``NamedSharding`` annotations; XLA inserts the collectives over ICI.

``all_gather``/``all_reduce``/``diff_all_gather`` of the reference map to
``jax.lax.all_gather``/``psum`` inside ``shard_map``/jit — under SPMD
autodiff the differentiable gather is free (reference
``mps/distributed.py:463-470``). Shard placement (``node_selection``) lives
in ``utils.shards`` and is pure host logic.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_runtime(coordinator_address: Optional[str] = None,
                       num_processes: Optional[int] = None,
                       process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap. Single-host (the common case here) is a no-op.

    Replaces the reference's TCP/file/MPI rendezvous zoo
    (``mps/distributed.py:21-196``).
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def get_mesh(
    num_devices: Optional[int] = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over available devices.

    Default is a 1-D ``('data',)`` mesh — the reference's only parallelism
    strategy is data parallelism (SURVEY.md 2.9). A 2-D shape can be passed
    for (data, model) layouts used by the contrastive trainer.
    """
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    mesh_devices = np.asarray(devices).reshape(shape)
    return Mesh(mesh_devices, axis_names=tuple(axis_names))


def data_sharding(mesh: Mesh, ndim: int = 1, axis: int = 0) -> NamedSharding:
    """Shard dimension ``axis`` of an ``ndim``-dim array over the data axis."""
    spec = [None] * ndim
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_size(global_batch_size: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by data axis {n}"
        )
    return global_batch_size // n


def cpu_mesh_env(n: int = 8) -> dict:
    """Env vars for an n-virtual-device CPU mesh (tests / dry runs)."""
    return {
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={n}"
        ).strip(),
    }
