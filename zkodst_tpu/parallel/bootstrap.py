"""Multi-host bootstrap + mesh construction (SURVEY.md §5.8).

The reference's only "distributed backend" is rayon threads; its missing
MPI-init analogue is `jax.distributed.initialize`. This module is the
pod-slice entry point: call :func:`init_distributed` once per host process
(no-op on a single host), then :func:`make_mesh` to get the device mesh the
prover shards over (`create_proof(..., mesh=mesh, mesh_axis=...)`).

Axis convention: ("host", "chip") — the host axis maps to DCN, the chip
axis to ICI. `create_proof` accepts either one axis name or a tuple of
names (rows/points then shard over the flattened product), so a 2-D mesh
needs no special casing: `mesh_axis=("host", "chip")`.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple, Union

import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize the JAX distributed runtime (multi-host pods).

    Arguments default from the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); on TPU
    pods jax.distributed.initialize() can also autodetect all three. A
    single-process run (no coordinator configured) is a no-op, so this is
    safe to call unconditionally at program start."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and os.environ.get(
            "JAX_NUM_PROCESSES") is None:
        return                      # single host — nothing to bootstrap
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = (num_processes if num_processes is not None
                                   else int(os.environ["JAX_NUM_PROCESSES"]))
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = (process_id if process_id is not None
                                else int(os.environ["JAX_PROCESS_ID"]))
    jax.distributed.initialize(**kwargs)


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              axis_names: Tuple[str, ...] = ("host", "chip")):
    """Build the (hosts × chips-per-host) prover mesh.

    shape=None infers (process_count, local_device_count). For a 1-D mesh
    pass shape=(n,) with a single axis name."""
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices())
    if shape is None:
        hosts = jax.process_count()
        shape = (hosts, devs.size // hosts)
    assert int(np.prod(shape)) == devs.size, (shape, devs.size)
    if len(shape) == 1 and len(axis_names) != 1:
        axis_names = (axis_names[-1],)
    return Mesh(devs.reshape(shape), axis_names=axis_names)


AxisName = Union[str, Sequence[str]]


def axis_size(mesh, axis: AxisName) -> int:
    """Mesh extent of one axis name or the product over a tuple of names."""
    if isinstance(axis, str):
        return mesh.shape[axis]
    return int(np.prod([mesh.shape[a] for a in axis]))
