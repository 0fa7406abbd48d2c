"""Multi-host runtime (SURVEY.md §2.10: the TPU-native equivalent of the
reference's missing communication backend).

``maybe_initialize`` wires ``jax.distributed.initialize()`` so that
``jax.devices()`` spans all hosts and the ``users`` mesh axis of
gqx.parallel.collectives rides ICI/DCN across processes.  On TPU pods the
coordinator/process topology is auto-detected from the environment; on CPU
(tests, smoke runs) the coordinator address / process count / process id are
passed explicitly.

Data feeding follows the standard JAX multi-host pattern: every process
computes the SAME global batch order (the Pipeline's epoch permutation is a
pure function of the config seed), slices out the users assigned to its
local devices, and assembles a global array with
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-process runtime if requested (explicit args) or
    auto-detectable (TPU pod env).  Returns True if distributed mode is on.

    Safe to call unconditionally: with no args and no pod environment this
    is a no-op single-process run."""
    explicit = coordinator_address is not None
    # auto mode requires an explicit coordinator env var; the mere presence of
    # TPU pod metadata is not enough (single-host tunneled TPU setups carry
    # TPU_WORKER_HOSTNAMES without any coordination service)
    auto = any(
        v in os.environ
        for v in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not (explicit or auto):
        return False
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return True


def process_user_range(num_users: int, mesh: Mesh, axis: str = "users") -> Tuple[int, int]:
    """[start, stop) of the global users resident on THIS process's devices.

    The mesh lays users contiguously over ``mesh.devices`` (collectives.
    make_user_mesh); users per device = num_users // mesh.devices.size."""
    devices = list(mesh.devices.reshape(-1))
    local = [i for i, d in enumerate(devices) if d.process_index == jax.process_index()]
    if not local:
        return 0, 0
    per_dev = num_users // len(devices)
    assert local == list(range(local[0], local[-1] + 1)), (
        "process devices must be contiguous on the users axis")
    return local[0] * per_dev, (local[-1] + 1) * per_dev


def global_user_batch(mesh: Mesh, arr: np.ndarray, axis: str = "users"):
    """(num_users, ...) host-replicated numpy -> global jax.Array sharded over
    the users mesh axis.  Single-process: a plain device_put.  Multi-process:
    each process contributes its local users' rows."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    start, stop = process_user_range(arr.shape[0], mesh, axis)
    return jax.make_array_from_process_local_data(sharding, np.asarray(arr[start:stop]))
