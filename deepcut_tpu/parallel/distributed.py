"""Multi-host initialisation (reference has none — single node only).

Thin wrapper over `jax.distributed`: call `initialize()` on every host, then
build meshes spanning all processes; DP gradients cross hosts over DCN, the
intra-host axes ride ICI. No framework code changes — the same
`parallel.mesh` / `parallel.train_step` declarations scale out.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialise multi-host JAX. Arguments default to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) or, on
    TPU pods, to automatic cluster detection."""
    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"])
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None else os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


def global_mesh(*, spatial: int = 1):
    """A ('data', 'spatial') mesh over every device in the job."""
    from deepcut_tpu.parallel.mesh import make_mesh

    return make_mesh(devices=jax.devices(), spatial=spatial)


def is_coordinator() -> bool:
    return jax.process_index() == 0
