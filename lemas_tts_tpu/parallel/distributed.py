"""Multi-host distributed initialization (DCN) helpers.

The reference has no distributed runtime (SURVEY.md §2.3); the TPU-native
equivalent is JAX's built-in story: ``jax.distributed.initialize`` connects
hosts over DCN, ``jax.devices()`` then spans the fleet, and the same
``Mesh``/``pjit`` code scales from 1 chip to a multi-pod slice — collectives
ride ICI within a pod and DCN across hosts, inserted by GSPMD from the same
PartitionSpecs used single-host.

Usage (one call near process start, before any jax computation):

    from lemas_tts_tpu.parallel.distributed import initialize
    initialize()                       # TPU pod: auto-discovers via the TPU env
    mesh = make_global_mesh(model_parallel=4)
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize multi-host JAX. On Cloud TPU the arguments auto-discover
    from the environment; elsewhere pass them (or set
    ``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``).
    Returns True when running multi-process, False when single-process (a
    no-op, so the same entry point works everywhere)."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    # multi-host TPU pods list >1 worker hostname
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    on_tpu_pod = len([w for w in workers.split(",") if w.strip()]) > 1 or bool(
        os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if coordinator_address is None and not on_tpu_pod:
        return False  # single-process run
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already initialized" in str(e):
            return True
        if on_tpu_pod or coordinator_address is not None:
            # a CONFIGURED multi-host job must fail loudly — silently
            # degrading to independent single-host runs makes every host
            # train alone and write over the same checkpoint dir
            raise
        return False
    return True


def make_global_mesh(
    model_parallel: int = 1,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """Mesh over ALL devices in the job (all hosts): the 'data' axis spans
    hosts (collectives over DCN), 'model' stays within a host's chips (ICI).
    """
    devices = np.asarray(jax.devices())
    n = devices.size
    assert n % model_parallel == 0, (n, model_parallel)
    return Mesh(devices.reshape(n // model_parallel, model_parallel),
                axis_names=tuple(axis_names))


def is_primary() -> bool:
    """True on process 0 — gate checkpoint writes / logging."""
    return jax.process_index() == 0
