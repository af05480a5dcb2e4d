"""Multi-host (DCN) initialization for pod-scale runs.

The reference has no distributed backend (SURVEY §2c: single process,
single device — its only "cluster" behavior is sequential subprocesses).
The TPU-native equivalent is JAX's built-in runtime: call
:func:`initialize_distributed` once per host before any backend use, then
build the global mesh with :func:`global_mesh`; GSPMD collectives ride ICI
within a slice and DCN across hosts — there is no NCCL/MPI layer to
configure.

Single-host runs need none of this: ``make_mesh`` over local devices is
enough (the training CLIs call nothing here by default).
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from clip_ppo_tpu.parallel.mesh import make_mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """``jax.distributed.initialize`` with env-var fallback.

    Arguments default to ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES``
    / ``JAX_PROCESS_ID`` (and, on Cloud TPU pods, to fully automatic
    detection when none are set). Returns True when a multi-process
    runtime was initialized, False for single-process runs.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        return False  # single host (explicit opt-in required for pods)

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(tp: int = 1):
    """(dp, tp) mesh over ALL processes' devices (``jax.devices()`` is
    global after ``initialize_distributed``); dp spans hosts so gradient
    psums cross DCN only on the dp axis."""
    return make_mesh(devices=jax.devices(), tp=tp)
