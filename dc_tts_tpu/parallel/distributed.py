"""Multi-host initialization (the framework's communication backend).

The reference has no distributed execution at all (SURVEY §2.3). Here the
communication layer is the JAX runtime itself: ``initialize()`` wires this
process into a multi-host pod slice (DCN for control, ICI/DCN collectives
inserted by GSPMD), after which the SAME mesh/sharding code in
``parallel/mesh.py`` spans all hosts — jax.devices() becomes the global
device list and per-host shards feed the 'data' axis.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env fallbacks.

    On TPU pods the arguments auto-detect; on CPU/GPU clusters pass them or
    set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    Idempotent: a second call is a no-op.
    """
    if getattr(initialize, "_done", False):
        return
    kw = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kw["coordinator_address"] = addr
    n = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    if n:
        kw["num_processes"] = int(n)
    pid = process_id if process_id is not None else \
        os.environ.get("JAX_PROCESS_ID")
    if pid is not None:
        kw["process_id"] = int(pid)
    jax.distributed.initialize(**kw)
    initialize._done = True


def process_info() -> dict:
    return {"process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "local_devices": len(jax.local_devices()),
            "global_devices": jax.device_count()}
