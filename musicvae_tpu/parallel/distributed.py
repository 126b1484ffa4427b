"""Multi-host initialization (SURVEY §5.8).

Within a slice, everything rides ICI via the ('data','model') mesh and XLA
collectives — no hand-written comm backend. Across hosts (multi-host pods,
DCN), JAX needs ``jax.distributed.initialize`` before any backend use; this
module wraps it with env-based autodetection so the same CLI command works
on 1 host or N (each host then sees its local chips and
``jax.devices()``/``make_mesh`` span the full pod).

Single-host runs (this build environment: one chip) skip initialization —
calling it is a no-op there by design.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_from_env(coordinator: Optional[str] = None,
                        num_processes: Optional[int] = None,
                        process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when a multi-host launch is detected.

    Detection order: explicit args → MVAE_COORDINATOR/MVAE_NUM_PROCS/
    MVAE_PROC_ID env → cloud-TPU autodetection (initialize() with no args,
    which reads the TPU metadata when on a multi-host pod). Returns True if
    distributed mode was initialized.
    """
    import jax

    coordinator = coordinator or os.environ.get("MVAE_COORDINATOR")
    num_processes = num_processes if num_processes is not None else (
        int(os.environ["MVAE_NUM_PROCS"])
        if "MVAE_NUM_PROCS" in os.environ else None)
    process_id = process_id if process_id is not None else (
        int(os.environ["MVAE_PROC_ID"])
        if "MVAE_PROC_ID" in os.environ else None)

    if coordinator and num_processes and process_id is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return True
    if os.environ.get("MVAE_AUTO_DISTRIBUTED") == "1":
        jax.distributed.initialize()   # cloud-TPU metadata autodetection
        return True
    return False
