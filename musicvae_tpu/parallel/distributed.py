"""Multi-host initialization (SURVEY §5.8).

Within a slice, everything rides ICI via the ('data','model') mesh and XLA
collectives — no hand-written comm backend. Across hosts (multi-host pods,
DCN), JAX needs ``jax.distributed.initialize`` before any backend use; this
module provides the launch wiring. The training DATA path spans hosts:
every process computes the same host-side values (bar cache, window-id
batches, initial state — all deterministic in (corpus, seed)) and
parallel/mesh.put_global uploads only each process's own device shards
(make_array_from_single_device_arrays), so train() runs unchanged on a
process-spanning mesh. Proven by the 2-process CPU equivalence test in
tests/test_multiprocess.py (same loss/params as the single-process mesh).

Single-host runs (this build environment: one chip) skip initialization.
"""

from __future__ import annotations

import os
from typing import Optional

_initialized = False


def initialize_from_env(coordinator: Optional[str] = None,
                        num_processes: Optional[int] = None,
                        process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when a multi-host launch is configured.

    Sources, in precedence order:
    1. explicit arguments;
    2. MVAE_COORDINATOR + MVAE_NUM_PROCS + MVAE_PROC_ID env vars (all three
       required together — a partial set raises ValueError rather than
       silently training an independent single-host job);
    3. MVAE_AUTO_DISTRIBUTED=1 → ``jax.distributed.initialize()`` with no
       args (cloud-TPU metadata autodetection). This fallback is explicitly
       opt-in via that variable, never automatic.

    Idempotent: repeated calls after a successful initialization return
    True without re-initializing. Returns False when nothing is configured.
    """
    global _initialized
    if _initialized:
        return True

    coordinator = coordinator or os.environ.get("MVAE_COORDINATOR")
    num_processes = num_processes if num_processes is not None else (
        int(os.environ["MVAE_NUM_PROCS"])
        if "MVAE_NUM_PROCS" in os.environ else None)
    process_id = process_id if process_id is not None else (
        int(os.environ["MVAE_PROC_ID"])
        if "MVAE_PROC_ID" in os.environ else None)

    fields = {"MVAE_COORDINATOR": coordinator,
              "MVAE_NUM_PROCS": num_processes,
              "MVAE_PROC_ID": process_id}
    present = {k for k, v in fields.items() if v is not None}
    if present and present != set(fields):
        missing = sorted(set(fields) - present)
        raise ValueError(
            "partial multi-host configuration: missing "
            f"{', '.join(missing)} (all of MVAE_COORDINATOR, "
            "MVAE_NUM_PROCS, MVAE_PROC_ID must be set together)")

    import jax

    if present:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        _initialized = True
        return True
    if os.environ.get("MVAE_AUTO_DISTRIBUTED") == "1":
        jax.distributed.initialize()   # cloud-TPU metadata autodetection
        _initialized = True
        return True
    return False


def assert_hosts_identical(what: str, *chunks) -> None:
    """Fail fast if any process's ``chunks`` differ from the others'.
    Chunks are anything hashlib accepts (bytes or buffer-protocol
    objects — pass C-contiguous ndarrays directly; .tobytes() would
    copy a corpus that can be HBM-sized).

    The multi-host data path's correctness rests on an UNCHECKED contract:
    every process computes the identical host-side value before
    parallel/mesh.put_global uploads its own devices' shards. A
    nondeterministic data source (e.g. an unseeded iterator) would
    otherwise train on silently divergent shards. This guard hashes the
    value on each process and all-gathers the digests; every process
    raises on mismatch (the gathered array is identical everywhere, so no
    process proceeds alone). One collective at startup — not per step.
    """
    import hashlib

    import jax
    import numpy as np

    if jax.process_count() == 1:
        return
    h = hashlib.sha256()
    for c in chunks:
        h.update(c)
    local = np.frombuffer(h.digest()[:16], dtype=np.uint32)
    from jax.experimental import multihost_utils
    gathered = np.asarray(multihost_utils.process_allgather(local))
    if not (gathered == local[None, :]).all():
        bad = [p for p in range(gathered.shape[0])
               if not (gathered[p] == gathered[0]).all()]
        raise RuntimeError(
            f"multi-host data divergence: {what} differs across processes "
            f"(processes {bad} disagree with process 0). Every host must "
            f"compute the identical corpus/batches — see "
            f"parallel/mesh.put_global's data contract.")
