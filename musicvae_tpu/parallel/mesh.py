"""Device mesh + sharding helpers (SURVEY §2.2, §5.8).

The reference is single-process/single-device; scale-out here is pure
jax.sharding: a ('data', 'model') mesh, batch-axis NamedSharding for DP,
fully-replicated (or model-axis-sharded) params. XLA emits the collectives
(psum for grads under DP) over ICI — no hand-written comm backend.

Single-chip runs use a trivial 1x1 mesh so every code path is identical
from 1 chip to a full slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from musicvae_tpu.config import MeshSpec

DATA_AXIS = "data"
MODEL_AXIS = "model"


def host_init_device():
    """Device to run eager init work on: the host CPU when the default
    backend is an accelerator, else None (stay on the default).

    Flax's ``Module.init`` and optax's ``init`` execute EAGERLY — one XLA
    program per op. On a remote-compile TPU backend (axon tunnel) every
    one of those throwaway batch=2 programs pays a compile round-trip
    that can cost minutes on a congested day (observed round 5: >20 min
    stuck in param-init compiles before the train-step compile even
    started). Initializing under ``jax.default_device(host_init_device())``
    is local and instant, deterministic in the seed across processes, and
    transparent to placement — callers re-place the resulting pytree onto
    the mesh (put_tree / checkpoint restore) anyway."""
    if jax.default_backend() == "cpu":
        return None
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def make_mesh(spec: Optional[MeshSpec] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build the (data, model) mesh.

    If the requested layout needs more devices than exist, the data axis is
    clamped to what is available (so C4/C5's v4-8/v5e-8 configs run on the
    single dev chip unchanged).
    """
    devices = list(devices if devices is not None else jax.devices())
    spec = spec or MeshSpec()
    model = max(1, spec.model)
    data = max(1, spec.data)
    if data * model > len(devices):
        if model > len(devices):
            raise ValueError(f"model axis {model} > {len(devices)} devices")
        data = len(devices) // model
    dev_grid = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(dev_grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over 'data'; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(x, sharding: NamedSharding):
    """Host array → global jax.Array under ``sharding``, valid even when
    the mesh spans processes (multi-host pods over DCN).

    Every process must hold the SAME full-size host value — the framework's
    data-loading contract: the bar cache and the per-step window-id batches
    are deterministic functions of (corpus, seed), so each host computes the
    identical global value and this helper uploads only the shards its own
    devices own. jax.device_put can't do this (it rejects shardings that
    include non-addressable devices); building per-device shards +
    make_array_from_single_device_arrays is the JAX-native answer.
    """
    from jax import dtypes as jdtypes
    if (hasattr(x, "dtype")
            and jdtypes.issubdtype(x.dtype, jdtypes.prng_key)):
        # typed PRNG keys ride as their uint32 key data (replicated state
        # keys — the only key leaves in this framework's pytrees)
        data = put_global(np.asarray(jax.random.key_data(x)), sharding)
        return jax.random.wrap_key_data(data, impl=jax.random.key_impl(x))
    x = np.asarray(x)
    idx_map = sharding.addressable_devices_indices_map(x.shape)
    shards = [jax.device_put(x[idx], d) for d, idx in idx_map.items()]
    return jax.make_array_from_single_device_arrays(x.shape, sharding,
                                                    list(shards))


def put_host_local(tree, sharding: NamedSharding):
    """Per-process LOCAL shard pytree → global jax.Array pytree.

    The dual of put_global's replicated-host-data contract: here each
    process holds ONLY the rows its own devices own along the sharded
    axis (data.HostLocalBatches — per-host sharded data loading), and the
    global array is assembled from the process-local pieces
    (jax.make_array_from_process_local_data). Process p's slice covers
    rows [p*B/P, (p+1)*B/P) of the sharded axis — the mesh lays device
    order out process-contiguously (make_mesh uses jax.devices(), which
    sorts by process), and the 2-process equivalence test
    (tests/test_multiprocess.py, mode='host_sharded') pins the mapping
    against a single-process run.

    Single-process it degenerates to a plain sharded device_put.
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), tree)


def put_tree(tree, sharding: NamedSharding):
    """put_global over a pytree (single sharding for every leaf).

    Single-process fast path: plain device_put (one transfer per leaf,
    XLA-managed replication) — identical semantics, less per-shard Python.
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    return jax.tree.map(lambda x: put_global(x, sharding), tree)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree onto the mesh, batch-axis sharded.
    Works on process-spanning meshes (see put_global's data contract)."""
    return put_tree(batch, batch_sharding(mesh))
