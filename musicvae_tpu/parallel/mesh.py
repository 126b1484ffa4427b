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


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree onto the mesh, batch-axis sharded."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
