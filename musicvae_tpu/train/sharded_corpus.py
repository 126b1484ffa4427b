"""Data-axis-SHARDED resident corpus (TPU-native scaling of the resident
train path; SURVEY §2.2 DP row, round-3 addition).

The default resident path replicates the uint8 bar cache into every
device's HBM (train/trainer.py) — simple, and right for corpora ≪ HBM.
This module covers the middle regime the framework previously ceded to
host-link streaming: corpora LARGER than one device's usable HBM but
smaller than the mesh's total. The corpus is partitioned piece-wise into
one shard per 'data'-axis slot (PianoRollDataset.host_shard), each device
holds only its shard (global bar array sharded on the leading axis), and
every train step gathers its batch rows from the LOCAL shard via a
jax.shard_map — no collectives touch roll data; the only cross-device
traffic remains the grad psum.

Sampling follows the standard sharded-loader contract (each shard
shuffles its own windows; device d's batch rows come from shard d), the
same semantics as data.HostLocalBatches and torch's DistributedSampler.
Per-shard draws are stateless in (seed, shard, step), so resume stays
O(1) and the continuous≡resumed property holds.

Enable via TrainSpec.corpus_layout="sharded" (CLI: train
--corpus-layout sharded). Equivalence against an emulated replicated run
is pinned in tests/test_sharded_corpus.py on the fake 8-device mesh.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from musicvae_tpu.config import Config
from musicvae_tpu.parallel import mesh as pmesh


def build_sharded_arrays(ds, n_shards: int, seed: int
                         ) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    """Partition ``ds`` into ``n_shards`` piece-wise shards and pack them
    into stackable equal-size blocks (XLA shards must be equal-shaped, so
    every block pads to the largest shard's bar/window counts; pad rows
    are never addressed — per-shard ids stay < that shard's true count).

    Returns ({"bars": [D*T_pad,96,128] u8, "starts": [D*S_pad] i32, and
    for labeled corpora "chords"/"keys": [D*S_pad] i32}, counts[D]) where
    counts[d] is shard d's true window count. Host arrays — upload with
    sharded_data_shardings' specs.
    """
    shards = [ds.host_shard(d, n_shards, seed=seed) for d in range(n_shards)]
    t_pad = max(s.bars.shape[0] for s in shards)
    s_pad = max(len(s) for s in shards)

    def pad(a: np.ndarray, n: int) -> np.ndarray:
        return np.pad(a, [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1))

    arrays = {
        "bars": np.concatenate([pad(s.bars, t_pad) for s in shards]),
        "starts": np.concatenate([pad(s.starts, s_pad) for s in shards]),
        "chords": np.concatenate([pad(s.chords, s_pad) for s in shards]),
        "keys": np.concatenate([pad(s.keys, s_pad) for s in shards]),
    }
    counts = np.array([len(s) for s in shards], np.int64)
    return arrays, counts


def sharded_data_shardings(mesh: Mesh) -> Dict[str, NamedSharding]:
    """Leading axis sharded over 'data' for every corpus array: device d
    holds ONLY its shard's block — the 1/D HBM footprint is the point."""
    return {
        "bars": NamedSharding(mesh, P(pmesh.DATA_AXIS, None, None)),
        "starts": NamedSharding(mesh, P(pmesh.DATA_AXIS)),
        "chords": NamedSharding(mesh, P(pmesh.DATA_AXIS)),
        "keys": NamedSharding(mesh, P(pmesh.DATA_AXIS)),
    }


def make_sharded_gather(cfg: Config, mesh: Mesh) -> Callable:
    """(sharded device data, [B] shard-LOCAL window ids) → batch dict.

    ids are shard-local: rows [d*B/D, (d+1)*B/D) of the id vector index
    into shard d's own starts block. The gather runs inside shard_map, so
    it is provably local — XLA cannot insert an all-gather of the corpus
    (the failure mode of gathering from a sharded array under plain
    GSPMD). Output batch is sharded on 'data', exactly like the
    replicated path's gathered batch, so the train step is unchanged.
    """
    nb = cfg.model.num_bars
    cond = cfg.model.kind == "cond"

    def local(bars, starts, chords, keys, idx):
        # per-device blocks: bars [T_pad,96,128], starts/chords/keys
        # [S_pad], idx [B/D] — all shard-local
        s = jnp.take(starts, idx)
        bar_idx = s[:, None] + jnp.arange(nb, dtype=s.dtype)
        batch = {"x": jnp.take(bars, bar_idx, axis=0)}
        if cond:
            batch["chord"] = jnp.repeat(
                jnp.take(chords, idx)[:, None], nb, axis=1)
            batch["key_sig"] = jnp.take(keys, idx)
        return batch

    data_p = P(pmesh.DATA_AXIS)
    out_specs = {"x": P(pmesh.DATA_AXIS, None, None, None)}
    if cond:
        out_specs["chord"] = P(pmesh.DATA_AXIS, None)
        out_specs["key_sig"] = data_p
    inner = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(pmesh.DATA_AXIS, None, None), data_p, data_p, data_p,
                  data_p),
        out_specs=out_specs)

    def gather(data, idx):
        return inner(data["bars"], data["starts"], data["chords"],
                     data["keys"], idx)

    return gather


def make_sharded_id_schedule(seed: int, counts: np.ndarray, b: int
                             ) -> Callable[[int], np.ndarray]:
    """Stateless step → [b] SHARD-LOCAL window ids (shard d owns rows
    [d*b/D, (d+1)*b/D)). Each shard runs its own trainer.make_id_schedule
    stream (shuffled epochs over its true window count) under a derived
    seed, so the properties the resident schedule guarantees — O(1)
    seekable resume, epoch cover, small-corpus replacement sampling —
    hold per shard."""
    from musicvae_tpu.train.trainer import make_id_schedule
    d = len(counts)
    if b % d:
        raise ValueError(f"batch_size {b} not divisible by {d} corpus "
                         "shards (the 'data' mesh axis)")
    bl = b // d
    subs = [make_id_schedule(
        int(np.random.default_rng((seed, 23, i)).integers(2 ** 63)),
        int(counts[i]), bl) for i in range(d)]

    def ids_for_step(step: int) -> np.ndarray:
        return np.concatenate([s(step) for s in subs])

    return ids_for_step
