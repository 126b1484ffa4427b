"""Per-host sharded data loading (SURVEY §2.2 comm-backend row):
PianoRollDataset.host_shard partition properties, put_host_local
placement, and the HostLocalBatches streaming train path. The real
2-process equivalence run is tests/test_multiprocess.py::
test_two_process_host_sharded_matches_single_process; these tests pin
the single-process semantics and the partition invariants cheaply.
"""

import dataclasses

import numpy as np
import pytest

from conftest import cpu_friendly
from musicvae_tpu.config import C2_GRU_4BAR
from musicvae_tpu.data import (HostLocalBatches, PianoRollDataset,
                               synth_corpus)


@pytest.fixture(scope="module")
def ds():
    cfg = C2_GRU_4BAR
    return PianoRollDataset.from_corpus(
        synth_corpus(num_pieces=5, n_bars=8, seed=1), cfg.midi,
        cfg.model.num_bars)


def _window_rolls(d: PianoRollDataset) -> np.ndarray:
    return d.bars[d.window_indices(np.arange(len(d)))]


@pytest.mark.parametrize("pc", [2, 3, 5])
def test_host_shard_partitions_windows(ds, pc):
    """Shards are disjoint, cover every window, and preserve each
    window's content/labels exactly (starts are remapped into the
    compacted per-shard bar array)."""
    shards = [ds.host_shard(p, pc, seed=7) for p in range(pc)]
    # every shard is self-contained and smaller than the full corpus
    for s in shards:
        assert s.bars.flags["C_CONTIGUOUS"]
        if pc > 1:
            assert s.bars.shape[0] < ds.bars.shape[0]
        assert s.starts.max() + s.num_bars <= s.bars.shape[0]
    assert sum(len(s) for s in shards) == len(ds)
    # piece-aware: no piece id appears in two shards
    per_shard_pieces = [set(np.unique(s.piece_ids)) for s in shards]
    for i in range(pc):
        for j in range(i + 1, pc):
            assert not (per_shard_pieces[i] & per_shard_pieces[j])
    # content parity: the multiset of window rolls is preserved (compare
    # via sorted byte keys; labels ride along per window)
    def keys(d):
        rolls = _window_rolls(d)
        return sorted(rolls[i].tobytes()
                      + d.chords[i].tobytes() + d.keys[i].tobytes()
                      for i in range(len(d)))
    merged = []
    for s in shards:
        merged.extend(keys(s))
    assert sorted(merged) == keys(ds)


def test_host_shard_is_deterministic(ds):
    a = ds.host_shard(1, 2, seed=3)
    b = ds.host_shard(1, 2, seed=3)
    np.testing.assert_array_equal(a.bars, b.bars)
    np.testing.assert_array_equal(a.starts, b.starts)
    np.testing.assert_array_equal(a.chords, b.chords)


def test_host_shard_rejects_bad_args(ds):
    with pytest.raises(ValueError, match="not in"):
        ds.host_shard(2, 2)
    with pytest.raises(ValueError, match="cannot shard"):
        ds.host_shard(0, len(np.unique(ds.piece_ids)) + 1)


def test_put_host_local_single_process_places_sharded():
    import jax
    from musicvae_tpu.parallel import make_mesh, put_host_local
    from musicvae_tpu.config import MeshSpec
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(MeshSpec(data=len(jax.devices()), model=1))
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    sh = NamedSharding(mesh, P("data"))
    g = put_host_local({"x": x}, sh)["x"]
    assert g.shape == x.shape and g.sharding == sh
    np.testing.assert_array_equal(np.asarray(g), x)


def test_host_local_stream_matches_plain_stream_single_process():
    """With one process, HostLocalBatches is the plain streaming path
    (the local slice IS the global batch) — bit-identical training."""
    from musicvae_tpu.train import train

    cfg = cpu_friendly(C2_GRU_4BAR)
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, enc_channels=(4, 8, 8, 8, 8),
            dec_channels=(8, 8, 8, 8, 8), z_dim=16, gru_hidden=32,
            bar_feat_dim=32, dtype="float32"),
        train=dataclasses.replace(cfg.train, batch_size=8, num_steps=4,
                                  log_every=2, ckpt_every=4))
    ds = PianoRollDataset.from_corpus(
        synth_corpus(num_pieces=4, n_bars=8, seed=0), cfg.midi,
        cfg.model.num_bars)
    _, s_plain, m_plain = train(cfg, ds.iterator(8, seed=5))
    _, s_local, m_local = train(cfg, HostLocalBatches(ds.iterator(8,
                                                                  seed=5)))
    assert float(m_plain["loss"]) == float(m_local["loss"])
    import jax
    for a, b in zip(jax.tree.leaves(s_plain.params),
                    jax.tree.leaves(s_local.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_host_local_wrong_batch_size_rejected():
    from musicvae_tpu.train import train

    cfg = cpu_friendly(C2_GRU_4BAR)
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, enc_channels=(4, 8, 8, 8, 8),
            dec_channels=(8, 8, 8, 8, 8), z_dim=16, gru_hidden=32,
            bar_feat_dim=32, dtype="float32"),
        train=dataclasses.replace(cfg.train, batch_size=8, num_steps=2,
                                  log_every=2, ckpt_every=2))
    ds = PianoRollDataset.from_corpus(
        synth_corpus(num_pieces=4, n_bars=8, seed=0), cfg.midi,
        cfg.model.num_bars)
    # 1 process: a local slice of 4 rows cannot make a global batch of 8
    with pytest.raises(ValueError, match="host-local"):
        train(cfg, HostLocalBatches(ds.iterator(4, seed=5)))
