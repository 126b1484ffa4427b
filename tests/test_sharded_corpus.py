"""Sharded resident corpus (train/sharded_corpus.py): the data-axis-
sharded bar cache + shard_map local gather must train identically to an
emulated replicated run fed the same per-shard draws, and each device
must hold only its 1/D block. Runs on the fake 8-device CPU mesh
(tests/conftest.py).
"""

import dataclasses

import jax
import numpy as np
import pytest

from conftest import cpu_friendly
from musicvae_tpu.config import C2_GRU_4BAR, C4_COND, MeshSpec
from musicvae_tpu.data import PianoRollDataset, synth_corpus
from musicvae_tpu.parallel import make_mesh
from musicvae_tpu.train import train
from musicvae_tpu.train.sharded_corpus import (build_sharded_arrays,
                                               make_sharded_id_schedule)


def _tiny(cfg, **train_kw):
    model = dataclasses.replace(
        cfg.model, enc_channels=(4, 8, 8, 8, 8),
        dec_channels=(8, 8, 8, 8, 8), z_dim=16, gru_hidden=32,
        bar_feat_dim=32, dtype="float32")
    kw = dict(batch_size=16, num_steps=6, log_every=2, ckpt_every=6)
    kw.update(train_kw)
    tr = dataclasses.replace(cfg.train, **kw)
    return cfg.replace(model=model, train=tr,
                       mesh=MeshSpec(data=8, model=1))


@pytest.fixture(scope="module")
def ds():
    return PianoRollDataset.from_corpus(
        synth_corpus(num_pieces=9, n_bars=8, seed=2), C2_GRU_4BAR.midi,
        C2_GRU_4BAR.model.num_bars)


def _emulated_replicated_run(cfg, ds):
    """Feed the plain streaming path the exact global batches the sharded
    layout's per-shard schedules produce — the reference semantics."""
    d = cfg.mesh.data
    shards = [ds.host_shard(i, d, seed=cfg.train.seed) for i in range(d)]
    counts = np.array([len(s) for s in shards], np.int64)
    ids_fn = make_sharded_id_schedule(cfg.train.seed, counts,
                                      cfg.train.batch_size)
    bl = cfg.train.batch_size // d

    def batches():
        step = 0
        while True:
            ids = ids_fn(step)
            parts = [shards[i].batch(ids[i * bl:(i + 1) * bl])
                     for i in range(d)]
            yield {kk: np.concatenate([p[kk] for p in parts])
                   for kk in parts[0]}
            step += 1

    return train(cfg, batches())


def _param_vec(state):
    return np.concatenate([np.asarray(p, np.float64).ravel()
                           for p in jax.tree.leaves(state.params)])


def test_sharded_corpus_matches_emulated_replicated(ds):
    cfg = _tiny(cpu_friendly(C2_GRU_4BAR), corpus_layout="sharded")
    _, s_sh, m_sh = train(cfg, ds)
    _, s_ref, m_ref = _emulated_replicated_run(cfg, ds)
    assert int(jax.device_get(s_sh.step)) == 6
    np.testing.assert_allclose(float(m_sh["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(_param_vec(s_sh), _param_vec(s_ref),
                               rtol=1e-5, atol=1e-7)


def test_sharded_corpus_cond_labels_ride_along(ds):
    """Cond models gather chord/key from the same local shard blocks."""
    cfg = _tiny(cpu_friendly(C4_COND), corpus_layout="sharded")
    cds = PianoRollDataset.from_corpus(
        synth_corpus(num_pieces=9, n_bars=8, seed=2), cfg.midi,
        cfg.model.num_bars, infer_labels=True)
    _, s_sh, m_sh = train(cfg, cds)
    _, s_ref, m_ref = _emulated_replicated_run(cfg, cds)
    np.testing.assert_allclose(float(m_sh["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(_param_vec(s_sh), _param_vec(s_ref),
                               rtol=1e-5, atol=1e-7)


def test_sharded_arrays_are_actually_sharded(ds):
    """Each device's addressable shard holds one 1/D block of the padded
    corpus — the HBM-scaling claim, checked on device."""
    from musicvae_tpu.train.sharded_corpus import sharded_data_shardings
    mesh = make_mesh(MeshSpec(data=8, model=1))
    arrays, counts = build_sharded_arrays(ds, 8, seed=0)
    sh = sharded_data_shardings(mesh)
    bars = jax.device_put(arrays["bars"], sh["bars"])
    assert counts.sum() == len(ds)
    t_pad = arrays["bars"].shape[0] // 8
    for s in bars.addressable_shards:
        assert s.data.shape == (t_pad, 96, 128)


def test_sharded_id_schedule_rejects_bad_batch():
    with pytest.raises(ValueError, match="not divisible"):
        make_sharded_id_schedule(0, np.array([5, 5, 5]), 16)


def test_sharded_resume_matches_continuous(ds, tmp_path):
    """The stateless per-shard schedules keep the continuous ≡ resumed
    property under the sharded layout."""
    from musicvae_tpu import checkpoints

    cfg = _tiny(cpu_friendly(C2_GRU_4BAR), corpus_layout="sharded",
                num_steps=6, ckpt_every=3)
    mgr = checkpoints.make_manager(str(tmp_path / "ck"), keep=3)
    _, s_a, _ = train(cfg, ds, ckpt_manager=mgr)
    mgr.wait_until_finished()

    mgr2 = checkpoints.make_manager(str(tmp_path / "ck"), keep=3)
    from musicvae_tpu.train import create_state
    _, template = create_state(cfg)
    restored, rcfg = checkpoints.restore(mgr2, template, step=3)
    _, s_b, _ = train(rcfg, ds, state=restored)
    np.testing.assert_allclose(_param_vec(s_a), _param_vec(s_b),
                               rtol=0, atol=0)
