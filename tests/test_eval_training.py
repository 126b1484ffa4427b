"""Periodic in-training eval + best-checkpoint tracking (SURVEY §2.1 #10
"periodic eval recon"): the holdout split, the eval cadence inside train(),
and best-by-eval-loss checkpointing.
"""

import dataclasses

import numpy as np
import pytest

from conftest import cpu_friendly
from musicvae_tpu.config import C1_CONV_BAR
from musicvae_tpu.data import PianoRollDataset, synth_corpus


def tiny(cfg, **train_kw):
    model = dataclasses.replace(
        cfg.model, enc_channels=(4, 8, 8, 8, 8), dec_channels=(8, 8, 8, 8, 8),
        z_dim=16, gru_hidden=32, bar_feat_dim=32, dtype="float32")
    train = dataclasses.replace(cfg.train, batch_size=8, **train_kw)
    return cfg.replace(model=model, train=train)


@pytest.fixture(scope="module")
def ds():
    return PianoRollDataset.from_corpus(
        synth_corpus(num_pieces=6, n_bars=6, seed=3),
        C1_CONV_BAR.midi, num_bars=1)


def test_split_piece_level_no_leakage(ds):
    tr, ev = ds.split(0.34, seed=0)
    assert len(tr) + len(ev) == len(ds)
    assert len(tr) > 0 and len(ev) > 0
    # piece-level: no piece appears on both sides (windows of one piece
    # share bars, so a window-level split would leak)
    assert not set(tr.piece_ids.tolist()) & set(ev.piece_ids.tolist())
    # deterministic
    tr2, ev2 = ds.split(0.34, seed=0)
    np.testing.assert_array_equal(ev.starts, ev2.starts)
    # the underlying bar store is shared, not copied
    assert tr.bars is ds.bars and ev.bars is ds.bars


def test_split_single_piece_falls_back_to_tail():
    one = PianoRollDataset.from_corpus(
        synth_corpus(num_pieces=1, n_bars=12, seed=1),
        C1_CONV_BAR.midi, num_bars=1)
    tr, ev = one.split(0.25)
    assert len(tr) + len(ev) == len(one)
    # tail split: eval windows are the last ones (contiguous)
    assert ev.starts.min() > tr.starts.max()


def test_split_validates_frac(ds):
    for bad in (0.0, 1.0, -0.5, 2.0):
        with pytest.raises(ValueError):
            ds.split(bad)


def test_legacy_cache_roundtrip_keeps_piece_ids(tmp_path, ds):
    path = str(tmp_path / "cache.npz")
    ds.save_npy(path)
    back = PianoRollDataset.load_npy(path)
    np.testing.assert_array_equal(back.piece_ids, ds.piece_ids)
    # legacy cache without piece_ids loads with zeros (tail-split fallback)
    np.savez_compressed(path, bars=ds.bars, starts=ds.starts,
                        num_bars=ds.num_bars, chords=ds.chords, keys=ds.keys)
    legacy = PianoRollDataset.load_npy(path)
    assert (legacy.piece_ids == 0).all()


def test_train_runs_eval_and_tracks_best(tmp_path, ds):
    from musicvae_tpu import checkpoints
    from musicvae_tpu.train import train

    cfg = cpu_friendly(tiny(C1_CONV_BAR, num_steps=20, log_every=10,
                            ckpt_every=20, eval_every=10, eval_batches=2,
                            learning_rate=2e-3))
    tr, ev = ds.split(0.34, seed=0)
    best = checkpoints.make_manager(str(tmp_path / "best"), 1)
    records = []
    _, state, _ = train(cfg, tr, eval_data=ev, best_ckpt_manager=best,
                        log_fn=lambda s, m: records.append((s, m)))
    best.wait_until_finished()

    eval_records = {s: m for s, m in records if "eval_loss" in m}
    assert sorted(eval_records) == [10, 20], "eval must fire every 10 steps"
    for m in eval_records.values():
        assert {"eval_loss", "eval_recon", "eval_kl", "eval_f1"} <= set(m)
    # best checkpoint is the argmin-eval-loss step
    best_step = min(eval_records, key=lambda s: eval_records[s]["eval_loss"])
    assert best.latest_step() == best_step
    assert int(state.step) == 20


def test_resume_is_noop_when_finished(ds):
    """num_steps is TOTAL: resuming a finished run performs zero steps."""
    from musicvae_tpu.train import train

    cfg = cpu_friendly(tiny(C1_CONV_BAR, num_steps=4, log_every=2,
                            ckpt_every=4))
    _, state, _ = train(cfg, ds)
    assert int(state.step) == 4
    _, state2, _ = train(cfg, ds, state=state)
    assert int(state2.step) == 4
    # and extending num_steps continues from the restored step
    _, state3, _ = train(cfg, ds, num_steps=6, state=state2)
    assert int(state3.step) == 6


def test_best_checkpoint_survives_resume(tmp_path, ds):
    """A resumed train() must not overwrite the best checkpoint with a
    worse state: the best eval loss persists in a sidecar next to the
    best checkpoint (review finding: best_eval_loss reset to +inf on
    every train() call)."""
    import json

    from musicvae_tpu import checkpoints
    from musicvae_tpu.train import train

    cfg = cpu_friendly(tiny(C1_CONV_BAR, num_steps=20, log_every=10,
                            ckpt_every=20, eval_every=10, eval_batches=2,
                            learning_rate=2e-3))
    tr, ev = ds.split(0.34, seed=0)
    best = checkpoints.make_manager(str(tmp_path / "best"), 1)
    _, state, _ = train(cfg, tr, eval_data=ev, best_ckpt_manager=best)
    best.wait_until_finished()
    sidecar = tmp_path / "best" / "best_metric.json"
    assert sidecar.exists()
    recorded = json.loads(sidecar.read_text())["eval_loss"]

    # fake an earlier, much better best: a resumed run's first eval must
    # NOT beat it
    sidecar.write_text(json.dumps({"eval_loss": recorded - 1e9,
                                   "step": 1}))
    prev_best_step = best.latest_step()
    _, state2, _ = train(cfg, tr, num_steps=40, state=state,
                         eval_data=ev, best_ckpt_manager=best)
    best.wait_until_finished()
    assert best.latest_step() == prev_best_step, (
        "resume overwrote a better best checkpoint")
    assert json.loads(sidecar.read_text())["eval_loss"] == recorded - 1e9


def test_streaming_iterator_errors_propagate(ds):
    """A failing/finite streaming iterator must raise in train(), not
    silently kill the producer thread and hang batch_q.get() forever."""
    import numpy as np
    import pytest as _pytest

    from musicvae_tpu.train import train

    cfg = cpu_friendly(tiny(C1_CONV_BAR, num_steps=8, log_every=2,
                            ckpt_every=8))

    def finite_iter(n):
        for _ in range(n):
            yield {"x": np.zeros((cfg.train.batch_size, 1, 96, 128),
                                 np.float32)}

    with _pytest.raises(RuntimeError, match="exhausted"):
        train(cfg, iter(finite_iter(2)))

    def poison_iter():
        yield {"x": np.zeros((cfg.train.batch_size, 1, 96, 128),
                             np.float32)}
        raise OSError("disk gone")

    with _pytest.raises(OSError, match="disk gone"):
        train(cfg, iter(poison_iter()))


def test_resume_matches_continuous_run_exactly(ds):
    """Crash-resume is EXACT: training 0→N in one run equals training
    0→M then resuming M→N — the id schedule is a pure function of
    (seed, step) so the resumed leg draws exactly the continuation of the
    continuous run's batch sequence, and the dispatch plan realigns to
    the cadence grid. Review findings: a resumed run previously replayed
    the schedule from 0 and, with k ∤ start_step, skipped every log/ckpt
    boundary."""
    import jax as _jax

    from musicvae_tpu.train import train

    cfg = cpu_friendly(tiny(C1_CONV_BAR, num_steps=6, log_every=2,
                            ckpt_every=6))
    _, cont, _ = train(cfg, ds)                       # continuous 0→6
    _, half, _ = train(cfg, ds, num_steps=3)          # 0→3
    logged = []
    _, resumed, _ = train(cfg, ds, num_steps=6, state=half,
                          log_fn=lambda s, m: logged.append(s))
    assert int(resumed.step) == 6
    # boundaries fire on the resumed leg (start_step=3 forces k=1 here)
    assert logged == [4, 6]
    for a, b in zip(_jax.tree.leaves(cont.params),
                    _jax.tree.leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dispatch_plan_keeps_production_k_after_odd_resume():
    """Resume from an arbitrary step (e.g. a corrupt-latest fallback to an
    odd step) must keep the production K: one alignment dispatch, then
    full-K dispatches (round 2 degraded to k=1 for the whole rest of the
    run when k ∤ start_step)."""
    from musicvae_tpu.train.trainer import dispatch_sizes, pick_k

    cfg = tiny(C1_CONV_BAR, log_every=100, ckpt_every=1000)
    k = pick_k(cfg, do_eval=False)
    assert k == 100
    sizes = dispatch_sizes(437, 1000, k)
    assert sizes == [63, 100, 100, 100, 100, 100]
    # aligned resume and fresh start degenerate to plain K dispatches
    assert dispatch_sizes(0, 300, 100) == [100, 100, 100]
    assert dispatch_sizes(200, 500, 100) == [100, 100, 100]
    # a total that is not a K multiple ends with a partial dispatch
    assert dispatch_sizes(0, 250, 100) == [100, 100, 50]
    assert dispatch_sizes(5, 5, 100) == []


def test_id_schedule_is_seekable_and_epoch_complete():
    """The window-id schedule is a pure function of (seed, step): seeking
    to step S draws what a continuous run would (O(1) resume), and each
    epoch's steps cover a permutation (shuffled-epoch semantics)."""
    from musicvae_tpu.train.trainer import make_id_schedule

    n, b = 23, 4
    sched = make_id_schedule(seed=7, n=n, b=b)
    cont = [sched(s) for s in range(12)]
    # seek: a fresh schedule instance at an arbitrary step matches
    fresh = make_id_schedule(seed=7, n=n, b=b)
    np.testing.assert_array_equal(fresh(9), cont[9])
    np.testing.assert_array_equal(fresh(3), cont[3])   # backward seek too
    # epoch completeness: steps 0..bpe-1 draw bpe*b distinct ids
    bpe = n // b
    epoch_ids = np.concatenate(cont[:bpe])
    assert len(set(epoch_ids.tolist())) == bpe * b
    # different epochs use different permutations
    assert not all(np.array_equal(a, b_) for a, b_ in
                   zip(cont[:bpe], cont[bpe:2 * bpe]))
    # a different seed gives a different schedule
    other = make_id_schedule(seed=8, n=n, b=b)
    assert not np.array_equal(other(0), cont[0])
    # corpora smaller than a batch sample with replacement, per-step seeded
    small = make_id_schedule(seed=7, n=3, b=8)
    np.testing.assert_array_equal(small(5),
                                  make_id_schedule(7, 3, 8)(5))
    assert small(5).shape == (8,) and small(5).max() < 3


def test_resume_from_odd_step_matches_continuous(ds):
    """End-to-end: resuming from a step that is NOT a multiple of the
    cadence gcd still hits every later boundary and reproduces the
    continuous run's params exactly (alignment dispatch + stateless
    schedule)."""
    import jax as _jax

    from musicvae_tpu.train import train

    cfg = cpu_friendly(tiny(C1_CONV_BAR, num_steps=8, log_every=2,
                            ckpt_every=8))
    _, cont, _ = train(cfg, ds)                       # continuous 0→8
    _, odd, _ = train(cfg, ds, num_steps=3)           # 0→3 (odd stop)
    logged = []
    _, resumed, _ = train(cfg, ds, num_steps=8, state=odd,
                          log_fn=lambda s, m: logged.append(s))
    assert int(resumed.step) == 8
    assert logged == [4, 6, 8], "boundaries after an odd resume"
    for a, b in zip(_jax.tree.leaves(cont.params),
                    _jax.tree.leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_best_sidecar_write_is_atomic(tmp_path, monkeypatch):
    """A crash mid-sidecar-write must leave the previous sidecar intact
    (tmp + os.replace): the reader would otherwise treat truncated JSON as
    'no sidecar', reset best to +inf, and let a worse state overwrite the
    best checkpoint — the exact failure the sidecar exists to prevent."""
    import json
    import os

    from musicvae_tpu.train.trainer import _write_json_atomic

    path = str(tmp_path / "best_metric.json")
    _write_json_atomic(path, {"eval_loss": 1.0, "step": 10})
    assert json.load(open(path)) == {"eval_loss": 1.0, "step": 10}

    # crash INSIDE the replace: the target must still hold the old value
    def boom(src, dst):
        raise OSError("crash during replace")

    monkeypatch.setattr(os, "replace", boom)
    with pytest.raises(OSError):
        _write_json_atomic(path, {"eval_loss": 0.5, "step": 20})
    monkeypatch.undo()
    assert json.load(open(path)) == {"eval_loss": 1.0, "step": 10}, \
        "interrupted write corrupted the sidecar"


def test_weighted_eval_matches_exact_subset(ds):
    """make_eval_fn's weights: a padded batch with zero-weight pads must
    score exactly what an unpadded batch of only the real examples scores
    (the unbiased-tail mechanism behind cmd_eval)."""
    import jax

    from musicvae_tpu.train import create_state
    from musicvae_tpu.utils.metrics import make_eval_fn

    cfg = cpu_friendly(tiny(C1_CONV_BAR))
    model, state = create_state(cfg)
    eval_fn = make_eval_fn(cfg, model)

    n_real, b = 5, 8
    idx_real = np.arange(n_real, dtype=np.int32)
    idx_pad = np.resize(idx_real, b)            # wrap-padded to batch
    w = np.zeros(b, np.float32)
    w[:n_real] = 1.0
    key = jax.random.key(0)
    m_pad = jax.device_get(eval_fn(state.params, ds.batch(idx_pad), key,
                                   weights=jax.numpy.asarray(w)))
    for k in ("loss", "recon", "kl", "precision", "recall", "f1"):
        assert np.isfinite(m_pad[k])
    # zero-weight rows must drop out COMPLETELY: swapping the pad rows'
    # content for different windows cannot change any weighted metric
    # (an unweighted mean over the padded batch would shift — that was
    # the bias being fixed)
    idx_pad2 = np.concatenate([idx_real, np.zeros(b - n_real, np.int32)])
    m_pad2 = jax.device_get(eval_fn(state.params, ds.batch(idx_pad2), key,
                                    weights=jax.numpy.asarray(w)))
    for k in ("precision", "recall", "f1", "recon", "kl", "loss"):
        np.testing.assert_allclose(m_pad[k], m_pad2[k], rtol=1e-5,
                                   err_msg=k)
    # and the unweighted mean over the same padded batch IS different
    # (sanity that the scenario actually exercises the bias)
    m_plain = jax.device_get(eval_fn(state.params, ds.batch(idx_pad), key))
    assert not np.allclose(m_plain["recon"], m_pad["recon"], rtol=1e-6)


def test_streaming_rejects_non_binary_rolls(ds):
    """Bit-packing would silently collapse non-binary values to 1; the
    producer must reject them instead (round-1 shipped x unchanged)."""
    import numpy as np
    import pytest as _pytest

    from musicvae_tpu.train import train

    cfg = cpu_friendly(tiny(C1_CONV_BAR, num_steps=4, log_every=2,
                            ckpt_every=4))

    def soft_iter():
        while True:
            yield {"x": np.full((cfg.train.batch_size, 1, 96, 128), 0.5,
                                np.float32)}

    with _pytest.raises(ValueError, match="binary"):
        train(cfg, soft_iter())


def test_pick_k_treats_nonpositive_cadences_as_off():
    """log/ckpt cadences of 0 mean 'off' (matching eval_every): they don't
    constrain k and the train loop must not crash on `step % 0` (review
    finding: the new --log-every/--ckpt-every 0 flags died mid-run)."""
    from musicvae_tpu.train.trainer import pick_k

    assert pick_k(tiny(C1_CONV_BAR, log_every=0, ckpt_every=0),
                  do_eval=False) == 100
    assert pick_k(tiny(C1_CONV_BAR, log_every=0, ckpt_every=30),
                  do_eval=False) == 30
    assert pick_k(tiny(C1_CONV_BAR, log_every=40, ckpt_every=0),
                  do_eval=False) == 40
    cfg = tiny(C1_CONV_BAR, log_every=0, ckpt_every=0, eval_every=60)
    assert pick_k(cfg, do_eval=True) == 60


def test_train_runs_with_all_cadences_off(ds, tmp_path):
    """num_steps with log/ckpt cadence 0: no crash, no periodic saves, and
    a preemption stop still checkpoints the interrupted step."""
    from musicvae_tpu import checkpoints
    from musicvae_tpu.train import GracefulStop, train

    cfg = cpu_friendly(tiny(C1_CONV_BAR, num_steps=6, log_every=0,
                            ckpt_every=0))
    manager = checkpoints.make_manager(str(tmp_path / "c"), 2)
    logged = []
    _, state, _ = train(cfg, ds, ckpt_manager=manager,
                        log_fn=lambda s, m: logged.append(s))
    manager.wait_until_finished()
    assert int(state.step) == 6
    assert logged == []                       # log cadence off
    assert manager.all_steps() == []          # periodic saves off

    stop = GracefulStop()
    stop.requested = True
    _, state, _ = train(cfg, ds, ckpt_manager=manager, stop=stop)
    manager.wait_until_finished()
    # stopped after the first dispatch, and ckpt_every=0 still saved it
    assert int(state.step) in manager.all_steps()
