"""Checkpoint/resume tests (SURVEY §5.4): Orbax roundtrip, config JSON
roundtrip, and exact resume (restored training continues bit-identically).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import cpu_friendly
from musicvae_tpu import checkpoints
from musicvae_tpu.config import C1_CONV_BAR, C2_GRU_4BAR, Config
from musicvae_tpu.train import create_state, make_train_step


def tiny(cfg):
    m = dataclasses.replace(cfg.model, enc_channels=(4, 8, 8, 8, 8),
                            dec_channels=(8, 8, 8, 8, 8), z_dim=16,
                            gru_hidden=32, bar_feat_dim=32, dtype="float32")
    t = dataclasses.replace(cfg.train, batch_size=4)
    return cpu_friendly(cfg.replace(model=m, train=t))


def _batch(cfg, seed=0):
    rng = np.random.default_rng(seed)
    return {"x": (rng.random((cfg.train.batch_size, cfg.model.num_bars,
                              96, 128)) < 0.05).astype(np.float32)}


def test_config_json_roundtrip():
    from musicvae_tpu.config import all_config_names, get_config
    for name in all_config_names():        # incl. c2_mxu's tuple patch_size
        cfg = get_config(name)
        back = checkpoints.config_from_json(checkpoints.config_to_json(cfg))
        assert back == cfg
    # pre-round-4 checkpoint JSON (no stem/patch_size/max_events/
    # ignore_time_signature keys) still restores with the defaults
    import json
    d = json.loads(checkpoints.config_to_json(C1_CONV_BAR))
    for k in ("stem", "patch_size"):
        d["model"].pop(k)
    for k in ("max_events", "ignore_time_signature"):
        d["midi"].pop(k)
    assert checkpoints.config_from_json(json.dumps(d)) == C1_CONV_BAR


def test_save_restore_roundtrip(tmp_path):
    cfg = tiny(C1_CONV_BAR)
    model, state = create_state(cfg)
    step = make_train_step(cfg, model, use_pallas=False)
    state, _ = step(state, _batch(cfg))

    mgr = checkpoints.make_manager(str(tmp_path / "ckpt"), keep=2)
    checkpoints.save(mgr, state, cfg, wait=True)
    assert mgr.latest_step() == 1

    _, template = create_state(cfg)
    restored, cfg_back = checkpoints.restore(mgr, template)
    assert cfg_back == cfg
    for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(a, b)
    assert int(restored.step) == 1


def test_resume_is_exact(tmp_path):
    """save@5 → restore → 5 more steps == 10 continuous steps, bit-exact
    (params, opt state, step counter, PRNG chain all in the checkpoint)."""
    cfg = tiny(C2_GRU_4BAR)
    model, s_cont = create_state(cfg)
    step = make_train_step(cfg, model, use_pallas=False)
    batch = _batch(cfg)

    # continuous run: 10 steps
    for _ in range(10):
        s_cont, _ = step(s_cont, batch)

    # interrupted run (fresh state — the step donates its input buffers,
    # and create_state is deterministic in cfg.train.seed): 5 steps,
    # checkpoint, restore, 5 more
    _, s_a = create_state(cfg)
    for _ in range(5):
        s_a, _ = step(s_a, batch)
    mgr = checkpoints.make_manager(str(tmp_path / "ckpt"))
    checkpoints.save(mgr, s_a, cfg, wait=True)
    _, template = create_state(cfg)
    s_b, _ = checkpoints.restore(mgr, template)
    for _ in range(5):
        s_b, _ = step(s_b, batch)

    assert int(s_b.step) == int(s_cont.step) == 10
    for a, b in zip(jax.tree.leaves(jax.device_get(s_cont.params)),
                    jax.tree.leaves(jax.device_get(s_b.params))):
        np.testing.assert_array_equal(a, b)


def test_bf16_adam_mu_trains_and_resumes_exactly(tmp_path):
    """TrainSpec.adam_mu_dtype="bfloat16" (round-5 optimizer-traffic
    lever): the first-moment buffer really is bf16, training steps move
    the loss, and checkpoint resume stays bit-exact (Orbax round-trips
    the bf16 leaves)."""
    cfg = tiny(C1_CONV_BAR)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                adam_mu_dtype="bfloat16"))
    model, s_cont = create_state(cfg)
    mu = s_cont.opt_state[0][0].mu
    assert {l.dtype for l in jax.tree.leaves(mu)} == \
        {jnp.dtype(jnp.bfloat16)}
    step = make_train_step(cfg, model, use_pallas=False)
    batch = _batch(cfg)
    losses = []
    for _ in range(6):
        s_cont, m = step(s_cont, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]

    _, s_a = create_state(cfg)
    for _ in range(3):
        s_a, _ = step(s_a, batch)
    mgr = checkpoints.make_manager(str(tmp_path / "ckpt"))
    checkpoints.save(mgr, s_a, cfg, wait=True)
    _, template = create_state(cfg)
    s_b, cfg_back = checkpoints.restore(mgr, template)
    assert cfg_back.train.adam_mu_dtype == "bfloat16"
    for _ in range(3):
        s_b, _ = step(s_b, batch)
    assert int(s_b.step) == int(s_cont.step) == 6
    for a, b in zip(jax.tree.leaves(jax.device_get(s_cont.params)),
                    jax.tree.leaves(jax.device_get(s_b.params))):
        np.testing.assert_array_equal(a, b)


def test_keep_n_retention(tmp_path):
    cfg = tiny(C1_CONV_BAR)
    model, state = create_state(cfg)
    step = make_train_step(cfg, model, use_pallas=False)
    mgr = checkpoints.make_manager(str(tmp_path / "ckpt"), keep=2)
    for _ in range(4):
        state, _ = step(state, _batch(cfg))
        checkpoints.save(mgr, state, cfg, wait=True)
    assert mgr.all_steps() == [3, 4]


def _two_step_run(tmp_path, cfg):
    """Train 2 steps saving after each; returns (manager_dir, states)."""
    model, state = create_state(cfg)
    step = make_train_step(cfg, model, use_pallas=False)
    mgr = checkpoints.make_manager(str(tmp_path / "ckpt"), keep=3)
    states = []
    for _ in range(2):
        state, _ = step(state, _batch(cfg))
        checkpoints.save(mgr, state, cfg, wait=True)
        states.append(jax.device_get(state))
    return str(tmp_path / "ckpt"), states


def test_fault_injection_interrupted_save(tmp_path):
    """Crash mid-async-save (SURVEY §5.3): Orbax's atomicity is
    write-to-tmp-then-rename, so an interrupted save leaves a
    '<step>.orbax-checkpoint-tmp-*' dir. A fresh manager must fall back to
    the last COMPLETE step, restore it exactly, and keep working."""
    import os

    cfg = tiny(C1_CONV_BAR)
    ckpt_dir, states = _two_step_run(tmp_path, cfg)
    # simulate the crash: step 2's final rename never happened
    os.rename(os.path.join(ckpt_dir, "2"),
              os.path.join(ckpt_dir, "2.orbax-checkpoint-tmp-999"))

    mgr = checkpoints.make_manager(ckpt_dir, keep=3)
    assert mgr.all_steps() == [1]
    assert mgr.latest_step() == 1
    _, template = create_state(cfg)
    restored, _ = checkpoints.restore(mgr, template)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(states[0].params),
                    jax.tree.leaves(jax.device_get(restored.params))):
        np.testing.assert_array_equal(a, b)
    # the manager still accepts new saves after the stale tmp dir
    checkpoints.save(mgr, restored.replace(step=restored.step + 1),
                     cfg, wait=True)
    assert checkpoints.make_manager(ckpt_dir).latest_step() == 2


def test_restore_falls_back_on_corrupt_latest(tmp_path):
    """A step that committed its marker but lost its payload (disk damage)
    must not brick resume: restore() skips it with a warning and loads the
    next-newest complete step. An explicit step stays strict."""
    import shutil

    cfg = tiny(C1_CONV_BAR)
    ckpt_dir, states = _two_step_run(tmp_path, cfg)
    shutil.rmtree(f"{ckpt_dir}/2/state")   # payload gone, marker intact

    mgr = checkpoints.make_manager(ckpt_dir, keep=3)
    assert mgr.latest_step() == 2          # orbax still lists it...
    _, template = create_state(cfg)
    restored, _ = checkpoints.restore(mgr, template)   # ...we fall back
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(states[0].params),
                    jax.tree.leaves(jax.device_get(restored.params))):
        np.testing.assert_array_equal(a, b)
    with pytest.raises(Exception):
        checkpoints.restore(mgr, template, step=2)     # explicit = strict


def test_restore_missing_raises(tmp_path):
    cfg = tiny(C1_CONV_BAR)
    _, template = create_state(cfg)
    mgr = checkpoints.make_manager(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        checkpoints.restore(mgr, template)


def test_corrupt_step_quarantined_so_resave_persists(tmp_path):
    """After a corrupt-latest fallback the damaged step must be
    DEREGISTERED: Orbax refuses saves at steps <= latest_step, so leaving
    it listed would silently drop every re-save of the re-trained steps
    (review finding, repro'd: re-save returned without writing and the
    next restore fell back again — losing the same work every cycle).
    Deregistration is a QUARANTINE rename, not a delete: the payload stays
    on disk for manual recovery (advisor finding: a transient failure is
    indistinguishable from corruption at the moment of deletion)."""
    import os
    import shutil

    cfg = tiny(C1_CONV_BAR)
    ckpt_dir, states = _two_step_run(tmp_path, cfg)
    shutil.rmtree(f"{ckpt_dir}/2/state")

    mgr = checkpoints.make_manager(ckpt_dir, keep=3)
    _, template = create_state(cfg)
    restored, rcfg = checkpoints.restore(mgr, template)
    assert int(restored.step) == 1
    assert 2 not in mgr.all_steps(), "corrupt step still registered"
    # quarantined, not destroyed: the surviving payload is still on disk
    assert os.path.isdir(f"{ckpt_dir}/2.corrupt")
    assert os.path.isdir(f"{ckpt_dir}/2.corrupt/config")

    # re-train to step 2 (simulated) and save again: must actually persist
    resaved = restored.replace(step=jnp.asarray(2, jnp.int32))
    checkpoints.save(mgr, resaved, rcfg, wait=True)
    mgr2 = checkpoints.make_manager(ckpt_dir, keep=3)
    re2, _ = checkpoints.restore(mgr2, template)
    assert int(re2.step) == 2, "re-save after fallback was dropped"


def test_transient_restore_failure_retries_without_fallback(tmp_path):
    """One failed restore attempt on a HEALTHY latest step (transient
    network/FS hiccup) must not sideline it: restore() retries the step
    once before falling back (advisor finding: a single transient failure
    used to permanently delete the newest checkpoint)."""
    import os

    cfg = tiny(C1_CONV_BAR)
    ckpt_dir, states = _two_step_run(tmp_path, cfg)

    mgr = checkpoints.make_manager(ckpt_dir, keep=3)
    real_restore = mgr.restore
    calls = {"n": 0}

    def flaky_restore(step, *a, **kw):
        calls["n"] += 1
        if step == 2 and calls["n"] == 1:
            raise OSError("transient: connection reset")
        return real_restore(step, *a, **kw)

    mgr.restore = flaky_restore
    _, template = create_state(cfg)
    restored, _ = checkpoints.restore(mgr, template)
    assert int(restored.step) == 2, "retry must recover the healthy latest"
    assert sorted(mgr.all_steps()) == [1, 2]
    assert not os.path.exists(f"{ckpt_dir}/2.corrupt"), \
        "healthy step must not be quarantined"


def test_wrong_template_does_not_delete_checkpoints(tmp_path):
    """A restore that fails for EVERY step (e.g. the caller's template has
    the wrong shapes) must not delete anything: deletion is only safe
    after a successful restore with the same template proves the failed
    steps were genuinely damaged (review finding: delete-on-any-exception
    cascaded into erasing all checkpoints on a user config mistake)."""
    cfg = tiny(C1_CONV_BAR)
    ckpt_dir, _ = _two_step_run(tmp_path, cfg)

    wrong_cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, z_dim=cfg.model.z_dim * 2))
    _, wrong_template = create_state(wrong_cfg)
    mgr = checkpoints.make_manager(ckpt_dir, keep=3)
    with pytest.raises(RuntimeError, match="failed to restore"):
        checkpoints.restore(mgr, wrong_template)
    assert sorted(mgr.all_steps()) == [1, 2], \
        "template mismatch must not delete checkpoints"
    # the right template still restores normally afterwards
    _, template = create_state(cfg)
    ok, _ = checkpoints.restore(mgr, template)
    assert int(ok.step) == 2


def test_restore_config_falls_back_on_corrupt_latest(tmp_path):
    """eval/generate/serve read the config via restore_config; it must
    survive a damaged latest step the same way restore() does."""
    import shutil

    cfg = tiny(C1_CONV_BAR)
    ckpt_dir, _ = _two_step_run(tmp_path, cfg)
    shutil.rmtree(f"{ckpt_dir}/2/config")

    mgr = checkpoints.make_manager(ckpt_dir, keep=3)
    got = checkpoints.restore_config(mgr)      # falls back to step 1
    assert got.name == cfg.name
    with pytest.raises(Exception):
        checkpoints.restore_config(mgr, step=2)   # explicit stays strict
