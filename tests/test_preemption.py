"""Graceful preemption (SURVEY §5.3): SIGTERM/SIGINT → finish the
in-flight dispatch, checkpoint the exact interrupted step, exit cleanly,
resume from that step.
"""

import dataclasses
import os
import signal
import subprocess
import sys
import time

import pytest

from conftest import cpu_friendly
from musicvae_tpu.config import C1_CONV_BAR
from musicvae_tpu.data import PianoRollDataset, synth_corpus

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, os.pardir))


def tiny(cfg, **train_kw):
    model = dataclasses.replace(
        cfg.model, enc_channels=(4, 8, 8, 8, 8), dec_channels=(8, 8, 8, 8, 8),
        z_dim=16, gru_hidden=32, bar_feat_dim=32, dtype="float32")
    train = dataclasses.replace(cfg.train, batch_size=8, **train_kw)
    return cfg.replace(model=model, train=train)


def test_graceful_stop_flag_and_escalation():
    from musicvae_tpu.train import GracefulStop

    prev_term = signal.getsignal(signal.SIGTERM)
    with GracefulStop() as stop:
        assert not stop.requested
        assert signal.getsignal(signal.SIGTERM) == stop._handle
        os.kill(os.getpid(), signal.SIGTERM)
        # delivery is synchronous for a signal sent to the own process on
        # the main thread, but give the interpreter a bytecode boundary
        for _ in range(100):
            if stop.requested:
                break
            time.sleep(0.01)
        assert stop.requested
        # escalation armed: the ORIGINAL handler is back, so a second
        # SIGTERM would behave as if the guard were never installed
        assert signal.getsignal(signal.SIGTERM) == prev_term
    assert signal.getsignal(signal.SIGTERM) == prev_term
    # SIGINT was untouched by the TERM delivery and restored on exit
    assert signal.getsignal(signal.SIGINT) is not None


def test_train_stops_at_dispatch_edge_and_resumes(tmp_path):
    """A set stop flag halts train() after the current dispatch with a
    checkpoint at that exact (non-cadence) step; a resumed run completes
    to num_steps."""
    from musicvae_tpu import checkpoints
    from musicvae_tpu.train import GracefulStop, create_state, train
    from musicvae_tpu.train.trainer import pick_k

    cfg = cpu_friendly(tiny(C1_CONV_BAR, num_steps=40, log_every=10,
                            ckpt_every=40))
    ds = PianoRollDataset.from_corpus(
        synth_corpus(num_pieces=2, n_bars=8, seed=0), cfg.midi, 1)
    manager = checkpoints.make_manager(str(tmp_path / "ckpt"), 2)

    stop = GracefulStop()          # no signals installed: flag driven
    stop.requested = True          # "signal arrived before the loop"
    _, state, _ = train(cfg, ds, ckpt_manager=manager, stop=stop)
    manager.wait_until_finished()

    k = pick_k(cfg, do_eval=False)
    assert int(state.step) == k            # stopped after ONE dispatch
    assert k != 0 and k % cfg.train.ckpt_every != 0
    assert k in manager.all_steps()        # non-cadence step checkpointed

    # resume to completion from the preemption checkpoint
    _, template = create_state(cfg)
    restored, rcfg = checkpoints.restore(manager, template)
    _, state2, _ = train(rcfg, ds, state=restored)
    assert int(state2.step) == cfg.train.num_steps


@pytest.mark.slow
def test_cli_train_sigterm_checkpoints_and_resumes(tmp_path):
    """End-to-end through the real CLI: SIGTERM mid-run → rc 0, a
    'preempted: checkpoint saved at step N' message, a checkpoint at N,
    and --resume continues from N."""
    data = str(tmp_path / "rolls.npz")
    PianoRollDataset.from_corpus(
        synth_corpus(num_pieces=2, n_bars=8, seed=0),
        C1_CONV_BAR.midi, 1).save_npy(data)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (REPO, env.get("PYTHONPATH", "")) if p)
    base = [sys.executable, "-u", "-m", "musicvae_tpu", "train",
            "--config", "c1_conv_bar", "--data", data,
            "--ckpt-dir", str(tmp_path / "ckpt"),
            "--log-dir", str(tmp_path / "logs"),
            # k = gcd(10, 20): short dispatches so the signal lands fast
            "--log-every", "10", "--ckpt-every", "20"]

    proc = subprocess.Popen(base + ["--steps", "1000000"],
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            env=env, cwd=REPO, text=True)
    try:
        # wait for the first logged dispatch, then preempt
        deadline = time.time() + 420
        for line in proc.stderr:
            if line.startswith("step "):
                break
            assert time.time() < deadline, "no training progress logged"
        proc.send_signal(signal.SIGTERM)
        out, err = proc.communicate(timeout=420)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
    assert proc.returncode == 0, err[-3000:]
    marker = [ln for ln in err.splitlines()
              if ln.startswith("preempted: checkpoint saved at step ")]
    assert marker, err[-3000:]
    step = int(marker[0].split("step ")[1].split(";")[0])
    assert step > 0

    resumed = subprocess.run(
        base + ["--resume", "--steps", str(step + 20)],
        capture_output=True, env=env, cwd=REPO, text=True, timeout=420)
    assert resumed.returncode == 0, resumed.stderr[-3000:]
    assert f"resumed from step {step}" in resumed.stderr
    assert "final metrics" in resumed.stdout
