"""Multi-host data path (SURVEY §2.2 'Communication backend' row): the
PRODUCTION train loop on a mesh that spans processes must match the same
mesh on one process. 2 subprocesses x 4 fake CPU devices == 8 global
devices, coordinated via jax.distributed on localhost (SURVEY §4.4's
fake-backend answer scaled to real process boundaries).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "mp_train_worker.py")
REPO = os.path.abspath(os.path.join(HERE, os.pardir))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    # a clean slate: the worker sets its own device count; the axon site
    # dir must stay importable but the TPU must not be selected
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (REPO, env.get("PYTHONPATH", "")) if p)
    return env


def _run(num_procs: int, coordinator: str, mode: str = "resident"):
    procs = [subprocess.Popen(
        [sys.executable, WORKER, coordinator, str(num_procs), str(i), mode],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=_worker_env(),
        cwd=REPO) for i in range(num_procs)]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode(errors="replace")[-3000:]
        # the CPU collective backend (Gloo) chats on stdout; take the
        # last line that parses as the worker's JSON result
        parsed = None
        for line in out.decode().strip().splitlines():
            try:
                parsed = json.loads(line)
            except json.JSONDecodeError:
                continue
        assert parsed is not None, out.decode()[-2000:]
        results.append(parsed)
    return results


@pytest.mark.slow
def test_two_process_train_matches_single_process():
    port = _free_port()
    two = _run(2, f"127.0.0.1:{port}")
    one = _run(1, "unused")[0]

    # both processes observe the identical replicated result
    assert two[0]["step"] == two[1]["step"] == one["step"] == 6
    np.testing.assert_allclose(two[0]["loss"], two[1]["loss"], rtol=0)
    np.testing.assert_allclose(two[0]["param_sum"], two[1]["param_sum"],
                               rtol=0)
    # and the process boundary changes nothing: same global mesh, same
    # data, same arithmetic (CPU collectives are deterministic; tolerance
    # covers reduction-order differences across runtime paths)
    np.testing.assert_allclose(two[0]["loss"], one["loss"], rtol=1e-5)
    np.testing.assert_allclose(two[0]["param_sum"], one["param_sum"],
                               rtol=1e-6)


@pytest.mark.slow
def test_two_process_dp_tp_matches_single_process():
    """DP×TP on a (2,4) mesh SPANNING processes: the model axis crosses
    the process boundary, so every TP param placement goes through
    shard_params' put_global path (plain device_put rejects
    non-addressable devices — the round-2 structural gap). Must match the
    same mesh on one process."""
    port = _free_port()
    two = _run(2, f"127.0.0.1:{port}", mode="tp")
    one = _run(1, "unused", mode="tp")[0]
    assert two[0]["step"] == two[1]["step"] == one["step"] == 6
    np.testing.assert_allclose(two[0]["param_sum"], two[1]["param_sum"],
                               rtol=0)
    np.testing.assert_allclose(two[0]["loss"], one["loss"], rtol=1e-5)
    np.testing.assert_allclose(two[0]["param_sum"], one["param_sum"],
                               rtol=1e-5)


@pytest.mark.slow
def test_two_process_streaming_matches_single_process():
    """The STREAMING (iterator) path on a process-spanning mesh: every
    host's identically-seeded iterator feeds put_tree, the first-stack
    hash guard passes, and the result matches one process."""
    port = _free_port()
    two = _run(2, f"127.0.0.1:{port}", mode="streaming")
    one = _run(1, "unused", mode="streaming")[0]
    assert two[0]["step"] == two[1]["step"] == one["step"] == 6
    np.testing.assert_allclose(two[0]["loss"], two[1]["loss"], rtol=0)
    np.testing.assert_allclose(two[0]["loss"], one["loss"], rtol=1e-5)
    np.testing.assert_allclose(two[0]["param_sum"], one["param_sum"],
                               rtol=1e-6)


@pytest.mark.slow
def test_two_process_host_sharded_matches_single_process():
    """PER-HOST SHARDED data loading: each process holds only its
    host_shard of the corpus and streams batch/2-row local slices
    (HostLocalBatches → put_host_local assembles the global batch from
    process-local pieces). The 1-process baseline emulates the same two
    shards and concatenates their draws, so the global batch sequence is
    identical by construction — loss/params must match across the real
    process boundary. Closes the round-2 'every host must hold the FULL
    corpus' caveat."""
    port = _free_port()
    two = _run(2, f"127.0.0.1:{port}", mode="host_sharded")
    one = _run(1, "unused", mode="host_sharded")[0]
    assert two[0]["step"] == two[1]["step"] == one["step"] == 6
    np.testing.assert_allclose(two[0]["loss"], two[1]["loss"], rtol=0)
    np.testing.assert_allclose(two[0]["loss"], one["loss"], rtol=1e-5)
    np.testing.assert_allclose(two[0]["param_sum"], one["param_sum"],
                               rtol=1e-6)


@pytest.mark.slow
def test_desynced_host_data_fails_fast():
    """A host whose corpus silently diverges (one flipped cell) must be
    caught by the startup cross-process hash guard on EVERY process —
    not train on divergent shards (round-2 weak #3: the put_global
    contract was unchecked at runtime).

    One retry: under full-suite CPU load the 2-process jax.distributed
    startup can time out (observed once in ~10 suite runs); a real guard
    regression fails deterministically on both attempts."""
    try:
        res = _run(2, f"127.0.0.1:{_free_port()}", mode="desync")
    except (AssertionError, subprocess.TimeoutExpired):
        res = _run(2, f"127.0.0.1:{_free_port()}", mode="desync")
    assert all(r["desync_caught"] for r in res), res


@pytest.mark.slow
def test_two_process_preemption_stops_collectively():
    """A preemption signal delivered to ONLY one host (worker proc 1 has
    its GracefulStop flag set; proc 0 does not) must stop BOTH processes
    at the same dispatch edge via the per-dispatch collective decision,
    and both must enter the collective checkpoint save together — a
    one-sided stop would wedge the job in mismatched collectives.

    One retry for the known under-load jax.distributed startup timeout
    (see test_desynced_host_data_fails_fast)."""
    try:
        res = _run(2, f"127.0.0.1:{_free_port()}", mode="preempt")
    except (AssertionError, subprocess.TimeoutExpired):
        res = _run(2, f"127.0.0.1:{_free_port()}", mode="preempt")
    # k = gcd(log_every=2, ckpt_every=6) = 2: both stop after dispatch 1
    assert res[0]["step"] == res[1]["step"] == 2, res
    # the interrupted (non-cadence) step was checkpointed, seen by both
    assert res[0]["saved_steps"] == res[1]["saved_steps"] == [2], res
    np.testing.assert_allclose(res[0]["loss"], res[1]["loss"], rtol=0)
