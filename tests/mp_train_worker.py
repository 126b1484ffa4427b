"""Worker for the 2-process CPU equivalence test (tests/test_multiprocess.py).

Each process gets 4 fake CPU devices (8 global), joins the coordination
service, and runs the PRODUCTION resident train loop over the (8, 1) mesh.
The dataset, initial state, and per-step window-id draws are deterministic
in the config seed, so every process computes identical host values and
parallel/mesh.put_global uploads only its own shards — the multi-host data
path under test. Prints one JSON line with the final loss and a param
checksum for the parent to compare across processes and against the
single-process baseline.

Usage: python mp_train_worker.py <coordinator> <num_procs> <proc_id> [mode]
(also runnable with num_procs=1 for the single-process baseline).

Modes (VERDICT r2 #3 — the multi-host caveats, each across REAL process
boundaries):
- resident (default): production resident indexed train loop, DP mesh.
- tp:        DP×TP — params model-axis-sharded across processes via
             shard_params' put_global path (plain device_put rejects
             non-addressable devices).
- streaming: the streaming (iterator) train path; every process serves
             the identically-seeded iterator, put_tree uploads shards.
- host_sharded: per-host SHARDED data loading — each process holds only
             its PianoRollDataset.host_shard of the corpus and streams
             batch_size/num_procs-row local slices (HostLocalBatches →
             put_host_local); no host ever materializes the global batch.
             The single-process baseline emulates the same per-shard
             draws and concatenates them, so results must match exactly.
- desync:    process 1 deliberately perturbs its local corpus; the
             startup cross-process hash guard must fail fast on EVERY
             process (prints {"desync_caught": true}).
- preempt:   ONLY process 1 has its GracefulStop flag set (a scheduler
             that signals one host); the per-dispatch collective stop
             decision must stop BOTH processes at the same dispatch edge
             and enter the collective checkpoint save together (a
             one-sided stop would wedge in mismatched collectives).
"""

import json
import os
import sys


def main() -> int:
    coordinator, num_procs, proc_id = (sys.argv[1], int(sys.argv[2]),
                                       int(sys.argv[3]))
    mode = sys.argv[4] if len(sys.argv) > 4 else "resident"
    os.environ["JAX_PLATFORMS"] = "cpu"
    per_proc = 8 // num_procs
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={per_proc}")

    import jax
    jax.config.update("jax_platforms", "cpu")
    if num_procs > 1:
        from musicvae_tpu.parallel import initialize_from_env
        initialize_from_env(coordinator=coordinator,
                            num_processes=num_procs, process_id=proc_id)
    assert len(jax.devices()) == 8, jax.devices()

    import dataclasses

    import numpy as np
    from musicvae_tpu.config import C2_GRU_4BAR, MeshSpec
    from musicvae_tpu.data import PianoRollDataset, synth_corpus
    from musicvae_tpu.parallel import make_mesh
    from musicvae_tpu.train import train

    mesh_spec = (MeshSpec(data=2, model=4) if mode == "tp"
                 else MeshSpec(data=8, model=1))
    cfg = C2_GRU_4BAR.replace(
        model=dataclasses.replace(
            C2_GRU_4BAR.model, enc_channels=(4, 8, 8, 8, 8),
            dec_channels=(8, 8, 8, 8, 8), z_dim=16, gru_hidden=32,
            bar_feat_dim=32, dtype="float32"),
        train=dataclasses.replace(
            C2_GRU_4BAR.train, batch_size=16, num_steps=6, log_every=2,
            ckpt_every=6, learning_rate=1e-3),
        mesh=mesh_spec)
    ds = PianoRollDataset.from_corpus(
        synth_corpus(num_pieces=4, n_bars=8, seed=0), cfg.midi,
        cfg.model.num_bars)
    mesh = make_mesh(cfg.mesh)
    assert mesh.devices.size == 8

    if mode == "preempt":
        import shutil
        import tempfile

        from musicvae_tpu import checkpoints
        from musicvae_tpu.train import GracefulStop

        # one SHARED dir for the collective Orbax save (same machine);
        # proc 0 cleans any previous run's leftovers, with a barrier so
        # no other process creates the manager into a dir mid-removal
        ckpt_dir = os.path.join(
            tempfile.gettempdir(),
            "mvae_mp_preempt_" + coordinator.replace(":", "_"))
        if proc_id == 0:
            shutil.rmtree(ckpt_dir, ignore_errors=True)
        if num_procs > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("mvae_preempt_cleanup")
        stop = GracefulStop()              # flag-driven, no signals
        stop.requested = proc_id == 1      # only ONE host is "signaled"
        manager = checkpoints.make_manager(ckpt_dir, keep=2)
        _, state, metrics = train(cfg, ds, mesh=mesh,
                                  ckpt_manager=manager, stop=stop)
        manager.wait_until_finished()
        print(json.dumps({
            "proc": proc_id,
            "step": int(jax.device_get(state.step)),
            "saved_steps": sorted(int(s) for s in manager.all_steps()),
            "loss": float(jax.device_get(metrics["loss"])),
        }), flush=True)
        return 0

    if mode == "desync":
        if proc_id == 1:
            ds.bars = ds.bars.copy()
            ds.bars[0, 0, 60] ^= 1    # one flipped cell on one host
        try:
            train(cfg, ds, mesh=mesh)
        except RuntimeError as e:
            assert "divergence" in str(e), e
            print(json.dumps({"proc": proc_id, "desync_caught": True}),
                  flush=True)
            return 0
        print(json.dumps({"proc": proc_id, "desync_caught": False}),
              flush=True)
        return 0

    if mode == "tp":
        # DP×TP across the process boundary: the model axis spans both
        # processes' devices, so every param shard placement exercises
        # put_global (jax.device_put would raise on non-addressable devs)
        from musicvae_tpu.parallel import (replicated, shard_batch,
                                           shard_params)
        from musicvae_tpu.parallel.mesh import put_tree
        from musicvae_tpu.train import (TrainState, create_state,
                                        make_optimizer, make_train_step)
        model, state = create_state(cfg)
        sharded = shard_params(state.params, mesh)
        opt = make_optimizer(cfg)
        state = TrainState(params=sharded, opt_state=opt.init(sharded),
                           step=put_tree(state.step, replicated(mesh)),
                           rng=put_tree(state.rng, replicated(mesh)))
        step_fn = make_train_step(cfg, model, opt=opt, use_pallas=False)
        batch = ds.batch(np.arange(cfg.train.batch_size) % len(ds))
        b = shard_batch(batch, mesh)
        metrics = None
        for _ in range(6):
            state, metrics = step_fn(state, b)
    elif mode == "streaming":
        _, state, metrics = train(
            cfg, ds.iterator(cfg.train.batch_size, seed=3), mesh=mesh)
    elif mode == "host_sharded":
        # each host loads ONLY its corpus shard and streams its own rows;
        # the 1-process baseline emulates the same 2 shards and feeds the
        # concatenation, so the global batches are identical by design
        from musicvae_tpu.data import HostLocalBatches
        n_shards = 2
        b_local = cfg.train.batch_size // n_shards
        if num_procs > 1:
            assert num_procs == n_shards
            shard = ds.host_shard(proc_id, n_shards, seed=cfg.train.seed)
            it = HostLocalBatches(shard.iterator(b_local, seed=3))
            _, state, metrics = train(cfg, it, mesh=mesh)
        else:
            its = [ds.host_shard(p, n_shards, seed=cfg.train.seed)
                     .iterator(b_local, seed=3) for p in range(n_shards)]

            def merged():
                while True:
                    parts = [next(i) for i in its]
                    yield {kk: np.concatenate([p[kk] for p in parts])
                           for kk in parts[0]}

            _, state, metrics = train(cfg, merged(), mesh=mesh)
    else:
        _, state, metrics = train(cfg, ds, mesh=mesh)

    if mode == "tp":
        # params are globally sharded across processes (not fully
        # addressable here): reduce to a replicated scalar on device
        import jax.numpy as jnp

        @jax.jit
        def _abs_sum(params):
            return sum(jnp.sum(jnp.abs(p.astype(jnp.float32)))
                       for p in jax.tree.leaves(params))

        param_sum = float(jax.device_get(_abs_sum(state.params)))
    else:
        param_sum = float(sum(
            np.abs(np.asarray(jax.device_get(p), dtype=np.float64)).sum()
            for p in jax.tree.leaves(state.params)))
    print(json.dumps({
        "proc": proc_id,
        "step": int(jax.device_get(state.step)),
        "loss": float(jax.device_get(metrics["loss"])),
        "param_sum": param_sum,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
