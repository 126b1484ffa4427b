"""Worker for the 2-process CPU equivalence test (tests/test_multiprocess.py).

Each process gets 4 fake CPU devices (8 global), joins the coordination
service, and runs the PRODUCTION resident train loop over the (8, 1) mesh.
The dataset, initial state, and per-step window-id draws are deterministic
in the config seed, so every process computes identical host values and
parallel/mesh.put_global uploads only its own shards — the multi-host data
path under test. Prints one JSON line with the final loss and a param
checksum for the parent to compare across processes and against the
single-process baseline.

Usage: python mp_train_worker.py <coordinator> <num_procs> <proc_id>
(also runnable with num_procs=1 for the single-process baseline).
"""

import json
import os
import sys


def main() -> int:
    coordinator, num_procs, proc_id = (sys.argv[1], int(sys.argv[2]),
                                       int(sys.argv[3]))
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

    cfg = C2_GRU_4BAR.replace(
        model=dataclasses.replace(
            C2_GRU_4BAR.model, enc_channels=(4, 8, 8, 8, 8),
            dec_channels=(8, 8, 8, 8, 8), z_dim=16, gru_hidden=32,
            bar_feat_dim=32, dtype="float32"),
        train=dataclasses.replace(
            C2_GRU_4BAR.train, batch_size=16, num_steps=6, log_every=2,
            ckpt_every=6, learning_rate=1e-3),
        mesh=MeshSpec(data=8, model=1))
    ds = PianoRollDataset.from_corpus(
        synth_corpus(num_pieces=4, n_bars=8, seed=0), cfg.midi,
        cfg.model.num_bars)
    mesh = make_mesh(cfg.mesh)
    assert mesh.devices.size == 8

    _, state, metrics = train(cfg, ds, mesh=mesh)
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
