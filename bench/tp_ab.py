"""TP demonstration-axis A/B: measure what model-axis sharding actually
does to training throughput (VERDICT r3 weak #5 — "TP's value is
asserted, never measured").

Only one real chip is available (SURVEY §7.0), so the measurement runs on
the fake 8-device CPU mesh (the same backend the TP correctness tests
use): DP8 (data=8, model=1) vs DP4xTP2 (data=4, model=2) on the C3
hierarchical model — the config whose decoder TP was built for. CPU
compute/communication ratios differ from a v5e slice's, so treat the
number as directional; the structural conclusion it supports does not
depend on backend: these models are a few M params, every TP-sharded
matmul is already far below MXU tile size when split, and the inserted
collectives are pure overhead at this scale. TP here is a demonstration
of the sharding machinery (correct by test), not a speedup.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench/tp_ab.py [--steps 30] [--batch 32]

Prints one JSON line with both steps/s and their ratio.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(cfg, steps: int) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from musicvae_tpu.parallel import (make_mesh, replicated, shard_batch,
                                       shard_params)
    from musicvae_tpu.train import (TrainState, create_state, make_optimizer,
                                    make_train_step)

    mesh = make_mesh(cfg.mesh)
    model, st = create_state(cfg)
    opt = make_optimizer(cfg)
    if cfg.mesh.model > 1:
        params = shard_params(st.params, mesh)
    else:
        params = jax.device_put(st.params, replicated(mesh))
    st = TrainState(params=params, opt_state=opt.init(params),
                    step=jax.device_put(st.step, replicated(mesh)),
                    rng=jax.device_put(st.rng, replicated(mesh)))
    step_fn = make_train_step(cfg, model, opt=opt, use_pallas=False)
    b = cfg.train.batch_size
    batch = shard_batch(
        {"x": (jax.random.uniform(
            jax.random.key(0), (b, cfg.model.num_bars, 96, 128)) < 0.08
            ).astype(jnp.float32)}, mesh)
    st, m = step_fn(st, batch)          # compile + warmup
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        st, m = step_fn(st, batch)
    assert bool(np.isfinite(float(m["loss"])))
    return steps / (time.perf_counter() - t0)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args()

    import dataclasses

    import jax

    from musicvae_tpu.config import C3_HIER_16BAR, MeshSpec

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= 8, "need the fake 8-device mesh"
    base = C3_HIER_16BAR.replace(
        train=dataclasses.replace(C3_HIER_16BAR.train,
                                  batch_size=args.batch),
        model=dataclasses.replace(C3_HIER_16BAR.model, dtype="float32"))

    dp8 = bench(base.replace(mesh=MeshSpec(data=8, model=1)), args.steps)
    log(f"DP8 (data=8, model=1): {dp8:.2f} steps/s")
    tp2 = bench(base.replace(mesh=MeshSpec(data=4, model=2)), args.steps)
    log(f"DP4xTP2 (data=4, model=2): {tp2:.2f} steps/s")
    print(json.dumps({
        "config": "c3_hier_16bar", "backend": "cpu-fake-8dev",
        "batch": args.batch, "steps": args.steps,
        "dp8_steps_per_sec": round(dp8, 2),
        "dp4_tp2_steps_per_sec": round(tp2, 2),
        "tp2_vs_dp8": round(tp2 / dp8, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
