"""Profiling harness (SURVEY §5.1): jax.profiler traces for the train step
and the generation sweep, viewable in TensorBoard (profile plugin installed).

Usage:
    python bench/profile.py --config c2_gru_4bar --what train --out traces/
    tensorboard --logdir traces/

The reference has no tracing/profiling (SURVEY §5.1); this is the rebuild's
first-class replacement. Traces capture XLA op timelines on the real chip.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="c2_gru_4bar")
    p.add_argument("--what", choices=["train", "generate"], default="train")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--out", default="traces")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from musicvae_tpu.config import GenSpec, get_config
    from musicvae_tpu.generate import make_generate_fn
    from musicvae_tpu.train import create_state, make_train_step

    cfg = get_config(args.config)
    model, state = create_state(cfg)

    if args.what == "train":
        step = make_train_step(cfg, model)
        b = cfg.train.batch_size
        x = (jax.random.uniform(jax.random.key(0),
                                (b, cfg.model.num_bars, 96, 128)) < 0.08
             ).astype(jnp.float32)
        state, m = step(state, {"x": x})         # compile outside the trace
        float(m["loss"])
        with jax.profiler.trace(args.out):
            for _ in range(args.steps):
                state, m = step(state, {"x": x})
            float(m["loss"])
    else:
        gcfg = cfg.replace(gen=GenSpec(num_bars=16, num_samples=256,
                                       interpolate=True))
        gen = make_generate_fn(gcfg)
        bars = gen(state.params, jax.random.key(0))
        float(jnp.sum(bars))
        with jax.profiler.trace(args.out):
            for i in range(args.steps):
                bars = gen(state.params, jax.random.key(i))
            float(jnp.sum(bars))

    print(f"trace written to {args.out}/ — view with "
          f"`tensorboard --logdir {args.out}`")
    return 0


if __name__ == "__main__":
    sys.exit(main())
