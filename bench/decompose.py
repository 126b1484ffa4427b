"""Decompose the production train step's time on the real chip.

Times, for one config, each sub-program as its own jitted function (median
of --reps dispatches, host-transfer fenced per the axon rule in bench.py):

  gather      window-id gather + u8→f32 cast (the resident data path)
  encode      encoder fwd (bar feats + GRU + latent head)
  fwd         full ELBO forward (encode + teacher decode + loss)
  fwd_bwd     jax.value_and_grad of fwd
  full        fwd_bwd + adam update (== the shipped single train step)

The deltas locate the time: full−fwd_bwd = optimizer, fwd_bwd−fwd = backward,
fwd−encode = decode+loss, and gather is the data path. Used to decide where a
Pallas kernel can actually win end-to-end (VERDICT r1 item 3) rather than
guessing. Dispatch overhead is measured separately via an empty jitted fn —
on the axon tunnel it is NOT negligible, so per-piece times include it and
the honest comparison is against ``full`` measured the same way.
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _time(fn, fence, reps=30):
    """Median seconds per call of fn(); fence(out) forces completion."""
    out = fn()
    fence(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        fence(out)
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="c2_gru_4bar")
    p.add_argument("--reps", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from musicvae_tpu.config import get_config
    from musicvae_tpu.models.vae import build_model
    from musicvae_tpu.ops import losses
    from musicvae_tpu.midi.tensorize import pitch_mask
    from musicvae_tpu.train import create_state, make_train_step_indexed
    from musicvae_tpu.train.trainer import (_make_window_gather,
                                            elbo_from_outputs, make_optimizer)

    cfg = get_config(args.config)
    model, state = create_state(cfg)
    b = cfg.train.batch_size
    nb = cfg.model.num_bars
    n_bars_total = 4096
    n_windows = n_bars_total - nb + 1
    data = {
        "bars": (jax.random.uniform(jax.random.key(0),
                                    (n_bars_total, 96, 128)) < 0.08
                 ).astype(jnp.uint8),
        "starts": jnp.arange(n_windows, dtype=jnp.int32),
    }
    if cfg.model.kind == "cond":
        data["chords"] = jnp.zeros((n_windows,), jnp.int32)
        data["keys"] = jnp.zeros((n_windows,), jnp.int32)
    data = jax.device_put(data)
    idx = jnp.asarray(np.random.default_rng(0).integers(
        0, n_windows, size=(b,)), jnp.int32)
    gather = _make_window_gather(cfg)
    batch = jax.device_put(jax.jit(gather)(data, idx))
    key = jax.random.key(1)

    def f32fence(out):
        float(jnp.sum(jax.tree.leaves(out)[0]))

    kw = {}
    if cfg.model.kind == "cond":
        kw = {"chord": batch["chord"], "key_sig": batch["key_sig"]}

    def loss_fn(params, bx):
        logits, latents = model.apply({"params": params}, bx["x"], **kw,
                                      rngs={"latent": key})
        loss, _ = elbo_from_outputs(cfg, logits, bx["x"], latents,
                                    jnp.asarray(1.0))
        return loss

    def enc_fn(params, x):
        mask = pitch_mask(cfg.midi)
        cv = None
        enc = model.apply({"params": params}, x, cv,
                          method=model.encode)
        leaf = jax.tree.leaves(enc)[0]
        return jnp.sum(leaf)

    opt = make_optimizer(cfg)
    full_step = make_train_step_indexed(cfg, model, opt=opt)

    empty = jax.jit(lambda s: s + 1)
    scalar = jnp.zeros(())
    gather_j = jax.jit(gather)
    enc_j = jax.jit(enc_fn)
    loss_j = jax.jit(loss_fn)
    vg_j = jax.jit(jax.value_and_grad(loss_fn))
    pieces = {
        "dispatch(empty)": (lambda: empty(scalar), lambda o: float(o)),
        "gather": (lambda: gather_j(data, idx),
                   lambda o: float(jnp.sum(o["x"][0, 0, 0]))),
        "encode": (lambda: enc_j(state.params, batch["x"]),
                   lambda o: float(o)),
        "fwd": (lambda: loss_j(state.params, batch),
                lambda o: float(o)),
        "fwd_bwd": (lambda: vg_j(state.params, batch), lambda o: float(o[0])),
    }
    results = {}
    for name, (fn, fence) in pieces.items():
        results[name] = _time(fn, fence, args.reps)
        log(f"{name:>16}: {1e3 * results[name]:8.3f} ms")

    st = state
    st, m = full_step(st, data, idx)
    float(m["loss"])
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        st, m = full_step(st, data, idx)
        float(m["loss"])
        times.append(time.perf_counter() - t0)
    results["full_step"] = statistics.median(times)
    log(f"{'full_step':>16}: {1e3 * results['full_step']:8.3f} ms")

    import json
    print(json.dumps({k: round(1e3 * v, 3) for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
