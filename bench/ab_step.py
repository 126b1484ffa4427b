"""A/B harness for train-step variants on the real chip (round-2 verdict
#1/#8): measures the PRODUCTION path (device-resident uint8 cache,
K-step scanned indexed dispatch — bench.py's methodology) under config
overrides, so candidate optimizations are judged by measured steps/s,
not by trace speculation.

Variants of interest:
  --logits-dtype bfloat16   decoder head emits bf16 logits (halves the
                            HBM write+read of the step's largest
                            activation; loss still accumulates f32)
  --model-dtype float32     C1-style fp32 compute (the C1 MFU pin)
  --k N                     steps per dispatch (dispatch-floor control:
                            K=100 vs K=1000 separates dispatch overhead
                            from device-bound time)

Usage (TPU, single-tenant):
    JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
        python bench/ab_step.py --config c2_gru_4bar --logits-dtype bfloat16

Prints one JSON line: {"config", "overrides", "k", "steps_per_sec"}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="c2_gru_4bar")
    p.add_argument("--logits-dtype", default=None,
                   choices=[None, "float32", "bfloat16"])
    p.add_argument("--model-dtype", default=None,
                   choices=[None, "float32", "bfloat16"])
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--adam-mu-dtype", default=None,
                   choices=[None, "float32", "bfloat16"],
                   help="TrainSpec.adam_mu_dtype: dtype of Adam's first-"
                        "moment buffer (round-5 optimizer-traffic A/B)")
    p.add_argument("--enc-channels", default=None,
                   help="comma-separated ModelSpec.enc_channels override "
                        "(round-5 wider-fewer patch-stack A/B)")
    p.add_argument("--dec-channels", default=None,
                   help="comma-separated ModelSpec.dec_channels override")
    p.add_argument("--mfu", action="store_true",
                   help="also lower the single-step program for XLA's "
                        "cost model and report GFLOP/step + MFU vs the "
                        "chip's bf16 peak (bench/mfu.py methodology)")
    p.add_argument("--pallas-loss", action="store_true",
                   help="TrainSpec.use_pallas_loss=True: the train step's "
                        "differentiated masked-BCE runs through the "
                        "dual-output Pallas kernel (round-4 A/B, "
                        "ops/fused_elbo.py)")
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    from musicvae_tpu.config import get_config
    from musicvae_tpu.parallel import make_mesh, replicated
    from musicvae_tpu.train import create_state, make_train_step_indexed_multi

    cfg = get_config(args.config)
    overrides = {}
    if args.logits_dtype:
        overrides["logits_dtype"] = args.logits_dtype
    if args.model_dtype:
        overrides["dtype"] = args.model_dtype
    if args.enc_channels:
        overrides["enc_channels"] = tuple(
            int(c) for c in args.enc_channels.split(","))
    if args.dec_channels:
        overrides["dec_channels"] = tuple(
            int(c) for c in args.dec_channels.split(","))
    if overrides:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, **overrides))
    if args.batch:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                    batch_size=args.batch))
    if args.pallas_loss:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                    use_pallas_loss=True))
        overrides["use_pallas_loss"] = True
    if args.adam_mu_dtype:
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, adam_mu_dtype=args.adam_mu_dtype))
        overrides["adam_mu_dtype"] = args.adam_mu_dtype
    log(f"backend: {jax.default_backend()}; config {cfg.name} "
        f"overrides={overrides} batch={cfg.train.batch_size} K={args.k}")

    K = args.k
    mesh = make_mesh(cfg.mesh)
    model, state = create_state(cfg)
    state = jax.device_put(state, replicated(mesh))
    step_fn = make_train_step_indexed_multi(cfg, model, K)

    b = cfg.train.batch_size
    n_bars_total = 4096
    n_windows = n_bars_total - cfg.model.num_bars + 1
    data = {
        "bars": (jax.random.uniform(jax.random.key(0),
                                    (n_bars_total, 96, 128)) < 0.08
                 ).astype(jnp.uint8),
        "starts": jnp.arange(n_windows, dtype=jnp.int32),
    }
    if cfg.model.kind == "cond":
        data["chords"] = jnp.zeros((n_windows,), jnp.int32)
        data["keys"] = jnp.zeros((n_windows,), jnp.int32)
    data = jax.device_put(data, replicated(mesh))
    rng = np.random.default_rng(0)
    n_chunks = max(1, args.steps // K)
    idxs = rng.integers(0, n_windows,
                        size=(1 + n_chunks, K, b)).astype(np.int32)

    state, metrics = step_fn(state, data, idxs[0])       # compile + warmup
    float(metrics["loss"])                               # axon fence
    t0 = time.perf_counter()
    for i in range(n_chunks):
        state, metrics = step_fn(state, data, idxs[1 + i])
    final_loss = float(metrics["loss"])                  # fence
    dt = time.perf_counter() - t0
    sps = n_chunks * K / dt

    log(f"{sps:.2f} steps/s ({n_chunks}x{K} steps in {dt:.2f}s), "
        f"loss {final_loss:.1f}")
    row = {"config": cfg.name, "overrides": overrides,
           "batch": b, "k": K, "steps_per_sec": round(sps, 2)}
    if args.mfu:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from mfu import PEAK_BF16, _flops   # bench/mfu.py (not a package:
                                            # root bench.py shadows 'bench')
        from musicvae_tpu.train import make_train_step_indexed
        single = make_train_step_indexed(cfg, model)
        flops = _flops(single.lower(state, data, idxs[0][0]).compile())
        kind = jax.devices()[0].device_kind
        peak = next((v for kk, v in PEAK_BF16.items() if kind.startswith(kk)),
                    None)
        row["gflop_per_step"] = round(flops / 1e9, 2)
        if peak:
            row["mfu"] = round(flops * sps / peak, 4)
    print(json.dumps(row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
