"""Per-op time attribution from a jax.profiler trace (SURVEY §5.1).

Runs the production train step (or the C5 generation sweep) under
``jax.profiler.trace`` and parses the resulting ``.xplane.pb`` directly
(the tensorboard profile plugin's converter is broken against this
machine's tensorflow, so we read the XSpace proto ourselves) to print the
top XLA ops by total device time. This is the trace evidence behind the
Pallas/优化 decisions in BASELINE.md: it names WHICH ops the 14%-MFU train
step actually spends its time in.

Usage:
    PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
        python bench/trace_ops.py --config c2_gru_4bar --steps 20

(The env var is required: the installed C++ protobuf runtime predates the
plugin's generated code.)
"""

import argparse
import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_traced(cfg, what, steps, outdir):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from musicvae_tpu.train import create_state, make_train_step_indexed

    if what == "train":
        model, state = create_state(cfg)
        b = cfg.train.batch_size
        n_bars_total = 4096
        n_windows = n_bars_total - cfg.model.num_bars + 1
        data = jax.device_put({
            "bars": (jax.random.uniform(jax.random.key(0),
                                        (n_bars_total, 96, 128)) < 0.08
                     ).astype(jnp.uint8),
            "starts": jnp.arange(n_windows, dtype=jnp.int32),
        })
        idx = jnp.asarray(np.random.default_rng(0).integers(
            0, n_windows, size=(steps, b)), jnp.int32)
        step = make_train_step_indexed(cfg, model)
        state, m = step(state, data, idx[0])
        float(m["loss"])                                 # compile + fence
        with jax.profiler.trace(outdir):
            for i in range(steps):
                state, m = step(state, data, idx[i])
            float(m["loss"])
    elif what == "train_multi":
        # PRODUCTION regime: all `steps` steps in ONE scanned dispatch —
        # per-dispatch staging (weight/index copy-start windows, which
        # dominate the single-step trace) amortizes across the scan, so
        # this table reflects what the 460+ steps/s path actually spends
        # per step. Compare against --what train to separate staging
        # latency from per-step compute.
        from musicvae_tpu.train import make_train_step_indexed_multi
        model, state = create_state(cfg)
        b = cfg.train.batch_size
        n_bars_total = 4096
        n_windows = n_bars_total - cfg.model.num_bars + 1
        data = jax.device_put({
            "bars": (jax.random.uniform(jax.random.key(0),
                                        (n_bars_total, 96, 128)) < 0.08
                     ).astype(jnp.uint8),
            "starts": jnp.arange(n_windows, dtype=jnp.int32),
        })
        idx = jnp.asarray(np.random.default_rng(0).integers(
            0, n_windows, size=(2, steps, b)), jnp.int32)
        multi = make_train_step_indexed_multi(cfg, model, steps)
        state, m = multi(state, data, idx[0])
        float(m["loss"])                                 # compile + fence
        with jax.profiler.trace(outdir):
            state, m = multi(state, data, idx[1])
            float(m["loss"])
    else:
        from musicvae_tpu.generate import make_generate_fn
        from musicvae_tpu.train import create_state
        _, state = create_state(cfg)
        gen = make_generate_fn(cfg)
        bars = gen(state.params, jax.random.key(0))
        float(jnp.sum(bars))
        with jax.profiler.trace(outdir):
            for i in range(steps):
                bars = gen(state.params, jax.random.key(i + 1))
            float(jnp.sum(bars))


def parse_xplane(outdir, top=40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no .xplane.pb under {outdir}")
    agg = collections.defaultdict(lambda: [0.0, 0])     # name -> [ps, count]
    total_ps = 0.0
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            # device planes only (TPU:* / device XLA op planes); skip host
            pname = plane.name.lower()
            if "tpu" not in pname and "device" not in pname:
                continue
            meta = plane.event_metadata
            for line in plane.lines:
                lname = line.name.lower()
                # XLA op-level lines; skip module/step summary lines
                if "xla op" not in lname and "ops" != lname:
                    continue
                for ev in line.events:
                    name = meta[ev.metadata_id].name
                    agg[name][0] += ev.duration_ps
                    agg[name][1] += 1
                    total_ps += ev.duration_ps
    return agg, total_ps


def classify(name: str) -> str:
    n = name.lower()
    if any(k in n for k in ("infeed", "outfeed", "host")):
        return "infeed/host"
    if any(k in n for k in ("all-reduce", "all-gather", "collective",
                            "reduce-scatter")):
        return "collective"
    if "conv" in n:
        return "conv"
    if any(k in n for k in ("dot", "matmul", "einsum")):
        return "matmul"
    # layout/copy BEFORE the generic fusion bucket: XLA emits copy/
    # transpose fusions whose names carry both markers, and the whole
    # point of this table is to itemize the copy share
    if any(k in n for k in ("copy", "transpose", "bitcast")):
        return "layout/copy"
    if any(k in n for k in ("fusion", "multiply", "add", "select", "gelu",
                            "tanh", "logistic", "exp", "log", "reshape")):
        return "fusion/elementwise"
    if any(k in n for k in ("gather", "scatter", "dynamic")):
        return "gather/scatter"
    if any(k in n for k in ("while", "condition", "body")):
        return "control"
    if "rng" in n or "random" in n:
        return "rng"
    return "other"


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="c2_gru_4bar")
    p.add_argument("--what", choices=["train", "train_multi", "generate"],
                   default="train")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--logits-dtype", default=None,
                   choices=[None, "float32", "bfloat16"],
                   help="override ModelSpec.logits_dtype for the A/B")
    p.add_argument("--out", default=None,
                   help="trace dir (default: temp); reuse with --parse-only")
    p.add_argument("--parse-only", action="store_true")
    args = p.parse_args()

    outdir = args.out or os.path.join(tempfile.gettempdir(), "mvae_trace")
    if not args.parse_only:
        import dataclasses

        from musicvae_tpu.config import get_config
        cfg = get_config(args.config)
        if args.logits_dtype:
            cfg = cfg.replace(model=dataclasses.replace(
                cfg.model, logits_dtype=args.logits_dtype))
        run_traced(cfg, args.what, args.steps, outdir)
        log(f"trace written to {outdir}")

    agg, total_ps = parse_xplane(outdir, args.top)
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    log(f"\ntotal device op time: {total_ps/1e12*1e3:.3f} ms "
        f"across {args.steps} steps "
        f"({total_ps/1e12*1e3/max(1,args.steps):.3f} ms/step)")
    log(f"{'op':<64} {'ms/step':>9} {'%':>6}  class")
    by_class = collections.defaultdict(float)
    for name, (ps, cnt) in rows:
        by_class[classify(name)] += ps
    for name, (ps, cnt) in rows[: args.top]:
        log(f"{name[:64]:<64} {ps/1e12*1e3/max(1,args.steps):>9.4f} "
            f"{100*ps/total_ps:>6.2f}  {classify(name)}")
    log("\nby class:")
    for cls, ps in sorted(by_class.items(), key=lambda kv: -kv[1]):
        log(f"  {cls:<22} {100*ps/total_ps:>6.2f}%  "
            f"{ps/1e12*1e3/max(1,args.steps):.3f} ms/step")
    return 0


if __name__ == "__main__":
    sys.exit(main())
