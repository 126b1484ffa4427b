"""Per-config throughput + MFU harness (SURVEY §6, BASELINE north_star).

For every training config (C1–C4 + the cropped C2) this measures, on the
real chip:
  - steps/s on the PRODUCTION path (device-resident cache, K-step scanned
    dispatch — exactly what the CLI runs), and
  - FLOPs/step from XLA's own cost model (``compiled.cost_analysis()``)
    of the single-step program (the K-step scan lowers to an HLO while
    loop whose body the cost model does not multiply by trip count, so
    the single-step program is the honest per-step count),
and derives model-FLOPs utilization vs the chip's bf16 peak. C5 measures
the full 1024x64-bar interpolated generation sweep the same way, with the
scan-body FLOPs scaled by the bar trip count.

Usage:
    python bench/mfu.py [--out MFU.json] [--configs c2_gru_4bar ...]

Writes one JSON blob with per-config rows; BASELINE.md's MFU table is
generated from it. The reference publishes no utilization numbers
(BASELINE.json published: {}); the point of this file is VERDICT r1 item 2:
convert "fast vs a CPU oracle" into "efficient vs the silicon".
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# bf16 systolic-array peak per chip. device_kind-keyed; the axon chip
# reports "TPU v5 lite" (v5e: 197 TFLOP/s bf16). fp32 configs (C1) are
# still scored against bf16 peak so the column is comparable — the fp32
# penalty IS lost utilization on this hardware.
PEAK_BF16 = {
    "TPU v5 lite": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
}

TRAIN_CONFIGS = ["c1_conv_bar", "c2_gru_4bar", "c2_cropped",
                 "c3_hier_16bar", "c4_cond", "c2_mxu", "c2_trf", "c3_mxu",
                 "c3_trf", "c2_mxu_16bar", "c2_trf_16bar",
                 "c2_mxu_32bar", "c2_trf_32bar", "c2_mxu_wide"]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _peak() -> float:
    import jax
    kind = jax.devices()[0].device_kind
    peak = PEAK_BF16.get(kind)
    if peak is None:
        log(f"unknown device kind {kind!r}; assuming v5e peak")
        peak = PEAK_BF16["TPU v5 lite"]
    return peak


def _flops(lowered_compiled) -> float:
    ca = lowered_compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):       # older jax returns [dict]
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def _synth_data(cfg, n_bars_total=4096, with_labels=False):
    import jax
    import jax.numpy as jnp
    n_windows = n_bars_total - cfg.model.num_bars + 1
    data = {
        "bars": (jax.random.uniform(
            jax.random.key(0), (n_bars_total, 96, 128)) < 0.08
            ).astype(jnp.uint8),
        "starts": jnp.arange(n_windows, dtype=jnp.int32),
    }
    if with_labels:
        data["chords"] = jnp.zeros((n_windows,), jnp.int32)
        data["keys"] = jnp.zeros((n_windows,), jnp.int32)
    return data, n_windows


def bench_train_config(cfg, steps=200, k=100):
    """(steps/s, flops/step, compile_s) for one config's production path."""
    import jax
    import numpy as np
    from musicvae_tpu.parallel import make_mesh, replicated
    from musicvae_tpu.train import (create_state, make_train_step_indexed,
                                    make_train_step_indexed_multi)

    mesh = make_mesh(cfg.mesh)
    model, state = create_state(cfg)
    state = jax.device_put(state, replicated(mesh))
    with_labels = cfg.model.kind == "cond"
    data, n_windows = _synth_data(cfg, with_labels=with_labels)
    data = jax.device_put(data, replicated(mesh))
    b = cfg.train.batch_size
    rng = np.random.default_rng(0)

    # FLOPs: XLA's cost model over the single-step program
    single = make_train_step_indexed(cfg, model)
    idx1 = rng.integers(0, n_windows, size=(b,)).astype(np.int32)
    flops_step = _flops(single.lower(state, data, idx1).compile())

    multi = make_train_step_indexed_multi(cfg, model, k)
    n_chunks = steps // k
    idxs = rng.integers(0, n_windows,
                        size=(1 + n_chunks, k, b)).astype(np.int32)
    t0 = time.perf_counter()
    state, metrics = multi(state, data, idxs[0])        # compile + warmup
    float(metrics["loss"])                              # axon fence
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(n_chunks):
        state, metrics = multi(state, data, idxs[1 + i])
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    return n_chunks * k / dt, flops_step, compile_s


def bench_gen_c5(cfg, reps=3):
    """C5 full sweep: 1024 samples x 64 bars, slerp interpolation.

    Returns (phrases4/s, flops/sweep, compile_s). The generation scan is an
    HLO while loop; whether the cost model scales the body by trip count is
    version-dependent, so we lower two scan lengths and compare:
    - if flops grow with length, the model scaled the body → use f_a as-is;
    - if they don't (body counted once — what jax 0.9/XLA does here), the
      per-sweep total is ≈ f_a * num_bars (the non-scan prologue — latent
      path sampling/slerp — is MFLOPs against a ~50 GFLOP body, so folding
      it into the product is a <0.1% error).
    """
    import jax
    import jax.numpy as jnp
    from musicvae_tpu.config import GenSpec
    from musicvae_tpu.generate import make_generate_fn
    from musicvae_tpu.train import create_state

    _, state = create_state(cfg)
    nb, ns = cfg.gen.num_bars, cfg.gen.num_samples

    def compiled_flops(num_bars):
        c = cfg.replace(gen=GenSpec(num_bars=num_bars, num_samples=ns,
                                    interpolate=cfg.gen.interpolate))
        fn = make_generate_fn(c)
        return _flops(jax.jit(fn).lower(state.params,
                                        jax.random.key(0)).compile())

    f_a, f_b = compiled_flops(nb), compiled_flops(nb // 2)
    if f_a - f_b > 0.25 * f_b:        # cost model scaled the while body
        flops_sweep = f_a
    else:                             # body counted once (jax 0.9 behavior)
        flops_sweep = f_a * nb

    gen = make_generate_fn(cfg)
    t0 = time.perf_counter()
    bars = gen(state.params, jax.random.key(0))
    float(jnp.sum(bars))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(reps):
        bars = gen(state.params, jax.random.key(i + 1))
        s = jnp.sum(bars)
    float(s)
    dt = time.perf_counter() - t0
    sweeps_per_s = reps / dt
    return sweeps_per_s * ns * nb / 4, flops_sweep * sweeps_per_s, compile_s


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="MFU.json")
    p.add_argument("--configs", nargs="*", default=None)
    p.add_argument("--steps", type=int, default=200)
    args = p.parse_args()

    import jax
    from musicvae_tpu.config import get_config

    peak = _peak()
    dev = jax.devices()[0].device_kind
    log(f"device: {dev}, bf16 peak {peak/1e12:.0f} TFLOP/s")

    rows = []

    def flush():
        # incremental: a sweep interrupted mid-run (remote compiles on a
        # congested tunnel can take many minutes PER CONFIG) still leaves
        # every completed row on disk
        with open(args.out, "w") as f:
            json.dump({"device_kind": dev, "peak_bf16_flops": peak,
                       "rows": rows}, f, indent=1)

    names = args.configs or TRAIN_CONFIGS
    for name in names:
        cfg = get_config(name)
        sps, flops_step, compile_s = bench_train_config(cfg, steps=args.steps)
        mfu = flops_step * sps / peak
        rows.append({
            "config": name, "what": "train",
            "batch": cfg.train.batch_size, "num_bars": cfg.model.num_bars,
            "dtype": cfg.model.dtype,
            "steps_per_sec": round(sps, 2),
            "gflops_per_step": round(flops_step / 1e9, 3),
            "tflops_per_sec": round(flops_step * sps / 1e12, 4),
            "mfu_pct": round(100 * mfu, 3),
            "compile_s": round(compile_s, 1),
        })
        log(f"{name}: {sps:.1f} steps/s, "
            f"{flops_step/1e9:.2f} GFLOP/step, MFU {100*mfu:.2f}%")
        flush()

    if args.configs is None:
        cfg = get_config("c5_gen_sweep")
        phrases, flops_per_s, compile_s = bench_gen_c5(cfg)
        rows.append({
            "config": "c5_gen_sweep", "what": "generate",
            "batch": cfg.gen.num_samples, "num_bars": cfg.gen.num_bars,
            "dtype": cfg.model.dtype,
            "phrases4_per_sec": round(phrases, 1),
            "tflops_per_sec": round(flops_per_s / 1e12, 4),
            "mfu_pct": round(100 * flops_per_s / peak, 3),
            "compile_s": round(compile_s, 1),
        })
        log(f"c5_gen_sweep: {phrases:.0f} 4-bar phrases/s, "
            f"MFU {100*flops_per_s/peak:.2f}%")

    flush()
    log(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
