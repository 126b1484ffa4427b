"""Compile-time cold vs persistent-cache-warm table (VERDICT r4 #5).

For each config this measures, in SEPARATE subprocesses (the honest
cross-process story — in-process re-jit is trivially cached):
  - cold_s:  first train-step compile with a FRESH persistent-cache dir;
  - warm_s:  the same program in a new process against the now-populated
             cache (what a user's second `train` invocation pays).
Each subprocess enables the same jax persistent-compilation-cache config
the CLI does (cli._enable_compile_cache) so the table reflects the
shipped path.

Usage: python bench/compile_time.py [--out logs/r5/compile_time.json]
                                    [--configs c2_mxu c3_mxu ...]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = ["c2_gru_4bar", "c2_mxu", "c2_trf", "c3_mxu", "c3_trf",
           "c2_trf_32bar"]

CHILD = r"""
import json, os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["CT_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from musicvae_tpu.config import get_config
from musicvae_tpu.parallel import make_mesh, replicated
from musicvae_tpu.train import create_state, make_train_step_indexed_multi

cfg = get_config(sys.argv[1])
K = 100
mesh = make_mesh(cfg.mesh)
model, state = create_state(cfg)
state = jax.device_put(state, replicated(mesh))
n_bars_total = 4096
n_windows = n_bars_total - cfg.model.num_bars + 1
data = {"bars": (jax.random.uniform(jax.random.key(0),
                                    (n_bars_total, 96, 128)) < 0.08
                 ).astype(jax.numpy.uint8),
        "starts": jax.numpy.arange(n_windows, dtype=jax.numpy.int32)}
if cfg.model.kind == "cond":
    data["chords"] = jax.numpy.zeros((n_windows,), jax.numpy.int32)
    data["keys"] = jax.numpy.zeros((n_windows,), jax.numpy.int32)
data = jax.device_put(data, replicated(mesh))
idx = np.zeros((K, cfg.train.batch_size), np.int32)
step = make_train_step_indexed_multi(cfg, model, K)
t0 = time.perf_counter()
state, metrics = step(state, data, idx)
float(metrics["loss"])                      # axon fence
print(json.dumps({"first_dispatch_s": round(time.perf_counter() - t0, 2)}))
"""


def run_child(name: str, cache_dir: str) -> float:
    env = dict(os.environ, CT_CACHE_DIR=cache_dir)
    out = subprocess.run([sys.executable, "-c", CHILD, name], cwd=REPO,
                         env=env, capture_output=True, text=True,
                         timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(f"{name}: child failed:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])["first_dispatch_s"]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="logs/r5/compile_time.json")
    p.add_argument("--configs", nargs="*", default=CONFIGS)
    args = p.parse_args()

    rows = []
    for name in args.configs:
        with tempfile.TemporaryDirectory(prefix="xlacache_") as cache:
            cold = run_child(name, cache)
            warm = run_child(name, cache)
        rows.append({"config": name, "cold_s": cold, "warm_s": warm})
        print(f"{name}: cold {cold:.1f}s -> warm {warm:.1f}s",
              file=sys.stderr, flush=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
