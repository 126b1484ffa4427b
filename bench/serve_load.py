"""Serving load harness: drive a `serve --port` service with N concurrent
clients and measure sustained request throughput + in-server latency
percentiles. This is the harness behind STATUS.md's serving numbers.

By default it SPAWNS the service as a subprocess (so one command gives a
clean, reproducible measurement incl. the service's own exit), waits for
the announced port, runs the load, and lets `--max-requests` stop the
service. Point it at an already-running service with --port.

Usage (TPU, single-tenant — run alone):
    JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
        python bench/serve_load.py --ckpt-dir /path/ckpt \
        --bars 16 --samples 4 --clients 4 --requests 24 --coalesce 4

Prints one JSON line:
    {"clients": N, "requests": total, "errors": E, "wall_s": ...,
     "req_per_s": ..., "p50_ms": ..., "p90_ms": ..., "coalesce": W}

Latency fields are the service-reported in-server latency_ms (dispatch →
response ready, queue wait included); wall_s/req_per_s are measured
client-side over the whole run.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import threading
import time


def run_load(port: int, clients: int, requests: int):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from musicvae_tpu.client import ServeClient, ServeError

    lat, errors = [], []
    lock = threading.Lock()

    def one_client(ci: int):
        try:
            with ServeClient(port=port) as c:
                for i in range(requests):
                    try:
                        resp = c.request({"id": ci * 10000 + i,
                                          "seed": ci * 10000 + i})
                        with lock:
                            lat.append(resp["latency_ms"])
                    except ServeError as e:   # per-request, keep going
                        with lock:
                            errors.append(str(e))
        except Exception as e:  # connection lost / service died: record
            with lock:          # it instead of dying silently with the
                errors.append(  # remaining requests uncounted
                    f"client {ci}: {type(e).__name__}: {e}")

    t0 = time.perf_counter()
    threads = [threading.Thread(target=one_client, args=(ci,))
               for ci in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat.sort()

    def rank(q):  # nearest-rank quantile: ceil(q*n)-1, never past p100
        import math
        return lat[max(0, math.ceil(q * len(lat)) - 1)] if lat else None

    return {
        # requests = everything answered (ok + errors); throughput and
        # latency percentiles cover SUCCESSFUL responses only
        "clients": clients, "requests": len(lat) + len(errors),
        "ok": len(lat), "errors": len(errors),
        "error_samples": errors[:3],
        "wall_s": round(wall, 2),
        "req_per_s": round(len(lat) / wall, 1) if wall > 0 else None,
        "p50_ms": rank(0.5),
        "p90_ms": rank(0.9),
    }


def spawn_service(args) -> tuple:
    """Start `serve --port 0` as a subprocess; return (proc, port) once
    the service announces its bound port (i.e. after compilation)."""
    cmd = [sys.executable, "-m", "musicvae_tpu", "serve",
           "--ckpt-dir", args.ckpt_dir, "--bars", str(args.bars),
           "--samples", str(args.samples), "--port", "0",
           "--max-requests", str(args.clients * args.requests)]
    if args.config:
        cmd += ["--config", args.config]
    if args.coalesce > 1:
        cmd += ["--coalesce", str(args.coalesce)]
    proc = subprocess.Popen(cmd, stderr=subprocess.PIPE, text=True)
    port = None
    banner = []
    for line in proc.stderr:        # service logs go to stderr
        banner.append(line)
        m = re.search(r"listening on [0-9.]+:(\d+)", line)
        if m:
            port = int(m.group(1))
            break
    if port is None:
        raise RuntimeError("service exited before announcing a port:\n"
                           + "".join(banner))
    print("".join(banner).strip(), file=sys.stderr)
    # drain the rest of stderr in the background so the service never
    # blocks on a full pipe
    threading.Thread(target=lambda: proc.stderr.read(),
                     daemon=True).start()
    return proc, port


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ckpt-dir", help="spawn a service on this checkpoint")
    ap.add_argument("--config", default=None,
                    help="config override for the spawned service")
    ap.add_argument("--port", type=int, default=None,
                    help="measure an ALREADY-RUNNING service instead of "
                         "spawning one")
    ap.add_argument("--bars", type=int, default=16)
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--coalesce", type=int, default=1)
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--requests", type=int, default=24,
                    help="requests per client")
    args = ap.parse_args()

    proc = None
    if args.port is None:
        if not args.ckpt_dir:
            ap.error("either --port (running service) or --ckpt-dir "
                     "(spawn one) is required")
        proc, port = spawn_service(args)
    else:
        port = args.port

    result = run_load(port, args.clients, args.requests)
    result["coalesce"] = args.coalesce
    if proc is not None:
        try:
            result["service_rc"] = proc.wait(timeout=120)
        except subprocess.TimeoutExpired:
            # the service only exits via --max-requests; if requests were
            # lost to errors it would wait forever — report, don't hang
            proc.kill()
            result["service_rc"] = "killed (did not exit; see errors)"
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
