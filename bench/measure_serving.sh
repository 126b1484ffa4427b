#!/bin/bash
# On-chip serving measurement for the round-3 serving toolkit — run when
# the axon tunnel is back (it went down ~20:45 on 2026-08-17 mid-compile
# of the first coalesced program and stayed down; docs/STATUS.md).
# Single-tenant chip: run ALONE. Usage:
#   bash bench/measure_serving.sh <ckpt_dir> [out_dir]
# <ckpt_dir>: any trained C2 checkpoint (e.g. the verify run's).
set -ex
CKPT=${1:?usage: measure_serving.sh <ckpt_dir> [out_dir]}
OUT=${2:-/tmp/serve_measure}
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
cd /root/repo

# TCP, 4 concurrent clients x 24 requests at 4x16 bars/request.
# Baselines to beat (packed, serial dispatch): 20.0 req/s, p50 50.4 ms.
for W in 4 1; do
  timeout 3600 python bench/serve_load.py --ckpt-dir "$CKPT" \
    --bars 16 --samples 4 --clients 4 --requests 24 --coalesce $W \
    | tee "$OUT/tcp_coalesce_$W.json"
done

# stdin backlog, 24 requests (same shape), coalesce 4 vs 1.
python - > "$OUT/reqs.jsonl" <<'PY'
import json
for i in range(24):
    print(json.dumps({"id": i, "seed": i}))
PY
for W in 4 1; do
  timeout 3600 python -m musicvae_tpu serve --ckpt-dir "$CKPT" \
    --bars 16 --samples 4 --coalesce $W \
    < "$OUT/reqs.jsonl" > "$OUT/stdin_coalesce_$W.jsonl"
  python - "$W" "$OUT" <<'PY'
import json, sys
w, out = sys.argv[1], sys.argv[2]
lines = [json.loads(l) for l in open(f"{out}/stdin_coalesce_{w}.jsonl")]
lat = sorted(l["latency_ms"] for l in lines if "latency_ms" in l)
ok = sum("midi_b64" in l for l in lines)
print(f"stdin coalesce={w}: {ok}/{len(lines)} ok, "
      f"p50 {lat[len(lat)//2]:.1f} ms")
PY
done
echo MEASURE_OK
# Then: record the numbers in docs/STATUS.md (serving toolkit bullet)
# and docs/SERVING.md; re-drive the verify recipe (generate + one serve
# request per transport) per .claude/skills/verify/SKILL.md.
