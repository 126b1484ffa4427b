#!/bin/bash
# Round-5 chip-work queue, run after the A/B control soaks:
#  1. c3_trf re-soak at its FINAL registered defaults (grad-clip 1.0 +
#     1k warmup + cosine decay to 0.1 — the 0.980-F1 run used
#     constant-after-warmup; the table row must match the shipped
#     config exactly), + eval-gen.
#  2. The round-5 optimizer/arch levers on c2_mxu (VERDICT r4 #8), all
#     measured with MFU via ab_step --mfu:
#       baseline / adam_mu bf16 / wider-fewer patch stacks.
#  3. MFU re-measurement for the trf configs at their new defaults
#     (clip+warmup change the train program; the mxu/parity rows in
#     MFU.json are from this round's earlier sweep and unchanged).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/musicvae_tpu_xla}"
P=python
OUT=logs/r5
WORK=${SOAK_WORK:-/tmp/soak_r5}
mkdir -p "$OUT"

echo "=== c3_trf @ registered defaults ==="
$P -m musicvae_tpu train --config c3_trf --data "$WORK/corpus16.npz" \
   --steps 8000 --eval-every 1000 \
   --ckpt-dir "$WORK/ckpt_c3_trf_default" --log-dir "$WORK/log_c3_trf_default" \
   > "$OUT/c3_trf_default_soak.log" 2>&1
grep -E "eval_f1" "$OUT/c3_trf_default_soak.log" | tail -8
$P -m musicvae_tpu eval-gen --config c3_trf \
   --ckpt-dir "$WORK/ckpt_c3_trf_default/best" --data "$WORK/corpus16.npz" \
   --bars 16 --samples 64 \
   > "$OUT/evalgen_c3_trf_default.json" 2>"$OUT/evalgen_c3_trf_default.err" \
  || echo "eval-gen c3_trf default failed"

echo "=== c2_mxu levers (VERDICT r4 #8) ==="
: > "$OUT/mxu_levers.jsonl"
run_lever() {
  echo "--- lever: $* ---"
  $P bench/ab_step.py --config c2_mxu --mfu "$@" \
     >> "$OUT/mxu_levers.jsonl" 2>>"$OUT/mxu_levers.err"
  tail -1 "$OUT/mxu_levers.jsonl"
}
run_lever
run_lever --adam-mu-dtype bfloat16
run_lever --enc-channels 384,768 --dec-channels 768,384
run_lever --enc-channels 512,512 --dec-channels 512,512
run_lever --enc-channels 256,512,1024 --dec-channels 1024,512,256

echo "=== trf MFU rows at new defaults ==="
$P bench/mfu.py --out "$OUT/mfu_trf_defaults.json" \
   --configs c2_trf c3_trf c2_trf_16bar c2_trf_32bar \
   2> "$OUT/mfu_sweep_trf.log"
tail -5 "$OUT/mfu_sweep_trf.log"
echo "post_controls_r5 done"
