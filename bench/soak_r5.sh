#!/bin/bash
# Round-5 matched-budget quality soaks (VERDICT r4 #1/#2/#7): the
# registered temporal-core A/B pairs trained on ONE shared synthetic
# corpus with identical knobs, then scored with the framework's own
# generation-quality instrument (eval-gen JS metrics) from each run's
# best checkpoint. Protocol = round 4's *_aug_soak runs: 8000 steps,
# 256-piece corpus, config-default knobs, eval every 1000.
set -u
cd "$(dirname "$0")/.."
P=python
OUT=logs/r5
mkdir -p "$OUT"
WORK=${SOAK_WORK:-/tmp/soak_r5}
mkdir -p "$WORK"

DATA="$WORK/corpus16.npz"
if [ ! -f "$DATA" ]; then
  $P -m musicvae_tpu preprocess --config c2_mxu_16bar \
     --synthetic-pieces 256 --out "$DATA" 2>&1 | tail -2
fi

for c in c2_mxu_16bar c2_trf_16bar c3_mxu c3_trf; do
  echo "=== soak $c ==="
  $P -m musicvae_tpu train --config "$c" --data "$DATA" \
     --steps 8000 --eval-every 1000 \
     --ckpt-dir "$WORK/ckpt_$c" --log-dir "$WORK/log_$c" \
     > "$OUT/${c}_soak.log" 2>&1
  grep -E "^step .*eval_f1|final metrics" "$OUT/${c}_soak.log" | tail -12
  $P -m musicvae_tpu eval-gen --config "$c" \
     --ckpt-dir "$WORK/ckpt_$c/best" --data "$DATA" \
     --bars 16 --samples 64 \
     > "$OUT/evalgen_${c}.json" 2>"$OUT/evalgen_${c}.err" \
    || echo "eval-gen $c failed (see $OUT/evalgen_${c}.err)"
done
echo "soak_r5 done"
