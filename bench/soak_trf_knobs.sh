#!/bin/bash
# Round-5 follow-up: the attn-family quality soaks at GRU-tuned knobs
# diverged (c2_trf_16bar: grad_norm ~1e4, eval F1 oscillating 0.37-0.62
# with RISING loss — logs/r5/c2_trf_16bar_soak.log). Re-run the trf
# configs with standard transformer hygiene — global-norm grad clip 1.0
# and 1000-step linear lr warmup (cosine with lr_min_ratio=1.0 ==
# warmup-then-constant, so the only schedule difference vs the GRU A/B
# is the warmup) — same corpus, same budget, same everything else. If
# this stabilizes at parity-or-better quality, these knobs become the
# trf configs' DEFAULTS (the configs are beyond-reference; their
# defaults are part of the config) and the A/B table records both runs.
set -u
cd "$(dirname "$0")/.."
P=python
OUT=logs/r5
mkdir -p "$OUT"
WORK=${SOAK_WORK:-/tmp/soak_r5}
KNOBS="--grad-clip 1.0 --lr-schedule cosine --lr-warmup-steps 1000 --lr-min-ratio 1.0"

for c in c2_trf_16bar c3_trf; do
  echo "=== knobs soak $c ==="
  $P -m musicvae_tpu train --config "$c" --data "$WORK/corpus16.npz" \
     --steps 8000 --eval-every 1000 $KNOBS \
     --ckpt-dir "$WORK/ckpt_${c}_knobs" --log-dir "$WORK/log_${c}_knobs" \
     > "$OUT/${c}_knobs_soak.log" 2>&1
  grep -E "eval_f1|final metrics" "$OUT/${c}_knobs_soak.log" | tail -9
  $P -m musicvae_tpu eval-gen --config "$c" \
     --ckpt-dir "$WORK/ckpt_${c}_knobs/best" --data "$WORK/corpus16.npz" \
     --bars 16 --samples 64 \
     > "$OUT/evalgen_${c}_knobs.json" 2>"$OUT/evalgen_${c}_knobs.err" \
    || echo "eval-gen $c failed (see $OUT/evalgen_${c}_knobs.err)"
done
echo "soak_trf_knobs done"
