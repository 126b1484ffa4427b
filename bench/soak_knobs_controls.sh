#!/bin/bash
# Round-5 A/B controls: the trf configs improved dramatically under
# grad-clip 1.0 + 1000-step lr warmup (c3_trf eval F1 0.807 -> 0.980 at
# the same 8k budget). Fairness demands the SAME knobs be offered to the
# GRU/mxu side before the quality verdict is written — these runs are
# that control. Plus the c2_trf_16bar cosine-decay variant (its
# constant-after-warmup run stabilized early then degraded once beta
# reached 1; decay is the standard fix).
set -u
cd "$(dirname "$0")/.."
P=python
OUT=logs/r5
mkdir -p "$OUT"
WORK=${SOAK_WORK:-/tmp/soak_r5}
KNOBS="--grad-clip 1.0 --lr-schedule cosine --lr-warmup-steps 1000 --lr-min-ratio 1.0"
DECAY="--grad-clip 1.0 --lr-schedule cosine --lr-warmup-steps 1000 --lr-min-ratio 0.1"

run() {  # run <config> <tag> <knobs...>
  local c=$1 tag=$2; shift 2
  echo "=== $tag soak $c ==="
  $P -m musicvae_tpu train --config "$c" --data "$WORK/corpus16.npz" \
     --steps 8000 --eval-every 1000 "$@" \
     --ckpt-dir "$WORK/ckpt_${c}_${tag}" --log-dir "$WORK/log_${c}_${tag}" \
     > "$OUT/${c}_${tag}_soak.log" 2>&1
  grep -E "eval_f1|final metrics" "$OUT/${c}_${tag}_soak.log" | tail -9
  $P -m musicvae_tpu eval-gen --config "$c" \
     --ckpt-dir "$WORK/ckpt_${c}_${tag}/best" --data "$WORK/corpus16.npz" \
     --bars 16 --samples 64 \
     > "$OUT/evalgen_${c}_${tag}.json" 2>"$OUT/evalgen_${c}_${tag}.err" \
    || echo "eval-gen $c $tag failed"
}

run c2_trf_16bar decay $DECAY
run c3_mxu knobs $KNOBS
run c2_mxu_16bar knobs $KNOBS
echo "soak_knobs_controls done"
