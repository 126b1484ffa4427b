#!/bin/bash
# Round-5 MXU-ceiling lever, quality side (VERDICT r4 #8): the
# wider-fewer patch stacks measured 46.8-49.0% MFU (logs/r5/
# mxu_levers.jsonl) vs c2_mxu's 36.2% — at ~2.4x FLOPs/step. Whether
# that buys QUALITY at matched step budget decides whether a wide
# config gets registered. Protocol = the r4 4-bar A/B: one shared
# 4-bar synthetic corpus, 8000 steps, eval every 1000; base c2_mxu
# re-run on the SAME corpus so the pair is same-session comparable.
set -u
cd "$(dirname "$0")/.."
P=python
OUT=logs/r5
WORK=${SOAK_WORK:-/tmp/soak_r5}
mkdir -p "$OUT" "$WORK"

DATA="$WORK/corpus4.npz"
if [ ! -f "$DATA" ]; then
  $P -m musicvae_tpu preprocess --config c2_mxu \
     --synthetic-pieces 256 --out "$DATA" 2>&1 | tail -1
fi

soak() {  # soak <tag> [train overrides...]
  local tag=$1; shift
  echo "=== wide A/B soak $tag ==="
  $P -m musicvae_tpu train --config c2_mxu --data "$DATA" \
     --steps 8000 --eval-every 1000 "$@" \
     --ckpt-dir "$WORK/ckpt_wide_$tag" --log-dir "$WORK/log_wide_$tag" \
     > "$OUT/wide_${tag}_soak.log" 2>&1
  grep -E "eval_f1" "$OUT/wide_${tag}_soak.log" | tail -8
}

soak base
soak w512 --enc-channels "512,512" --dec-channels "512,512"
echo "soak_wide_r5 done"
