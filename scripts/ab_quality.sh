#!/bin/bash
# Quality A/Bs on real hardware (VERDICT r3 items 8-9), ~25 min total:
#
#  A. dssim_in_grad on/off at config-3 scale, fixed iters, held-out PSNR —
#     puts a +dB number on differentiating D-SSIM (the reference computes
#     D-SSIM for the scalar loss only and backpropagates pure L1,
#     tiled_shaders.metal:417-423).
#  B. overflow_drop index/impact under a capacity cap at ~1/4 of true pair
#     demand (eval renders at full capacity so only TRAINING drops differ) —
#     decides the overflow-drop default with a measurement at realistic
#     scale instead of the round-3 96-Gaussian synthetic.
#
# Appends one JSON line per run to $OUT (default /root/gs_run4/ab_quality.jsonl).
set -u
OUT=${OUT:-/root/gs_run4/ab_quality.jsonl}
mkdir -p "$(dirname "$OUT")"
cd /root/repo

run() {
  echo "{\"ab\": \"$1\", \"args\": \"$2\", \"date\": \"$(date -Is)\"}" >> "$OUT"
  # shellcheck disable=SC2086
  timeout 2400 python -m gaussiansplatting_tpu.tools.bench_train $2 >> "$OUT" 2>/dev/null
  echo "[ab_quality] $1 rc=$? $(date -Is)"
}

COMMON="--n 50000 --views 8 --eval-views 4 --iters 1500 --width 400 --height 304"

run dssim_on  "$COMMON --pair-capacity $((1<<20)) --dssim-in-grad 1"
run dssim_off "$COMMON --pair-capacity $((1<<20)) --dssim-in-grad 0"

# capacity-constrained: 50k Gaussians at 400x304 want ~1M pairs; cap at 256k
# so every frame overflows, eval at 2M so the comparison isolates training
CAPPED="$COMMON --pair-capacity $((1<<18)) --eval-pair-capacity $((1<<21))"
run drop_index  "$CAPPED --overflow-drop index"
run drop_impact "$CAPPED --overflow-drop impact"
