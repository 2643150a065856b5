#!/bin/bash
# HEDGE variant: resume the round-2 config-#4 checkpoint (iter ~10k, trained
# under chronic 8M-pair overflow) with round-3 provisioning: capacity allowed
# NOTE: train_loop runs --epochs ADDITIONAL passes on resume; 97 x 190 views
# ~= the remaining 18.5k iters of the reference 28.5k schedule.
# to 16M, bf16 payload, impact drop for any residual overflow, scanned
# dispatch.  Use when wall-clock cannot fit a fresh full-schedule run.
set -e
RUN=${RUN:-/root/gs_run}
cd /root/repo
exec python -m gaussiansplatting_tpu.tools.train \
  --colmap /root/gs_garden/sparse/0 \
  --images /root/gs_garden/images \
  --output "$RUN/out_r3.ply" \
  --epochs 97 \
  --eval-split 20 \
  --resume \
  --pair-capacity $((1<<24)) \
  --adaptive-pairs \
  --min-pair-capacity $((1<<23)) \
  --scan-steps 10 \
  --payload-dtype bf16 \
  --chunk-slack 0.5 \
  --overflow-drop impact \
  --checkpoint-dir "$RUN/ckpt" \
  --checkpoint-interval 2000 \
  --metrics "$RUN/metrics_r3.jsonl" \
  "$@" >> "$RUN/train_r3.log" 2>&1
