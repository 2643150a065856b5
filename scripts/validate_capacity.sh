#!/bin/bash
# VERDICT r2 item 2 "Done" check, time-boxed: resume the round-2 checkpoint
# (1.5M Gaussians at the density cap) with 16M-pair provisioning and run a
# short segment; metrics must show overflow=false in steady state and the
# achieved it/s at reference-scale pairs.  ~3 epochs = ~570 iters.
set -e
RUN=${RUN:-/root/gs_capcheck}
mkdir -p "$RUN"
cp -r /root/gs_run/ckpt "$RUN/ckpt" 2>/dev/null || true
cd /root/repo
exec python -m gaussiansplatting_tpu.tools.train \
  --colmap /root/gs_garden/sparse/0 \
  --images /root/gs_garden/images \
  --output "$RUN/out.ply" \
  --epochs 3 \
  --eval-split 20 \
  --resume \
  --pair-capacity $((1<<24)) \
  --scan-steps 10 \
  --payload-dtype bf16 \
  --chunk-slack 0.5 \
  --checkpoint-dir "$RUN/ckpt" \
  --checkpoint-interval 0 \
  --metrics "$RUN/metrics.jsonl" \
  "$@" >> "$RUN/train.log" 2>&1
