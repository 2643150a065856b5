#!/bin/bash
# BASELINE.md config #4 at reference-scale provisioning (round 3):
# full schedule on the photoreal synthetic garden, pair capacity allowed to
# grow to 16M (reference: maxPairs = maxGaussians x 8 = 12M at the 1.5M
# density cap, tiled_rasterizer.mm:144), bf16 payload mode (the reference
# blends in half precision), 10-step scanned dispatch.
set -e
RUN=${RUN:-/root/gs_run3}
mkdir -p "$RUN"
cd /root/repo
exec python -m gaussiansplatting_tpu.tools.train \
  --colmap /root/gs_garden/sparse/0 \
  --images /root/gs_garden/images \
  --output "$RUN/out.ply" \
  --epochs 150 \
  --eval-split 20 \
  --adaptive-capacity \
  --pair-capacity $((1<<24)) \
  --adaptive-pairs \
  --min-pair-capacity $((1<<21)) \
  --scan-steps 10 \
  --payload-dtype bf16 \
  --chunk-slack 0.5 \
  --checkpoint-dir "$RUN/ckpt" \
  --checkpoint-interval 2000 \
  --metrics "$RUN/metrics.jsonl" \
  --snapshot-dir "$RUN/snaps" \
  "$@" >> "$RUN/train.log" 2>&1
