#!/bin/bash
# FUSE_ABL knockout budget of the fused frame program at HEAD.
# Runs bench_fused.py once per ablation; each line: <abl> <ms>.
# Usage: bash tools/run_fuse_abl.sh [iters]
ITERS=${1:-30}
cd "$(dirname "$0")/.."
for abl in "" no_frame no_corr no_shiftg no_ba no_update no_updatebody no_feat no_dino; do
  echo "=== FUSE_ABL=$abl ==="
  FUSE_ABL=$abl timeout 900 python tools/bench_fused.py $ITERS 2>&1 | grep -E "fused frame|Error|error" | head -3
done
