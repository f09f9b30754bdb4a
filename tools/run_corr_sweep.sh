#!/bin/bash
# On-chip sweep of the corr kernel knobs: supercell row quantum (YC ->
# band height THB = YC + 10), edges per band chunk (CB), phase-C batch
# width (CG), edges per grid step (TE), expansion chunk (XE).
# Each line: config + plan+kernel / kernel-only ms from bench_corr.
cd "$(dirname "$0")/.."
E=${1:-12288}
for cfg in "" "CORR_YC=8" "CORR_YC=4" "CORR_CB=8" "CORR_YC=8 CORR_CB=8" \
           "CORR_CG=8" "CORR_CB=8 CORR_CG=8" "CORR_TE=128" \
           "CORR_YC=8 CORR_CB=8 CORR_TE=128"; do
  echo "=== $cfg ==="
  env $cfg timeout 600 python tools/bench_corr.py $E 2>&1 | grep -E "plan\+kernel|kernel-only|Error" | head -4
done
