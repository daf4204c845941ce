#!/bin/bash
# Staged TPU measurement batch: run this the moment the axon tunnel
# grants devices again (see CLAUDE.md tunnel notes). Each step is
# independently bounded and appends to /tmp/tpu_session.log so a
# mid-batch wedge loses at most one step.
#
#   bash benchmarks/tpu_session.sh
#
# Steps (in value order):
#   1. bench.py — the per-round driver metric incl. the new mh_zoom
#      line (deposited mass/s + signal_vs_uniform at the 1e-5 window).
#   2. mh_ab.py — MH-vs-uniform A/B at a 6e-3 crop (60 s/variant):
#      mass ratio, cross-correlation, half-run self-correlation.
#   3. A flagship MH deep render for examples/ (2 min, 1e-5 window,
#      extended precision).
set -u
LOG=/tmp/tpu_session.log
cd "$(dirname "$0")/.."
echo "=== tpu_session $(date -u +%FT%TZ) ===" | tee -a "$LOG"

echo "--- step 1: bench.py 10 ---" | tee -a "$LOG"
timeout 1200 python bench.py 10 2>&1 | tail -3 | tee -a "$LOG"

echo "--- step 2: mh_ab.py 60 6e-3 ---" | tee -a "$LOG"
timeout 1200 python benchmarks/mh_ab.py 60 6e-3 2>&1 | tail -40 | tee -a "$LOG"

echo "--- step 3: flagship MH deep render ---" | tee -a "$LOG"
timeout 600 python -m cudabrot_tpu.cli \
    --sampler mh --precision extended \
    --center -0.743643887,0.131825904 --span 1e-5 \
    --sample-domain -0.743683887,-0.743603887,0.131785904,0.131865904 \
    -w 1600 -h 1200 -m 20000 -c 500 -t 240 \
    --png --stats-json /tmp/mh_flagship_stats.json \
    -o examples/deepzoom_seahorse_mh.pgm 2>&1 | tail -6 | tee -a "$LOG"
cat /tmp/mh_flagship_stats.json 2>/dev/null | tee -a "$LOG"

echo "=== done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
