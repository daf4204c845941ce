#!/bin/bash
# Staged TPU measurement batch: run this the moment the axon tunnel
# grants devices again (see CLAUDE.md tunnel notes). Each step is
# independently bounded and appends to /tmp/tpu_session.log so a
# mid-batch wedge loses at most one step.
#
#   bash benchmarks/tpu_session.sh
#
# Steps (in value order):
#   1. bench.py — the per-round driver metric incl. the mh_zoom line
#      (deposited mass/s + signal_vs_uniform at the 1e-5 window, now
#      with the 16384-step tenure-floor tuning).
#   2. mh_ab.py — MH-vs-uniform A/B at a 6e-3 crop (60 s/variant):
#      mass ratio, cross-correlation, half-run self-correlation.
#   3. North-star leg (r4): one 600 s 20000^2 c=2000 render through
#      the big-canvas hybrid (radix64 host accumulator + device XLA
#      scatter share) -> /tmp/ns_r04_stats.json. VERDICT r3 #3 target:
#      >= 5e9 it/s (r3 recorded 2.37e9).
#   4. parity_null.py — null-calibrate the 4 parity pairs below 0.95
#      (VERDICT r3 #5).
#   5. A flagship MH deep render for examples/ (4 min, 1e-5 window,
#      extended precision).
set -u
LOG=/tmp/tpu_session.log
cd "$(dirname "$0")/.."
echo "=== tpu_session $(date -u +%FT%TZ) ===" | tee -a "$LOG"

echo "--- step 1: bench.py 10 ---" | tee -a "$LOG"
timeout 2400 python bench.py 10 2>&1 | tail -3 | tee -a "$LOG"

echo "--- step 2: mh_ab.py 60 6e-3 ---" | tee -a "$LOG"
timeout 1200 python benchmarks/mh_ab.py 60 6e-3 2>&1 | tail -40 | tee -a "$LOG"

echo "--- step 3: north-star 20000^2 leg (600 s) ---" | tee -a "$LOG"
mkdir -p /tmp/northstar_r04
timeout 1500 python -m cudabrot_tpu.cli \
    -w 20000 -h 20000 -m 20000 -c 2000 -t 600 \
    --stats-json /tmp/ns_r04_stats.json \
    -o /tmp/northstar_r04/leg.pgm 2>&1 | tail -4 | tee -a "$LOG"
python - <<'EOF' 2>&1 | tee -a "$LOG"
import json
st = json.load(open("/tmp/ns_r04_stats.json"))
iters = st["classify_iters"] + st["orbit_points"]
print("northstar_r04:", json.dumps({
    "iters_per_sec": round(iters / st["elapsed_seconds"], 1),
    "passes": st["passes"], "elapsed": round(st["elapsed_seconds"], 1),
    "replay": st["replay"], "replay_dropped": st["replay_dropped"],
}))
EOF

echo "--- step 4: parity_null (below-0.95 pairs) ---" | tee -a "$LOG"
timeout 2400 python tools/parity_null.py /tmp/parity_null \
    gamma_1_5 gamma_2_2 cutoff_10000 cropped 2>&1 | tail -14 | tee -a "$LOG"

echo "--- step 5: flagship MH deep render ---" | tee -a "$LOG"
timeout 600 python -m cudabrot_tpu.cli \
    --sampler mh --precision extended \
    --center -0.743643887,0.131825904 --span 1e-5 \
    --sample-domain -0.743683887,-0.743603887,0.131785904,0.131865904 \
    -w 1600 -h 1200 -m 20000 -c 500 -t 240 \
    --png --stats-json /tmp/mh_flagship_stats.json \
    -o examples/deepzoom_seahorse_mh.pgm 2>&1 | tail -6 | tee -a "$LOG"
cat /tmp/mh_flagship_stats.json 2>/dev/null | tee -a "$LOG"

echo "=== done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
