#!/bin/bash
# Staged TPU measurement batch: run this the moment the axon tunnel
# grants devices again (see CLAUDE.md tunnel notes). Each step is
# independently bounded and appends to /tmp/tpu_session.log so a
# mid-batch wedge loses at most one step.
#
#   bash benchmarks/tpu_session.sh
#
# Ordering rationale (r4, after a 20000^2 leg stalled the device for
# 30+ min): known-good shapes FIRST, the big-canvas legs LAST, so a
# re-wedge costs only the tail. Steps:
#   0. health probe (tiny op) — abort the batch if the pool is wedged.
#   1. bench.py — the per-round driver metric (run on a QUIET host).
#   2. mh_ab.py — MH-vs-uniform A/B at a 6e-3 crop (60 s/variant).
#   3. Flagship MH deep render for examples/ (4 min, 1e-5 window).
#   4. parity_null.py — null-calibrate the 4 parity pairs below 0.95.
#   5. North-star leg A: 600 s 20000^2 c=2000, host-only replay
#      (--replay-device-share 0) — isolates the radix64 accumulator.
#   6. North-star leg B: same, auto hybrid share.
#   7. default-band device-share sweep.
#
# r5 STATUS (2026-08-21, all on a quiet host — records committed):
#   1 done -> BENCH headline 2.23e10 (spread 9.4%), default_band
#     3.26e9 (0.83x reference hw), bench_last_full.json.
#   2 done (r5 earlier batch) -> version_timing_tpu.md MH comparator.
#   4 done (r5 earlier batch) -> parity null ceilings logged.
#   5/6 done -> NORTHSTAR.json r5: legA 4.61e9, legB 5.51e9 (>=5e9
#     target met). A share-0.3 leg C timed out in compile; auto wins.
#   7 superseded: auto replay now degrades to pure device at batched
#     bands (r5 sweep: every hybrid share lost there).
set -u
LOG=/tmp/tpu_session.log
cd "$(dirname "$0")/.."
# benchmarks/*.py scripts resolve cudabrot_tpu via PYTHONPATH; a detached
# (setsid/nohup) shell does not inherit the profile's export. APPEND —
# never overwrite (CLAUDE.md: the TPU backend registers through it).
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
echo "=== tpu_session $(date -u +%FT%TZ) ===" | tee -a "$LOG"

echo "--- step 0: health probe ---" | tee -a "$LOG"
timeout 300 python -c "
import time, jax, jax.numpy as jnp
t0 = time.monotonic()
print('devices:', jax.devices(), flush=True)
y = jax.jit(lambda a: (a * a).sum())(jnp.arange(1024.0))
print('tiny op ok:', float(y), f'{time.monotonic()-t0:.1f}s', flush=True)
" 2>&1 | tail -2 | tee -a "$LOG"
if [ "${PIPESTATUS[0]}" != "0" ]; then
    echo "probe FAILED — device pool wedged; aborting batch" | tee -a "$LOG"
    exit 1
fi

echo "--- step 1: bench.py 10 ---" | tee -a "$LOG"
timeout 2400 python bench.py 10 2>&1 | tail -3 | tee -a "$LOG"

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

echo "--- step 4: parity_null (below-0.95 pairs) ---" | tee -a "$LOG"
timeout 2400 python tools/parity_null.py /tmp/parity_null \
    gamma_1_5 gamma_2_2 cutoff_10000 cropped 2>&1 | tail -14 | tee -a "$LOG"

mkdir -p /tmp/northstar_r04
echo "--- step 5: north-star leg A (host-only, radix64) ---" | tee -a "$LOG"
timeout 1500 python -m cudabrot_tpu.cli \
    -w 20000 -h 20000 -m 20000 -c 2000 -t 600 \
    --replay-device-share 0 \
    --stats-json /tmp/ns_r04_hostonly.json \
    -o /tmp/northstar_r04/legA.pgm 2>&1 | tail -4 | tee -a "$LOG"
python - /tmp/ns_r04_hostonly.json <<'EOF' 2>&1 | tee -a "$LOG"
import json, sys
st = json.load(open(sys.argv[1]))
iters = st["classify_iters"] + st["orbit_points"]
print("northstar_r04_hostonly:", json.dumps({
    "iters_per_sec": round(iters / st["elapsed_seconds"], 1),
    "passes": st["passes"], "elapsed": round(st["elapsed_seconds"], 1),
    "replay": st["replay"], "replay_dropped": st["replay_dropped"],
}))
EOF

echo "--- step 6: north-star leg B (auto hybrid) ---" | tee -a "$LOG"
timeout 1500 python -m cudabrot_tpu.cli \
    -w 20000 -h 20000 -m 20000 -c 2000 -t 600 \
    --stats-json /tmp/ns_r04_stats.json \
    -o /tmp/northstar_r04/legB.pgm 2>&1 | tail -4 | tee -a "$LOG"
python - /tmp/ns_r04_stats.json <<'EOF' 2>&1 | tee -a "$LOG"
import json, sys
st = json.load(open(sys.argv[1]))
iters = st["classify_iters"] + st["orbit_points"]
print("northstar_r04_hybrid:", json.dumps({
    "iters_per_sec": round(iters / st["elapsed_seconds"], 1),
    "passes": st["passes"], "elapsed": round(st["elapsed_seconds"], 1),
    "replay": st["replay"], "replay_dropped": st["replay_dropped"],
}))
EOF

echo "--- step 7: default-band device-share sweep ---" | tee -a "$LOG"
for share in 0.3 0.5 0.7 -2; do
    args=(-w 1000 -h 1000 -m 100 -c 20 -t 20
          --stats-json /tmp/db_share_$share.json -o /tmp/db_share.pgm)
    if [ "$share" != "-2" ]; then
        args+=(--replay-device-share "$share")
    else
        args+=(--replay device)
    fi
    timeout 300 python -m cudabrot_tpu.cli "${args[@]}" >/dev/null 2>&1
    python - /tmp/db_share_$share.json "$share" <<'EOF' 2>&1 | tee -a "$LOG"
import json, sys
st = json.load(open(sys.argv[1]))
iters = st["classify_iters"] + st["orbit_points"]
print(f"default_band share={sys.argv[2]}:",
      round(iters / st["elapsed_seconds"] / 1e9, 3), "e9 it/s,",
      "replay", st["replay"])
EOF
done

echo "=== done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
